"""Egress-kit dry run: prove the golden-generation pipeline works end-to-end
AFTER the network call, so an egress-enabled round spends its time
downloading, not debugging.

Plants synthesized checkpoints (official layouts, builders in
tests/ckpt_builders.py) into the download cache — ``cached_download`` skips
the network when the file exists — then runs ``scripts/make_goldens.py``'s
real ``main()`` and asserts goldens get WRITTEN (a silent SKIP would mean the
post-fetch path regressed). Round-3 verdict item #7: parametrized over EVERY
family in GOLDEN_SPECS, so one make_goldens run validates the whole
models/pretrained.py URL table the first time egress exists.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent))

from ckpt_builders import PLANTERS, plant  # noqa: E402


@pytest.fixture()
def cache(tmp_path, monkeypatch):
    monkeypatch.setenv("VTT_CACHE_DIR", str(tmp_path / "cache"))
    (tmp_path / "cache").mkdir()
    return tmp_path / "cache"


def _specs():
    from scripts import make_goldens

    out = []
    for name, img_size, kwargs in make_goldens.GOLDEN_SPECS:
        tag = name + ("_siglip" if kwargs.get("weights") == "siglip" else "")
        out.append(pytest.param(name, img_size, tag, id=tag))
    return out


def test_every_golden_spec_has_a_planter():
    """The builders module must track GOLDEN_SPECS exactly — a new pretrained
    family without a planter would silently shrink dry-run coverage."""
    from scripts import make_goldens

    tags = {
        name + ("_siglip" if kwargs.get("weights") == "siglip" else "")
        for name, _, kwargs in make_goldens.GOLDEN_SPECS
    }
    assert tags == set(PLANTERS), (
        f"unplanted={sorted(tags - set(PLANTERS))} stale={sorted(set(PLANTERS) - tags)}"
    )


@pytest.mark.parametrize("name,img_size,tag", _specs())
def test_make_goldens_dryrun(cache, tmp_path, monkeypatch, name, img_size, tag):
    from scripts import make_goldens

    plant(tag, cache)
    out_dir = tmp_path / "goldens"
    monkeypatch.setattr(
        sys, "argv", ["make_goldens.py", "--out", str(out_dir), "--only", name]
    )
    make_goldens.main()

    # the golden MUST be written — a SKIP means the post-download pipeline
    # (load_pth/npz read/convert/apply/save) broke for this family
    path = out_dir / f"{tag}.npz"
    assert path.exists(), f"golden for {tag} not written (post-fetch path broke)"
    data = np.load(path, allow_pickle=True)
    assert np.all(np.isfinite(data["output"]))
    assert int(data["img_size"]) == img_size


def test_golden_comparison_roundtrip(cache, tmp_path, monkeypatch):
    """tests/test_goldens.py's comparison logic round-trips: regenerate the
    model output from the planted checkpoint and match the stored golden."""
    from scripts import make_goldens

    plant("darknet19", cache)
    plant("deit3_s_16", cache)
    out_dir = tmp_path / "goldens"
    monkeypatch.setattr(
        sys, "argv",
        ["make_goldens.py", "--out", str(out_dir), "--only", "darknet19,deit3_s_16"],
    )
    make_goldens.main()
    written = sorted(p.name for p in out_dir.glob("*.npz"))
    assert written == ["darknet19.npz", "deit3_s_16.npz"], written

    from vision_toolbox_tpu.models.pretrained import load_pretrained

    for path in out_dir.glob("*.npz"):
        data = np.load(path, allow_pickle=True)
        img_size = int(data["img_size"])
        model, variables = load_pretrained(path.stem, img_size=img_size)
        x = jnp.asarray(make_goldens.fixed_input(img_size))
        feats = model.apply(variables, x, train=False)
        if feats.ndim == 4:
            feats = feats.mean(axis=(1, 2))
        np.testing.assert_allclose(
            np.asarray(feats, np.float32), data["output"], rtol=2e-5, atol=2e-5
        )
        assert np.all(np.isfinite(data["output"]))
