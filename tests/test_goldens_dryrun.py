"""Egress-kit dry run (round-3 verdict item #10): prove the golden-generation
pipeline works end-to-end AFTER the network call, so an egress-enabled round
spends its time downloading, not debugging.

Plants synthesized checkpoints (official layouts, same builders as
tests/test_pretrained_official.py / test_pretrained.py) into the download
cache — ``cached_download`` skips the network when the file exists — then
runs ``scripts/make_goldens.py``'s real ``main()`` and asserts goldens get
WRITTEN (a silent SKIP would mean the post-fetch path regressed), and that
``tests/test_goldens.py``'s comparison logic round-trips against them.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
import torch

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from test_pretrained import _make_cna  # noqa: E402
from test_pretrained_official import _f, _vit_block_sd  # noqa: E402


@pytest.fixture()
def cache(tmp_path, monkeypatch):
    monkeypatch.setenv("VTT_CACHE_DIR", str(tmp_path / "cache"))
    (tmp_path / "cache").mkdir()
    return tmp_path / "cache"


def _plant_darknet19(cache):
    from vision_toolbox_tpu.models.pretrained import BACKBONE_CKPTS

    rng = np.random.default_rng(0)
    sd: dict = {}
    _make_cna(rng, "stem", 3, 32, 3, sd)
    in_c = 32
    for i, (n, out_c) in enumerate(zip((0, 1, 1, 2, 2), (64, 128, 256, 512, 1024))):
        if n == 0:
            _make_cna(rng, f"stages.{i}", in_c, out_c, 3, sd)
        else:
            _make_cna(rng, f"stages.{i}.conv", in_c, out_c, 3, sd)
            for j in range(n):
                _make_cna(rng, f"stages.{i}.blocks.{j}.conv1", out_c, out_c // 2, 1, sd)
                _make_cna(rng, f"stages.{i}.blocks.{j}.conv2", out_c // 2, out_c, 3, sd)
        in_c = out_c
    torch.save(sd, cache / BACKBONE_CKPTS["darknet19"])


def _plant_deit3_s(cache):
    from vision_toolbox_tpu.models.pretrained import DEIT3_CKPTS

    d, depth, n_patch = 384, 12, (224 // 16) ** 2
    sd = {
        "patch_embed.proj.weight": _f(d, 3, 16, 16),
        "patch_embed.proj.bias": _f(d),
        "pos_embed": _f(1, 1 + n_patch, d),
        "cls_token": _f(1, 1, d),
        "norm.weight": _f(d),
        "norm.bias": _f(d),
        "head.weight": _f(10, d),
        "head.bias": _f(10),
    }
    for i in range(depth):
        _vit_block_sd(sd, f"blocks.{i}", d, layer_scale=True)
    torch.save({"model": sd}, cache / DEIT3_CKPTS[("deit3_s_16", 224)])


def test_make_goldens_dryrun_and_roundtrip(cache, tmp_path, monkeypatch):
    from scripts import make_goldens

    _plant_darknet19(cache)
    _plant_deit3_s(cache)

    out_dir = tmp_path / "goldens"
    monkeypatch.setattr(
        sys, "argv",
        ["make_goldens.py", "--out", str(out_dir), "--only", "darknet19,deit3_s_16"],
    )
    make_goldens.main()

    written = sorted(p.name for p in out_dir.glob("*.npz"))
    # both goldens MUST be written — a SKIP here means the post-download
    # pipeline (load_pth/convert/apply/save) broke, which is exactly what an
    # egress-enabled round must not spend its time discovering
    assert written == ["darknet19.npz", "deit3_s_16.npz"], written

    # round-trip through test_goldens.py's comparison logic
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
