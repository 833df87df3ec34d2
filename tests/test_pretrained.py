"""load_pretrained end-to-end, offline: pre-seed the download cache with a
synthetic reference-layout .pth (cached_download skips the network when the
file exists) and check the full download→read→convert→run path."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp


@pytest.fixture()
def seeded_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("VTT_CACHE_DIR", str(tmp_path))
    return tmp_path


def _make_cna(rng, prefix, in_c, out_c, k, sd):
    sd[f"{prefix}.conv.weight"] = torch.from_numpy(
        rng.standard_normal((out_c, in_c, k, k), dtype=np.float32) * 0.05
    )
    for name, v in [
        ("weight", rng.random(out_c, dtype=np.float32) + 0.5),
        ("bias", rng.standard_normal(out_c, dtype=np.float32) * 0.1),
        ("running_mean", rng.standard_normal(out_c, dtype=np.float32) * 0.1),
        ("running_var", rng.random(out_c, dtype=np.float32) + 0.5),
    ]:
        sd[f"{prefix}.norm.{name}"] = torch.from_numpy(v)
    sd[f"{prefix}.norm.num_batches_tracked"] = torch.tensor(0)


def test_load_pretrained_darknet19_offline(seeded_cache):
    from vision_toolbox_tpu.models.pretrained import BACKBONE_CKPTS, load_pretrained

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
    torch.save(sd, seeded_cache / BACKBONE_CKPTS["darknet19"])

    model, variables = load_pretrained("darknet19")
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 2, 2, 1024)
    # weights actually came from the checkpoint
    np.testing.assert_allclose(
        np.asarray(variables["params"]["stem"]["conv"]["kernel"]),
        sd["stem.conv.weight"].numpy().transpose(2, 3, 1, 0),
    )


def test_load_pretrained_unknown():
    from vision_toolbox_tpu.models.pretrained import load_pretrained

    with pytest.raises(KeyError):
        load_pretrained("not_a_model")
