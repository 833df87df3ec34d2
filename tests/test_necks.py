"""Neck tests mirroring the reference capability surface (necks.py) +
the detection-feed composition (BASELINE.json config 5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_toolbox_tpu import create_backbone
from vision_toolbox_tpu.models.necks import FPN, PAN, BiFPN


CHANNELS = (8, 16, 32)


def _feats(channels=CHANNELS, base=16, batch=2, seed=0):
    rng = np.random.default_rng(seed)
    feats = []
    size = base
    for c in channels:
        feats.append(jnp.asarray(rng.random((batch, size, size, c), dtype=np.float32)))
        size //= 2
    return feats


@pytest.mark.parametrize("fuse", ["sum", "concat", "avg", "max"])
def test_fpn_shapes(fuse):
    feats = _feats()
    neck = FPN(CHANNELS, out_channels=16, fuse=fuse)
    variables = neck.init({"params": jax.random.PRNGKey(0)}, feats, train=False)
    outs = neck.apply(variables, feats)
    assert len(outs) == len(feats)
    for out, f in zip(outs, feats):
        assert out.shape[:3] == f.shape[:3]
        assert out.shape[-1] == 16


def test_fpn_bottom_up():
    feats = _feats()
    neck = FPN(CHANNELS, out_channels=16, top_down=False)
    variables = neck.init({"params": jax.random.PRNGKey(0)}, feats, train=False)
    outs = neck.apply(variables, feats)
    assert [o.shape[-1] for o in outs] == [16, 16, 16]


def test_fpn_identity_lateral():
    """Lateral is identity when channels match (ref necks.py:60-65)."""
    feats = _feats(channels=(16, 16, 16))
    neck = FPN((16, 16, 16), out_channels=16)
    variables = neck.init({"params": jax.random.PRNGKey(0)}, feats, train=False)
    lateral_params = [k for k in variables["params"] if k.startswith("lateral")]
    assert lateral_params == []


def test_pan_shapes():
    feats = _feats()
    neck = PAN(CHANNELS, out_channels=16)
    variables = neck.init({"params": jax.random.PRNGKey(0)}, feats, train=False)
    outs = neck.apply(variables, feats)
    assert len(outs) == 3
    assert all(o.shape[-1] == 16 for o in outs)


@pytest.mark.parametrize("block", ["separable", "conv_norm_act"])
def test_bifpn_shapes(block):
    feats = _feats(channels=(8, 16, 32, 64), base=32)
    neck = BiFPN((8, 16, 32, 64), out_channels=24, num_layers=2, block=block)
    variables = neck.init({"params": jax.random.PRNGKey(0)}, feats, train=False)
    outs = neck.apply(variables, feats)
    assert len(outs) == 4
    for out, f in zip(outs, feats):
        assert out.shape[:3] == f.shape[:3]
        assert out.shape[-1] == 24


def test_backbone_to_neck_composition():
    """feats = backbone.get_feature_maps(x)[-4:] → PAN (README.md:33-37)."""
    model = create_backbone("darknet_yolov5n")
    variables = model.init_variables(0, 64)
    x = jnp.zeros((1, 64, 64, 3))
    feats = model.apply(variables, x, method="get_feature_maps")[-4:]
    neck = PAN(tuple(f.shape[-1] for f in feats), out_channels=32)
    nv = neck.init({"params": jax.random.PRNGKey(0)}, feats, train=False)
    outs = jax.jit(lambda v, f: neck.apply(v, f))(nv, feats)
    assert len(outs) == 4
    assert all(o.shape[-1] == 32 for o in outs)
