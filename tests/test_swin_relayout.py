"""ops/swin_relayout.py — fused roll+(un)partition kernels vs the XLA
composition they replace, in interpret mode on CPU. Pure permutations, so
parity is exact (zero tolerance) including gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import vision_toolbox_tpu.ops.swin_relayout as sr
from vision_toolbox_tpu.models.swin import (
    SwinBlock, window_partition, window_unpartition,
)


def _oracle_partition(x, w, s):
    return window_partition(jnp.roll(x, (-s, -s), axis=(1, 2)), w)


def _oracle_unpartition(y, w, s, H, W):
    out = window_unpartition(y, w, H // w, W // w)
    return jnp.roll(out, (s, s), axis=(1, 2))


@pytest.mark.parametrize("H,w,s", [(8, 4, 2), (12, 4, 2), (14, 7, 3), (8, 4, 0)])
def test_partition_matches_roll_plus_partition(H, w, s):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, H, H, 16))
    got = sr.shifted_window_partition(x, w, s, True)
    want = _oracle_partition(x, w, s)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("H,w,s", [(8, 4, 2), (14, 7, 3)])
def test_unpartition_matches_unpartition_plus_roll(H, w, s):
    nHW = (H // w) ** 2
    y = jax.random.normal(jax.random.PRNGKey(1), (2, nHW, w * w, 16))
    got = sr.shifted_window_unpartition(y, w, s, H, H, True)
    want = _oracle_unpartition(y, w, s, H, H)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_roundtrip_identity_and_grads():
    H, w, s = 8, 4, 2
    x = jax.random.normal(jax.random.PRNGKey(2), (3, H, H, 8))
    y = sr.shifted_window_partition(x, w, s, True)
    back = sr.shifted_window_unpartition(y, w, s, H, H, True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    # permutation VJPs: d(partition) == unpartition of the cotangent
    wgt = jax.random.normal(jax.random.PRNGKey(3), y.shape)
    g_got = jax.grad(lambda x: jnp.sum(sr.shifted_window_partition(x, w, s, True) * wgt))(x)
    g_want = jax.grad(lambda x: jnp.sum(_oracle_partition(x, w, s) * wgt))(x)
    np.testing.assert_array_equal(np.asarray(g_got), np.asarray(g_want))

    wgt2 = jax.random.normal(jax.random.PRNGKey(4), x.shape)
    g_got = jax.grad(lambda y: jnp.sum(sr.shifted_window_unpartition(y, w, s, H, H, True) * wgt2))(y)
    g_want = jax.grad(lambda y: jnp.sum(_oracle_unpartition(y, w, s, H, H) * wgt2))(y)
    np.testing.assert_array_equal(np.asarray(g_got), np.asarray(g_want))


def test_swinblock_dispatch_parity(monkeypatch):
    """SwinBlock output must be bit-identical with the fused relayout on
    (the relayout is a permutation — same values through the same ops)."""
    monkeypatch.setattr(sr, "_FORCE_ON", True)
    blk = SwinBlock(input_size=8, d_model=32, n_heads=2, window_size=4, shift=True)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 32))
    v = blk.init({"params": jax.random.PRNGKey(0)}, x)
    got = blk.apply(v, x)
    monkeypatch.setattr(sr, "_FORCE_ON", False)
    want = blk.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)

    monkeypatch.setattr(sr, "_FORCE_ON", True)
    g_got = jax.grad(lambda v: jnp.sum(blk.apply(v, x) ** 2))(v)
    monkeypatch.setattr(sr, "_FORCE_ON", False)
    g_want = jax.grad(lambda v: jnp.sum(blk.apply(v, x) ** 2))(v)
    for (k, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_got),
        jax.tree_util.tree_leaves_with_path(g_want),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6, err_msg=str(k)
        )


def test_dispatch_rule():
    assert not sr.use_swin_relayout(0)  # unshifted: nothing to fuse
    assert not sr.use_swin_relayout(3)  # CPU backend, not forced
