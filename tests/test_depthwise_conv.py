"""Pallas depthwise conv vs lax.conv_general_dilated oracle (interpret mode):
forward + dx/dw gradients, non-128 channel counts, k in {3, 5, 7}, batch
grouping > 1."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_toolbox_tpu.ops.depthwise_conv import depthwise_conv2d


def oracle(x, w):
    C = x.shape[-1]
    k = w.shape[0]
    p = k // 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(p, p), (p, p)], feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize(
    "B,H,W,C,k",
    [
        (2, 8, 8, 96, 7),    # non-128 channels (ConvNeXt stage 1)
        (4, 6, 10, 128, 3),  # non-square, exact lane block
        (2, 9, 9, 256, 5),   # multi-channel-block
        (8, 5, 5, 64, 3),    # batch grouping > 1
    ],
)
def test_forward_parity(B, H, W, C, k):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C))
    w = jax.random.normal(jax.random.PRNGKey(1), (k, k, 1, C)) * 0.1
    got = depthwise_conv2d(x, w, interpret=True)
    want = oracle(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_gradients():
    B, H, W, C, k = 3, 7, 9, 96, 7
    x = jax.random.normal(jax.random.PRNGKey(2), (B, H, W, C))
    w = jax.random.normal(jax.random.PRNGKey(3), (k, k, 1, C)) * 0.1
    co = jax.random.normal(jax.random.PRNGKey(4), (B, H, W, C))

    gk = jax.grad(lambda x, w: jnp.sum(co * depthwise_conv2d(x, w, interpret=True)), (0, 1))
    go = jax.grad(lambda x, w: jnp.sum(co * oracle(x, w)), (0, 1))
    (dxk, dwk), (dxo, dwo) = gk(x, w), go(x, w)
    np.testing.assert_allclose(np.asarray(dxk), np.asarray(dxo), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dwk), np.asarray(dwo), rtol=1e-4, atol=1e-4)


def test_gradients_batch_grouped():
    """gb > 1 exercises the in-kernel dw accumulation across group AND grid."""
    B, H, W, C, k = 8, 4, 4, 128, 3
    x = jax.random.normal(jax.random.PRNGKey(5), (B, H, W, C))
    w = jax.random.normal(jax.random.PRNGKey(6), (k, k, 1, C)) * 0.1
    gk = jax.grad(lambda x, w: jnp.sum(depthwise_conv2d(x, w, interpret=True) ** 2), (0, 1))
    go = jax.grad(lambda x, w: jnp.sum(oracle(x, w) ** 2), (0, 1))
    for a, b in zip(gk(x, w), go(x, w)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_bf16_io():
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, 96), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(8), (7, 7, 1, 96), jnp.bfloat16) * 0.1
    got = depthwise_conv2d(x, w, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = oracle(x.astype(jnp.float32), w.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=5e-2, atol=5e-2
    )
