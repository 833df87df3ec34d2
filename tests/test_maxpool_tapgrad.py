"""Tap-compare maxpool vjp (ops/maxpool.py) vs XLA's SelectAndScatter grad:
forward bitwise-identical, gradients equal on tie-free inputs, for the pool
geometries the models actually use."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_toolbox_tpu.ops.maxpool import max_pool2d_tapgrad


def xla_pool(x, k, s, p):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, s, s, 1),
        padding=((0, 0), (p, p), (p, p), (0, 0)),
    )


# (k, s, p): vovnet/resnet 3x3/2 p1, darknet19 2x2/2 p0, SPP 5x5/1 p2,
# odd input sizes for ragged final windows
@pytest.mark.parametrize("k,s,p,H,W", [
    (3, 2, 1, 16, 16),
    (3, 2, 1, 11, 13),
    (2, 2, 0, 14, 14),
    (5, 1, 2, 9, 9),
    (3, 1, 1, 8, 8),
])
def test_forward_and_grad_parity(k, s, p, H, W):
    x = jax.random.normal(jax.random.PRNGKey(0), (3, H, W, 8))  # continuous → no ties
    got = max_pool2d_tapgrad(x, k, s, p)
    want = xla_pool(x, k, s, p)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    co = jax.random.normal(jax.random.PRNGKey(1), got.shape)
    g_got = jax.grad(lambda x: jnp.sum(co * max_pool2d_tapgrad(x, k, s, p)))(x)
    g_want = jax.grad(lambda x: jnp.sum(co * xla_pool(x, k, s, p)))(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), rtol=1e-6, atol=1e-6)


def test_grad_jits_bf16():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 12, 12, 16), jnp.bfloat16)
    g = jax.jit(jax.grad(lambda x: jnp.sum(max_pool2d_tapgrad(x, 3, 2, 1).astype(jnp.float32))))(x)
    assert g.dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(g, np.float32)))
