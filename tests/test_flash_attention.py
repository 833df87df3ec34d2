"""Flash-attention kernel parity vs the XLA reference path (interpret mode on
CPU), including bias, non-divisible block sizes, and gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_toolbox_tpu.ops.flash_attention import flash_attention


def _qkv(B=2, T=96, N=2, H=32, seed=0):
    rng = np.random.default_rng(seed)
    f = lambda: jnp.asarray(rng.standard_normal((B, T, N, H), dtype=np.float32))
    return f(), f(), f()


def test_flash_matches_xla():
    q, k, v = _qkv()
    ref = jax.nn.dot_product_attention(q, k, v)
    out = flash_attention(q, k, v, block_q=32, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_with_bias():
    q, k, v = _qkv(T=64)
    rng = np.random.default_rng(1)
    bias = jnp.asarray(rng.standard_normal((1, 2, 64, 64), dtype=np.float32))
    ref = jax.nn.dot_product_attention(q, k, v, bias=bias)
    out = flash_attention(q, k, v, bias=bias, block_q=32, block_k=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_nondivisible_blocks():
    q, k, v = _qkv(T=80)  # 80 not divisible by 64
    ref = jax.nn.dot_product_attention(q, k, v)
    out = flash_attention(q, k, v, block_q=64, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_grad_matches_xla():
    q, k, v = _qkv(T=48, H=16)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=16, block_k=16, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(jax.nn.dot_product_attention(q, k, v) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_flash_grad_nondivisible_blocks():
    """Pallas FA2 backward with ragged T/S (exercises the q-row lse=+inf
    padding and the k-column masks in both backward kernels)."""
    q, k, v = _qkv(T=80, H=16, seed=2)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=64, block_k=32, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(jax.nn.dot_product_attention(q, k, v) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_flash_bias_grad():
    q, k, v = _qkv(T=32, H=16)
    bias = jnp.zeros((1, 2, 32, 32))

    def loss(bias):
        return jnp.sum(flash_attention(q, k, v, bias=bias, interpret=True) ** 2)

    def loss_ref(bias):
        return jnp.sum(jax.nn.dot_product_attention(q, k, v, bias=bias) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss)(bias)), np.asarray(jax.grad(loss_ref)(bias)),
        rtol=1e-4, atol=1e-4,
    )
