"""Fused windowed-attention kernel (ops/swin_attention.py) vs an einsum
oracle in interpret mode: forward, dq/dk/dv, and the in-kernel dPE reduction
(summed over batch and windows), with and without the constant shift mask.

NOTE: this kernel is dispatch-DISABLED on v5e (measured slower than the XLA
einsum path — see use_swin_kernel); the tests keep it correct as a starting
point for hardware where the tradeoff flips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_toolbox_tpu.ops.swin_attention import swin_window_attention, use_swin_kernel


def _oracle(q, k, v, pe, mask, n_heads):
    B, nW, T, D = q.shape
    H = D // n_heads
    qh = q.reshape(B, nW, T, n_heads, H)
    kh = k.reshape(B, nW, -1, n_heads, H)
    vh = v.reshape(B, nW, -1, n_heads, H)
    logits = jnp.einsum("bnqhd,bnkhd->bnhqk", qh * H**-0.5, kh) + pe[None]
    if mask is not None:
        logits = logits + mask[None, :, None]
    out = jnp.einsum("bnhqk,bnkhd->bnqhd", jax.nn.softmax(logits, -1), vh)
    return out.reshape(B, nW, T, D)


@pytest.mark.parametrize("with_mask", [False, True])
def test_swin_kernel_matches_oracle(with_mask):
    B, nW, T, N, H = 3, 4, 17, 2, 8
    D = N * H
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(ks[0], (B, nW, T, D))
    k = jax.random.normal(ks[1], (B, nW, T, D))
    v = jax.random.normal(ks[2], (B, nW, T, D))
    pe = jax.random.normal(ks[3], (1, N, T, T))
    mask = jax.random.normal(ks[4], (nW, T, T)) if with_mask else None

    out = swin_window_attention(q, k, v, pe, mask, N)
    ref = _oracle(q, k, v, pe, mask, N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)

    w = jnp.cos(jnp.arange(D))
    ga = jax.grad(
        lambda q, k, v, pe: (swin_window_attention(q, k, v, pe, mask, N) * w).sum(),
        argnums=(0, 1, 2, 3),
    )(q, k, v, pe)
    gb = jax.grad(
        lambda q, k, v, pe: (_oracle(q, k, v, pe, mask, N) * w).sum(), argnums=(0, 1, 2, 3)
    )(q, k, v, pe)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_dispatch_disabled():
    assert not use_swin_kernel(49, 49, 24576, 0.0, True)
