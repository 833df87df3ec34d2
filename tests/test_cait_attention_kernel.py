"""CaiT talking-head attention kernel vs XLA oracle (interpret mode on CPU):
forward parity and gradients for q/k/v AND the four head-mix parameters
(the pre/post-softmax (H, H) mixes are what make this attention unfuseable
by standard flash kernels — ref cait.py:32-51)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_toolbox_tpu.ops.cait_attention import talking_head_attention


def oracle(q, k, v, ml, mlb, mw, mwb, n_heads):
    """Reference math, mirrors models/cait.py TalkingHeadAttention."""
    B, T, D = q.shape
    S = k.shape[1]
    hd = D // n_heads
    scale = hd**-0.5
    qh = q.reshape(B, T, n_heads, hd)
    kh = k.reshape(B, S, n_heads, hd)
    vh = v.reshape(B, S, n_heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh * scale)
    logits = jnp.einsum("bhqk,gh->bgqk", logits, ml) + mlb[None, :, None, None]
    probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.einsum("bhqk,gh->bgqk", probs, mw) + mwb[None, :, None, None]
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh)
    return out.reshape(B, T, D)


@pytest.mark.parametrize("B,T,H,hd", [(3, 24, 4, 48), (2, 16, 8, 48), (2, 40, 4, 64)])
def test_forward_parity(B, T, H, hd):
    D = H * hd
    keys = jax.random.split(jax.random.PRNGKey(0), 7)
    q, k, v = (jax.random.normal(keys[i], (B, T, D), jnp.float32) for i in range(3))
    ml = jax.random.normal(keys[3], (H, H)) * 0.3 + jnp.eye(H)
    mw = jax.random.normal(keys[4], (H, H)) * 0.3 + jnp.eye(H)
    mlb = jax.random.normal(keys[5], (H,)) * 0.1
    mwb = jax.random.normal(keys[6], (H,)) * 0.1

    got = talking_head_attention(q, k, v, ml, mlb, mw, mwb, interpret=True)
    want = oracle(q, k, v, ml, mlb, mw, mwb, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_gradients_all_inputs():
    B, T, H, hd = 2, 24, 4, 48
    D = H * hd
    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    q, k, v = (jax.random.normal(keys[i], (B, T, D), jnp.float32) for i in range(3))
    ml = jax.random.normal(keys[3], (H, H)) * 0.3 + jnp.eye(H)
    mw = jax.random.normal(keys[4], (H, H)) * 0.3 + jnp.eye(H)
    mlb = jax.random.normal(keys[5], (H,)) * 0.1
    mwb = jax.random.normal(keys[6], (H,)) * 0.1
    co = jax.random.normal(keys[7], (B, T, D))  # cotangent-shaping weights

    def loss_kernel(q, k, v, ml, mlb, mw, mwb):
        return jnp.sum(co * talking_head_attention(q, k, v, ml, mlb, mw, mwb, interpret=True))

    def loss_oracle(q, k, v, ml, mlb, mw, mwb):
        return jnp.sum(co * oracle(q, k, v, ml, mlb, mw, mwb, H))

    got = jax.grad(loss_kernel, argnums=tuple(range(7)))(q, k, v, ml, mlb, mw, mwb)
    want = jax.grad(loss_oracle, argnums=tuple(range(7)))(q, k, v, ml, mlb, mw, mwb)
    names = ["dq", "dk", "dv", "dmix_l", "dmix_l_bias", "dmix_w", "dmix_w_bias"]
    for n, a, b in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=n
        )


def test_cross_attention_shapes():
    """T != S (class attention never uses talking heads, but the kernel
    supports ragged q/k lengths)."""
    B, T, S, H, hd = 2, 8, 24, 4, 48
    D = H * hd
    keys = jax.random.split(jax.random.PRNGKey(2), 7)
    q = jax.random.normal(keys[0], (B, T, D))
    k = jax.random.normal(keys[1], (B, S, D))
    v = jax.random.normal(keys[2], (B, S, D))
    ml = jnp.eye(H) + 0.1
    mw = jnp.eye(H) - 0.05
    mlb = jnp.zeros(H)
    mwb = jnp.zeros(H)
    got = talking_head_attention(q, k, v, ml, mlb, mw, mwb, interpret=True)
    want = oracle_cross(q, k, v, ml, mlb, mw, mwb, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def oracle_cross(q, k, v, ml, mlb, mw, mwb, n_heads):
    B, T, D = q.shape
    S = k.shape[1]
    hd = D // n_heads
    qh = q.reshape(B, T, n_heads, hd)
    kh = k.reshape(B, S, n_heads, hd)
    vh = v.reshape(B, S, n_heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh * hd**-0.5)
    logits = jnp.einsum("bhqk,gh->bgqk", logits, ml) + mlb[None, :, None, None]
    probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.einsum("bhqk,gh->bgqk", probs, mw) + mwb[None, :, None, None]
    return jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(B, T, D)
