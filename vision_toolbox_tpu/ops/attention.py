"""Attention core op.

The reference leans on ``F.scaled_dot_product_attention`` (vit.py:38-39) —
a native flash kernel. The TPU-native equivalent is ``jax.nn.dot_product_attention``
(XLA fuses the softmax chain on-chip; sequence lengths in this library are
≤ ~1025 tokens, SURVEY.md §5.7) with an optional Pallas flash-attention path
for long sequences (ops/flash_attention.py).

Layout convention follows jax.nn: (batch, seq, heads, head_dim).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array | None = None,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
) -> jax.Array:
    """SDPA with additive bias, (B, T, N, H) layout, scale = head_dim**-0.5.

    ``bias`` broadcasts against (B, N, T, S) — used for Swin's relative
    position bias + shift mask (ref swin.py:75-81).
    """
    if dropout_rate == 0.0:
        from .flash_attention import flash_attention, use_pallas
        from .short_attention import short_attention_packed, use_short

        B, T, N, H = q.shape
        if bias is None and use_short(T, k.shape[1], H, B * N):
            # vision-shaped attention: tiny T, many (batch·head) pairs —
            # whole score matrix in VMEM, operands in the projections'
            # natural packed layout (ops/short_attention.py)
            return short_attention_packed(q, k, v)
        if use_pallas(T):
            return flash_attention(q, k, v, bias=bias)
        return jax.nn.dot_product_attention(q, k, v, bias=bias)
    # manual path with attention dropout (ref vit.py:41-44 fallback)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("...qhd,...khd->...hqk", q * scale, k)
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    return jnp.einsum("...hqk,...khd->...qhd", probs, v)
