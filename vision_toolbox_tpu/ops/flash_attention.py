"""Pallas TPU flash attention (forward) with additive-bias support.

The reference's attention hot path is torch SDPA (vit.py:38-39). On TPU, XLA
already keeps the softmax chain fused for the short sequences this library
mostly sees (≤ ~1k tokens, SURVEY.md §5.7); this kernel is the long-sequence
path: O(T) memory via a running-softmax over K blocks — the (T, S) logits
matrix never materializes in HBM.

Layout: (B, T, N, H) like jax.nn.dot_product_attention; internally each
(batch, head) pair is one grid row. Backward is recompute-based XLA einsums
under @jax.custom_vjp (standard practice when T·S activations are cheap to
recompute relative to storing probs).

``attention`` auto-dispatches: pallas on TPU for T ≥ PALLAS_MIN_SEQ, else
jax.nn.dot_product_attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

PALLAS_MIN_SEQ = 1024
_NEG_INF = -1e30


def _flash_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, block_k: int, scale: float, seq_k: int):
    # q: (Bq, H); k/v: (S_padded, H); bias: (Bq, S_padded) or None; o: (Bq, H)
    # S_padded is a multiple of block_k (host-side padding) so pl.ds never
    # clamps; positions >= seq_k are masked to -inf.
    q = q_ref[...].astype(jnp.float32) * scale
    S = seq_k
    Bq, H = q.shape
    num_kb = pl.cdiv(S, block_k)

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (Bq, bk)
        if bias_ref is not None:
            logits = logits + bias_ref[:, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        # mask the out-of-bounds tail of the last k block
        col = i * block_k + jax.lax.broadcasted_iota(jnp.int32, (Bq, block_k), 1)
        logits = jnp.where(col < S, logits, _NEG_INF)
        m_cur = jnp.max(logits, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new[:, None])
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc = jnp.zeros((Bq, H), jnp.float32)
    m0 = jnp.full((Bq,), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((Bq,), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_kb, body, (acc, m0, l0))
    o_ref[...] = (acc / l[:, None]).astype(o_ref.dtype)


def _flash_fwd(q, k, v, bias, block_q: int, block_k: int, interpret: bool):
    """q (BN, T, H), k/v (BN, S, H), bias (BN, T, S) or None."""
    BN, T, H = q.shape
    S = k.shape[1]
    scale = H**-0.5
    grid = (BN, pl.cdiv(T, block_q))

    # pad K/V (and bias cols) to a block_k multiple: pl.ds clamps like
    # dynamic_slice, so an unpadded tail block would silently re-read
    # earlier rows
    S_pad = pl.cdiv(S, block_k) * block_k
    if S_pad != S:
        pad = [(0, 0), (0, S_pad - S), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        if bias is not None:
            bias = jnp.pad(bias, [(0, 0), (0, 0), (0, S_pad - S)])

    in_specs = [
        pl.BlockSpec((None, block_q, H), lambda b, i: (b, i, 0)),
        pl.BlockSpec((None, S_pad, H), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((None, S_pad, H), lambda b, i: (b, 0, 0)),
    ]
    args = [q, k, v]
    common = dict(block_k=block_k, scale=scale, seq_k=S)
    if bias is not None:
        in_specs.append(pl.BlockSpec((None, block_q, S_pad), lambda b, i: (b, i, 0)))
        args.append(bias)
        kernel = functools.partial(_flash_fwd_kernel, **common)
    else:
        kernel = functools.partial(
            lambda q_ref, k_ref, v_ref, o_ref, **kw: _flash_fwd_kernel(
                q_ref, k_ref, v_ref, None, o_ref, **kw
            ),
            **common,
        )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, block_q, H), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((BN, T, H), q.dtype),
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_attention(q, k, v, bias, block_q, block_k, interpret):
    return _flash_fwd(q, k, v, bias, block_q, block_k, interpret)


def _flash_attention_fwd(q, k, v, bias, block_q, block_k, interpret):
    out = _flash_fwd(q, k, v, bias, block_q, block_k, interpret)
    return out, (q, k, v, bias, out)


def _flash_attention_bwd(block_q, block_k, interpret, res, g):
    """Recompute-based backward (XLA einsums; probs rematerialized per call)."""
    q, k, v, bias, out = res
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bth,bsh->bts", q * scale, k).astype(jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    p = jax.nn.softmax(logits, axis=-1)
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dp = jnp.einsum("bth,bsh->bts", g32, v32)
    # softmax jvp: dlogits = p * (dp - sum(dp * p))
    dlogits = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bts,bsh->bth", dlogits, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bts,bth->bsh", dlogits, q.astype(jnp.float32)) * scale
    dv = jnp.einsum("bts,bth->bsh", p, g32)
    dbias = None if bias is None else dlogits.astype(bias.dtype)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), dbias


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array | None = None,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """Flash attention on (B, T, N, H). ``bias`` broadcasts against (B, N, T, S)."""
    B, T, N, H = q.shape
    S = k.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block_q = min(block_q, T)
    block_k = min(block_k, S)

    qf = q.transpose(0, 2, 1, 3).reshape(B * N, T, H)
    kf = k.transpose(0, 2, 1, 3).reshape(B * N, S, H)
    vf = v.transpose(0, 2, 1, 3).reshape(B * N, S, H)
    bf = None
    if bias is not None:
        bias = jnp.broadcast_to(bias, (B, N, T, S))
        bf = bias.reshape(B * N, T, S)
    out = _flash_attention(qf, kf, vf, bf, block_q, block_k, interpret)
    return out.reshape(B, N, T, H).transpose(0, 2, 1, 3)


def use_pallas(seq_len: int) -> bool:
    """Dispatch rule: pallas wins for long, 128-aligned sequences (measured:
    1.08×@1024, 1.19×@2048, 1.23×@4096 vs XLA on v5e); unaligned lengths
    (e.g. ViT's 1025 = patches + cls) pay for a padded tail block and are
    faster on XLA."""
    return (
        jax.default_backend() == "tpu"
        and seq_len >= PALLAS_MIN_SEQ
        and seq_len % 128 == 0
    )


def attention(q, k, v, bias=None):
    """Auto-dispatch: pallas flash for long sequences on TPU, XLA otherwise."""
    if use_pallas(q.shape[1]):
        return flash_attention(q, k, v, bias)
    return jax.nn.dot_product_attention(q, k, v, bias=bias)
