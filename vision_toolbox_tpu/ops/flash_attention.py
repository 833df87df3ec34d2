"""Pallas TPU flash attention (forward AND backward) with additive-bias
support in the forward.

The reference's attention hot path is torch SDPA (vit.py:38-39). On TPU, XLA
already keeps the softmax chain fused for the short sequences this library
mostly sees (≤ ~1k tokens, SURVEY.md §5.7); this kernel is the long-sequence
path: O(T) memory via a running-softmax over K blocks — the (T, S) logits
matrix never materializes in HBM, in training or inference.

Layout: (B, T, N, H) like jax.nn.dot_product_attention; internally each
(batch, head) pair is one grid row.

Backward: FlashAttention-2 recurrence in two Pallas kernels — the forward
saves only O and the per-row logsumexp L; dK/dV are accumulated per k-block
(inner loop over q-blocks) and dQ per q-block (inner loop over k-blocks),
recomputing p = exp(qkᵀ·s − L) blockwise, so training memory is O(T) too.
When the bias needs a gradient the (T, S) dbias is inherently quadratic, so
the biased path keeps the recompute-based XLA backward (Swin's biased
windows are 49-196 tokens and never dispatch here anyway).

``attention`` auto-dispatches: pallas on TPU for T ≥ PALLAS_MIN_SEQ, else
jax.nn.dot_product_attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PALLAS_MIN_SEQ = 1024
_NEG_INF = -1e30


def _flash_fwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, block_k: int, scale: float, seq_k: int
):
    # q: (Bq, H); k/v: (S_padded, H); bias: (Bq, S_padded) or None; o: (Bq, H)
    # lse: (Bq, 1) — per-row logsumexp saved for the FlashAttention-2 backward.
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
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc, m0, l0))
    o_ref[...] = (acc / l[:, None]).astype(o_ref.dtype)
    lse_ref[...] = (m + jnp.log(l))[:, None]


def _pad_axis(x, axis: int, to: int, value=0.0):
    if x.shape[axis] == to:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, to - x.shape[axis])
    return jnp.pad(x, pad, constant_values=value)


def _flash_fwd(q, k, v, bias, block_q: int, block_k: int, interpret: bool):
    """q (BN, T, H), k/v (BN, S, H), bias (BN, T, S) or None.
    Returns (out (BN, T, H), lse (BN, T, 1) fp32)."""
    BN, T, H = q.shape
    S = k.shape[1]
    scale = H**-0.5
    grid = (BN, pl.cdiv(T, block_q))

    # pad K/V (and bias cols) to a block_k multiple: pl.ds clamps like
    # dynamic_slice, so an unpadded tail block would silently re-read
    # earlier rows
    S_pad = pl.cdiv(S, block_k) * block_k
    k = _pad_axis(k, 1, S_pad)
    v = _pad_axis(v, 1, S_pad)
    if bias is not None:
        bias = _pad_axis(bias, 2, S_pad)

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
            lambda q_ref, k_ref, v_ref, o_ref, lse_ref, **kw: _flash_fwd_kernel(
                q_ref, k_ref, v_ref, None, o_ref, lse_ref, **kw
            ),
            **common,
        )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((None, block_q, H), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, block_q, 1), lambda b, i: (b, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BN, T, H), q.dtype),
            jax.ShapeDtypeStruct((BN, T, 1), jnp.float32),
        ),
        interpret=interpret,
    )(*args)


def _flash_bwd_dkv_kernel(
    q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref, dk_ref, dv_ref, dk_acc, dv_acc,
    *, scale: float, seq_k: int, block_k: int,
):
    # Grid (BN, num_kb, num_qb) — innermost i sweeps q blocks while the
    # (b, j) output block stays fixed; f32 scratch accumulates across i so
    # VMEM use is independent of T. q/do: (block_q, H); lse/delta:
    # (block_q, 1); k/v: (block_k, H).
    i = pl.program_id(2)
    j = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    kb = k_ref[...].astype(jnp.float32)
    vb = v_ref[...].astype(jnp.float32)
    q = q_ref[...].astype(jnp.float32) * scale
    do = do_ref[...].astype(jnp.float32)
    col_valid = (
        j * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1) < seq_k
    )
    logits = jnp.dot(q, kb.T, preferred_element_type=jnp.float32)
    p = jnp.exp(logits - lse_ref[...])  # exact softmax via saved logsumexp
    p = jnp.where(col_valid, p, 0.0)
    dv_acc[...] += jnp.dot(p.T, do, preferred_element_type=jnp.float32)
    dp = jnp.dot(do, vb.T, preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[...])
    dk_acc[...] += jnp.dot(ds.T, q, preferred_element_type=jnp.float32)

    @pl.when(i == pl.num_programs(2) - 1)
    def _():
        dk_ref[...] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[...] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(
    q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref, dq_ref, dq_acc,
    *, scale: float, seq_k: int, block_k: int,
):
    # Grid (BN, num_qb, num_kb) — innermost j sweeps k blocks; the (b, i)
    # dq block stays fixed; f32 scratch accumulates across j.
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q = q_ref[...].astype(jnp.float32) * scale
    do = do_ref[...].astype(jnp.float32)
    kb = k_ref[...].astype(jnp.float32)
    vb = v_ref[...].astype(jnp.float32)
    col_valid = (
        j * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1) < seq_k
    )
    logits = jnp.dot(q, kb.T, preferred_element_type=jnp.float32)
    p = jnp.exp(logits - lse_ref[...])
    p = jnp.where(col_valid, p, 0.0)
    dp = jnp.dot(do, vb.T, preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[...])
    dq_acc[...] += jnp.dot(ds, kb, preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        dq_ref[...] = (dq_acc[...] * scale).astype(dq_ref.dtype)


def _flash_bwd_pallas(q, k, v, out, lse, g, block_q, block_k, interpret):
    """FlashAttention-2 backward: O(T) memory, no (T, S) materialization,
    every operand streamed blockwise (VMEM use independent of T)."""
    BN, T, H = q.shape
    S = k.shape[1]
    scale = H**-0.5
    S_pad = pl.cdiv(S, block_k) * block_k
    T_pad = pl.cdiv(T, block_q) * block_q

    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True)

    qp = _pad_axis(q, 1, T_pad)
    dop = _pad_axis(g, 1, T_pad)
    # padded q rows get lse=+big so p == exp(-big) == 0 in the dkv kernel
    lsep = _pad_axis(lse, 1, T_pad, value=1e30)
    deltap = _pad_axis(delta, 1, T_pad)
    kp = _pad_axis(k, 1, S_pad)
    vp = _pad_axis(v, 1, S_pad)

    q_spec_i = pl.BlockSpec((None, block_q, H), lambda b, j, i: (b, i, 0))
    r_spec_i = pl.BlockSpec((None, block_q, 1), lambda b, j, i: (b, i, 0))
    kv_spec_j = pl.BlockSpec((None, block_k, H), lambda b, j, i: (b, j, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, seq_k=S, block_k=block_k),
        grid=(BN, S_pad // block_k, T_pad // block_q),
        in_specs=[q_spec_i, q_spec_i, r_spec_i, r_spec_i, kv_spec_j, kv_spec_j],
        out_specs=(kv_spec_j, kv_spec_j),
        out_shape=(
            jax.ShapeDtypeStruct((BN, S_pad, H), k.dtype),
            jax.ShapeDtypeStruct((BN, S_pad, H), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, H), jnp.float32),
            pltpu.VMEM((block_k, H), jnp.float32),
        ],
        interpret=interpret,
    )(qp, dop, lsep, deltap, kp, vp)

    q_spec = pl.BlockSpec((None, block_q, H), lambda b, i, j: (b, i, 0))
    r_spec = pl.BlockSpec((None, block_q, 1), lambda b, i, j: (b, i, 0))
    kv_spec = pl.BlockSpec((None, block_k, H), lambda b, i, j: (b, j, 0))
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, seq_k=S, block_k=block_k),
        grid=(BN, T_pad // block_q, S_pad // block_k),
        in_specs=[q_spec, q_spec, r_spec, r_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((BN, T_pad, H), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, H), jnp.float32)],
        interpret=interpret,
    )(qp, dop, lsep, deltap, kp, vp)

    return dq[:, :T], dk[:, :S], dv[:, :S]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_attention(q, k, v, bias, block_q, block_k, interpret):
    return _flash_fwd(q, k, v, bias, block_q, block_k, interpret)[0]


def _flash_attention_fwd(q, k, v, bias, block_q, block_k, interpret):
    out, lse = _flash_fwd(q, k, v, bias, block_q, block_k, interpret)
    return out, (q, k, v, bias, out, lse)


def _flash_attention_bwd(block_q, block_k, interpret, res, g):
    q, k, v, bias, out, lse = res
    if bias is None:
        dq, dk, dv = _flash_bwd_pallas(q, k, v, out, lse, g, block_q, block_k, interpret)
        return dq, dk, dv, None
    # Biased path: dbias is inherently (T, S)-sized, so the blockwise backward
    # buys nothing — recompute-based XLA einsums (probs rematerialized).
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bth,bsh->bts", q * scale, k).astype(jnp.float32)
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
    dbias = dlogits.astype(bias.dtype)
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
