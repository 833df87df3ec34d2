"""Fused windowed (biased) attention for Swin on TPU.

Swin's attention is even shorter and wider than ViT's: w²=49-token windows
over B·nW·heads pairs (swin_t stage 1 at bs128: 24,576 pairs), every window
carrying an additive bias — the relative-PE table (learnable, shared across
batch AND windows) plus, on shifted blocks, a constant per-window mask
(reference swin.py:73-86). The XLA einsum path materializes
(B, nW, heads, w², w²) logits and probs through HBM in both passes.

Kernel design (mirrors ops/short_attention.py, plus bias):
  * one grid program per image; windows iterated with ``fori_loop`` (dynamic
    leading-dim indexing), heads split by static lane slices of the packed
    (w², n_heads·head_dim) layout — operands stay in the projections'
    natural layout, zero HBM relayout;
  * the whole (w², w²) score matrix lives in VMEM (no running softmax);
  * the two bias components stay SEPARATE: the PE bias (1, N, T, S) is
    differentiable and its gradient is the sum of dS over batch AND windows —
    accumulated in a tiny f32 VMEM scratch across the sequential TPU grid
    (zeroed by the first program, written out by the last). The shift mask
    (nW, T, S) is a trace-time constant: its cotangent is zeros, produced in
    XLA, never touching the kernel. (A first variant taking the combined
    (nW, N, w², w²) bias OOM'd scoped VMEM in the backward — the padded
    (…,56,128) dbias output + scratch alone cost ~11 MB.)

Dispatch lives in models/swin.py; the einsum path remains for CPU and for
attention dropout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_WINDOW_SEQ = 256


def _fwd_kernel(q_ref, k_ref, v_ref, pe_ref, *rest, n_heads: int, scale: float, has_mask: bool):
    if has_mask:
        mask_ref, o_ref = rest
    else:
        (o_ref,) = rest
        mask_ref = None
    nW = q_ref.shape[1]
    D = q_ref.shape[-1]
    H = D // n_heads

    def body(i, _):
        q = q_ref[0, i].astype(jnp.float32) * scale  # (T, D)
        k = k_ref[0, i].astype(jnp.float32)
        v = v_ref[0, i].astype(jnp.float32)
        m = mask_ref[i].astype(jnp.float32) if mask_ref is not None else None
        outs = []
        for h in range(n_heads):
            sl = slice(h * H, (h + 1) * H)
            logits = jax.lax.dot_general(
                q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            logits = logits + pe_ref[0, h].astype(jnp.float32)
            if m is not None:
                logits = logits + m
            mx = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - mx)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            outs.append(jnp.dot(p, v[:, sl], preferred_element_type=jnp.float32))
        o_ref[0, i] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nW, body, 0)


def _bwd_kernel(
    q_ref, k_ref, v_ref, pe_ref, *rest,
    n_heads: int, scale: float, n_programs: int, has_mask: bool,
):
    if has_mask:
        mask_ref, g_ref, dq_ref, dk_ref, dv_ref, dpe_ref, acc = rest
    else:
        g_ref, dq_ref, dk_ref, dv_ref, dpe_ref, acc = rest
        mask_ref = None
    b = pl.program_id(0)
    nW = q_ref.shape[1]
    D = q_ref.shape[-1]
    H = D // n_heads

    @pl.when(b == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    def body(i, _):
        q = q_ref[0, i].astype(jnp.float32) * scale
        k = k_ref[0, i].astype(jnp.float32)
        v = v_ref[0, i].astype(jnp.float32)
        go = g_ref[0, i].astype(jnp.float32)
        m = mask_ref[i].astype(jnp.float32) if mask_ref is not None else None
        dqs, dks, dvs = [], [], []
        for h in range(n_heads):
            sl = slice(h * H, (h + 1) * H)
            qs, kh, vh, gh = q[:, sl], k[:, sl], v[:, sl], go[:, sl]
            logits = jax.lax.dot_general(
                qs, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            logits = logits + pe_ref[0, h].astype(jnp.float32)
            if m is not None:
                logits = logits + m
            mx = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - mx)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            dvs.append(
                jax.lax.dot_general(
                    p, gh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )
            )
            dp = jax.lax.dot_general(
                gh, vh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # (T, S)
            acc[h] = acc[h] + ds  # dPE: Σ over batch and windows
            dqs.append(jnp.dot(ds, kh, preferred_element_type=jnp.float32) * scale)
            dks.append(
                jax.lax.dot_general(
                    ds, qs, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )
            )
        dq_ref[0, i] = jnp.concatenate(dqs, axis=1).astype(dq_ref.dtype)
        dk_ref[0, i] = jnp.concatenate(dks, axis=1).astype(dk_ref.dtype)
        dv_ref[0, i] = jnp.concatenate(dvs, axis=1).astype(dv_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nW, body, 0)

    @pl.when(b == n_programs - 1)
    def _():
        dpe_ref[...] = acc[...].reshape(dpe_ref.shape).astype(dpe_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _swin_attention(q, k, v, pe, mask, n_heads: int, interpret: bool):
    out, _ = _swin_attention_fwd(q, k, v, pe, mask, n_heads, interpret)
    return out


def _swin_attention_fwd(q, k, v, pe, mask, n_heads: int, interpret: bool):
    B, nW, T, D = q.shape
    S = k.shape[2]
    has_mask = mask is not None
    in_specs = [
        pl.BlockSpec((1, nW, T, D), lambda b: (b, 0, 0, 0)),
        pl.BlockSpec((1, nW, S, D), lambda b: (b, 0, 0, 0)),
        pl.BlockSpec((1, nW, S, D), lambda b: (b, 0, 0, 0)),
        pl.BlockSpec((1, n_heads, T, S), lambda b: (0, 0, 0, 0)),
    ]
    args = [q, k, v, pe]
    if has_mask:
        in_specs.append(pl.BlockSpec((nW, T, S), lambda b: (0, 0, 0)))
        args.append(mask)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, n_heads=n_heads, scale=(D // n_heads) ** -0.5, has_mask=has_mask
        ),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nW, T, D), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, nW, T, D), q.dtype),
        interpret=interpret,
    )(*args)
    return out, (q, k, v, pe, mask)


def _swin_attention_bwd(n_heads: int, interpret: bool, res, g):
    q, k, v, pe, mask = res
    B, nW, T, D = q.shape
    S = k.shape[2]
    has_mask = mask is not None
    blk_t = pl.BlockSpec((1, nW, T, D), lambda b: (b, 0, 0, 0))
    blk_s = pl.BlockSpec((1, nW, S, D), lambda b: (b, 0, 0, 0))
    pe_spec = pl.BlockSpec((1, n_heads, T, S), lambda b: (0, 0, 0, 0))
    in_specs = [blk_t, blk_s, blk_s, pe_spec]
    args = [q, k, v, pe]
    if has_mask:
        in_specs.append(pl.BlockSpec((nW, T, S), lambda b: (0, 0, 0)))
        args.append(mask)
    in_specs.append(blk_t)
    args.append(g)
    dq, dk, dv, dpe = pl.pallas_call(
        functools.partial(
            _bwd_kernel, n_heads=n_heads, scale=(D // n_heads) ** -0.5,
            n_programs=B, has_mask=has_mask,
        ),
        grid=(B,),
        in_specs=in_specs,
        out_specs=(blk_t, blk_s, blk_s, pe_spec),
        out_shape=(
            jax.ShapeDtypeStruct((B, nW, T, D), q.dtype),
            jax.ShapeDtypeStruct((B, nW, S, D), k.dtype),
            jax.ShapeDtypeStruct((B, nW, S, D), v.dtype),
            jax.ShapeDtypeStruct((1, n_heads, T, S), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((n_heads, T, S), jnp.float32)],
        interpret=interpret,
    )(*args)
    dmask = jnp.zeros_like(mask) if has_mask else None
    return dq, dk, dv, dpe.astype(pe.dtype), dmask


_swin_attention.defvjp(_swin_attention_fwd, _swin_attention_bwd)


def swin_window_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    pe_bias: jax.Array,
    mask: jax.Array | None,
    n_heads: int,
    interpret: bool | None = None,
) -> jax.Array:
    """Biased windowed attention.

    q/k/v: (B, nW, T, n_heads·head_dim) — the projections' packed layout.
    pe_bias: (1, n_heads, T, S), differentiable (relative-PE gather).
    mask: optional (nW, T, S) constant additive shift mask.
    Returns (B, nW, T, n_heads·head_dim).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _swin_attention(q, k, v, pe_bias, mask, n_heads, interpret)


def use_swin_kernel(t: int, s: int, n_pairs: int, dropout: float, train: bool) -> bool:
    """Dispatch: DISABLED — measured, rejected on v5e.

    Unlike the ViT-regime kernel (ops/short_attention.py, +27% train), this
    one LOSES to the XLA einsum path: swin_t train step 167.5 ms vs 132.5,
    swin_s3-t (window 14) 156.1 vs 137.1 at bs128@224. Swin fragments the
    work into nW·heads tiny (w², head_dim≤32) matmuls per image; the
    in-kernel fori loop runs them serially at a few-% MXU utilization,
    while XLA's batched einsum keeps the MXU busy and its HBM cost for the
    small probs tensors is less than the kernel's serialization loss.
    The kernel (correct, gradient-tested incl. the dPE reduction) is kept
    as the starting point for hardware where the tradeoff flips."""
    return False
