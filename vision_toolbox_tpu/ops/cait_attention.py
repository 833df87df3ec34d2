"""Fused talking-head attention (CaiT) — Pallas TPU kernel.

CaiT's TalkingHeadAttention (reference cait.py:32-51) inserts learnable
(H, H) head-mixing projections before AND after the softmax, so the
(B, H, T, S) logits tensor is consumed twice and cannot use a standard
flash/SDPA kernel — it is the one attention family still fully on XLA by
necessity (round-2 status). XLA materializes the logits chain in HBM:
logits → mix → softmax → mix → out is ~5 crossings of a (B, H, T, S) f32
tensor (CaiT-S bs128: 8×197² ≈ 1.2 GB per block per direction).

This kernel processes one image per grid program with ALL heads' (T, S)
score matrices resident in VMEM (H ≤ 16, T ≤ 512 → ≤ 16 MB f32 worst case,
CaiT real shapes ≤ 2.5 MB): per head an MXU matmul builds the logits, the
head-mixes are H² scalar-weighted VPU accumulations (H is 4-16 — an (H, H)
matmul would waste the MXU), softmax stays in VMEM, and only q/k/v/o cross
HBM. The backward recomputes the forward in VMEM and additionally
accumulates the four mix-parameter gradients across grid programs in f32
scratch (TPU grid programs run sequentially, so += accumulation into a
shared output block is exact).

Dispatch lives in models/cait.py; keep-or-disable is decided by measurement
(BENCHMARKS.md), like ops/swin_attention.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

MAX_T = 512


def _heads(D: int, H: int) -> list[slice]:
    hd = D // H
    return [slice(h * hd, (h + 1) * hd) for h in range(H)]


def _fwd_core(q, k, n_heads: int, ml, mlb, scale: float):
    """logits per head → pre-softmax mix → softmax. Returns (raw, probs)."""
    sls = _heads(q.shape[-1], n_heads)
    raw = [
        jax.lax.dot_general(
            q[:, sl] * scale, k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for sl in sls
    ]
    probs = []
    for g in range(n_heads):
        acc = mlb[g]
        for h in range(n_heads):
            acc = acc + ml[g, h] * raw[h]
        m = jnp.max(acc, axis=-1, keepdims=True)
        e = jnp.exp(acc - m)
        probs.append(e / jnp.sum(e, axis=-1, keepdims=True))
    return raw, probs


def _mix(mats, w, b, g: int, n_heads: int):
    acc = b[g]
    for h in range(n_heads):
        acc = acc + w[g, h] * mats[h]
    return acc


def _fwd_kernel(q_ref, k_ref, v_ref, ml_ref, mlb_ref, mw_ref, mwb_ref, o_ref,
                *, n_heads: int, scale: float):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    ml, mlb = ml_ref[...], mlb_ref[...]
    mw, mwb = mw_ref[...], mwb_ref[...]
    _, probs = _fwd_core(q, k, n_heads, ml, mlb, scale)
    sls = _heads(q.shape[-1], n_heads)
    outs = [
        jnp.dot(_mix(probs, mw, mwb, g, n_heads), v[:, sls[g]],
                preferred_element_type=jnp.float32)
        for g in range(n_heads)
    ]
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, ml_ref, mlb_ref, mw_ref, mwb_ref, g_ref,
                dq_ref, dk_ref, dv_ref, dml_ref, dmlb_ref, dmw_ref, dmwb_ref,
                *, n_heads: int, scale: float):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dml_ref[...] = jnp.zeros_like(dml_ref)
        dmlb_ref[...] = jnp.zeros_like(dmlb_ref)
        dmw_ref[...] = jnp.zeros_like(dmw_ref)
        dmwb_ref[...] = jnp.zeros_like(dmwb_ref)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    go = g_ref[0].astype(jnp.float32)
    ml, mlb = ml_ref[...], mlb_ref[...]
    mw, mwb = mw_ref[...], mwb_ref[...]
    sls = _heads(q.shape[-1], n_heads)

    raw, probs = _fwd_core(q, k, n_heads, ml, mlb, scale)

    # out_g = mixw(probs)_g @ v_g  with  mixw(probs)_g = mwb_g + Σ_h mw[g,h]·p_h
    dmixw = []
    dvs = []
    for g in range(n_heads):
        gh = go[:, sls[g]]
        pw = _mix(probs, mw, mwb, g, n_heads)
        dvs.append(
            jax.lax.dot_general(pw, gh, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        )
        dmixw.append(
            jax.lax.dot_general(gh, v[:, sls[g]], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        )  # (T, S)

    # param grads of the post-softmax mix + grad into probs
    dmw_acc = [[jnp.sum(dmixw[g] * probs[h]) for h in range(n_heads)] for g in range(n_heads)]
    dmwb_acc = [jnp.sum(dmixw[g]) for g in range(n_heads)]
    dprobs = [
        sum(mw[g, h] * dmixw[g] for g in range(n_heads)) for h in range(n_heads)
    ]

    # softmax backward per head → grad into MIXED logits
    dmixl = [
        probs[h] * (dprobs[h] - jnp.sum(dprobs[h] * probs[h], axis=-1, keepdims=True))
        for h in range(n_heads)
    ]

    # param grads of the pre-softmax mix + grad into raw logits
    dml_acc = [[jnp.sum(dmixl[g] * raw[h]) for h in range(n_heads)] for g in range(n_heads)]
    dmlb_acc = [jnp.sum(dmixl[g]) for g in range(n_heads)]
    draw = [
        sum(ml[g, h] * dmixl[g] for g in range(n_heads)) for h in range(n_heads)
    ]

    dqs, dks = [], []
    for h in range(n_heads):
        dqs.append(jnp.dot(draw[h], k[:, sls[h]], preferred_element_type=jnp.float32) * scale)
        dks.append(
            jax.lax.dot_general(draw[h], q[:, sls[h]] * scale, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        )
    dq_ref[0] = jnp.concatenate(dqs, axis=1).astype(dq_ref.dtype)
    dk_ref[0] = jnp.concatenate(dks, axis=1).astype(dk_ref.dtype)
    dv_ref[0] = jnp.concatenate(dvs, axis=1).astype(dv_ref.dtype)

    dml_ref[...] += jnp.asarray(dml_acc, jnp.float32).reshape(n_heads, n_heads)
    dmlb_ref[...] += jnp.asarray(dmlb_acc, jnp.float32).reshape(n_heads)
    dmw_ref[...] += jnp.asarray(dmw_acc, jnp.float32).reshape(n_heads, n_heads)
    dmwb_ref[...] += jnp.asarray(dmwb_acc, jnp.float32).reshape(n_heads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _talking_head(q, k, v, ml, mlb, mw, mwb, n_heads: int, interpret: bool):
    out, _ = _th_fwd(q, k, v, ml, mlb, mw, mwb, n_heads, interpret)
    return out


def _th_fwd(q, k, v, ml, mlb, mw, mwb, n_heads: int, interpret: bool):
    B, T, D = q.shape
    S = k.shape[1]
    H = n_heads
    scale = (D // H) ** -0.5
    param_specs = [
        pl.BlockSpec((H, H), lambda i: (0, 0)),
        pl.BlockSpec((H,), lambda i: (0,)),
        pl.BlockSpec((H, H), lambda i: (0, 0)),
        pl.BlockSpec((H,), lambda i: (0,)),
    ]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n_heads=H, scale=scale),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, S, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, S, D), lambda i: (i, 0, 0)),
            *param_specs,
        ],
        out_specs=pl.BlockSpec((1, T, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, D), q.dtype),
        interpret=interpret,
    )(q, k, v, ml, mlb, mw, mwb)
    return out, (q, k, v, ml, mlb, mw, mwb)


def _th_bwd(n_heads: int, interpret: bool, res, g):
    q, k, v, ml, mlb, mw, mwb = res
    B, T, D = q.shape
    S = k.shape[1]
    H = n_heads
    scale = (D // H) ** -0.5
    param_specs = [
        pl.BlockSpec((H, H), lambda i: (0, 0)),
        pl.BlockSpec((H,), lambda i: (0,)),
        pl.BlockSpec((H, H), lambda i: (0, 0)),
        pl.BlockSpec((H,), lambda i: (0,)),
    ]
    dq, dk, dv, dml, dmlb, dmw, dmwb = pl.pallas_call(
        functools.partial(_bwd_kernel, n_heads=H, scale=scale),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, S, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, S, D), lambda i: (i, 0, 0)),
            *param_specs,
            pl.BlockSpec((1, T, D), lambda i: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, T, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, S, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, S, D), lambda i: (i, 0, 0)),
            *param_specs,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, D), q.dtype),
            jax.ShapeDtypeStruct((B, S, D), k.dtype),
            jax.ShapeDtypeStruct((B, S, D), v.dtype),
            jax.ShapeDtypeStruct((H, H), jnp.float32),
            jax.ShapeDtypeStruct((H,), jnp.float32),
            jax.ShapeDtypeStruct((H, H), jnp.float32),
            jax.ShapeDtypeStruct((H,), jnp.float32),
        ),
        interpret=interpret,
    )(q, k, v, ml, mlb, mw, mwb, g)
    return (
        dq, dk, dv,
        dml.astype(ml.dtype), dmlb.astype(mlb.dtype),
        dmw.astype(mw.dtype), dmwb.astype(mwb.dtype),
    )


_talking_head.defvjp(_th_fwd, _th_bwd)


def talking_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mix_l: jax.Array,
    mix_l_bias: jax.Array,
    mix_w: jax.Array,
    mix_w_bias: jax.Array,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused CaiT talking-head attention.

    q/k/v: (B, T, N·H) packed layout (the projections' natural output);
    mix_l/mix_w: (N, N) pre/post-softmax head mixes with (N,) biases.
    Returns (B, T, N·H)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_heads = mix_l.shape[0]
    return _talking_head(
        q, k, v,
        mix_l.astype(jnp.float32), mix_l_bias.astype(jnp.float32),
        mix_w.astype(jnp.float32), mix_w_bias.astype(jnp.float32),
        n_heads, interpret,
    )


def use_talking_head_kernel(t: int, s: int, n_heads: int) -> bool:
    """Dispatch: measured decision recorded in BENCHMARKS.md.

    The backward kernel keeps ~6 head-stacked (T,S) f32 intermediates live
    per program (raw, probs, dmixw, dprobs, dmixl, draw), so the gate is a
    byte budget over that live set — not independent caps — or a model
    inside naive caps (e.g. H=16, T=S=512 ≈ 100 MB) would fail Mosaic
    compilation at train time against the ~16 MB VMEM arena."""
    live_bytes = 6 * n_heads * t * s * 4
    return (
        jax.default_backend() == "tpu"
        and t <= MAX_T
        and s <= MAX_T
        and n_heads <= 16
        and live_bytes <= 12 * 1024 * 1024
    )
