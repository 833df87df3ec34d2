"""Fused transformer self-attention half-block — Pallas TPU kernel.

Computes ``out = x + drop_path · layer_scale · (Attn(LN(x)) @ Wo + bo)`` in
one grid program per image, where Attn is unbiased multi-head self-attention
(softmax(q kᵀ/√d) v) with q/k/v projected in-kernel from the LayerNorm
output. Replaces the XLA chain LayerNorm → 3×Linear → attention →
Linear → LayerScale → StochasticDepth → residual (reference
vit.py:18-48 + 60-92) and extends ops/short_attention.py (the measured
+27% packed kernel) with the block's prologue/epilogue, eliminating the
HBM round trips of y/q/k/v/o between the phases.

FLOP parity with XLA autodiff: the backward recomputes only the softmax
probs (exactly what the short-attention kernel already does, and what
flash-attention recompute does) — all matmul work is identical:
  in-kernel  : do = dout_s@Woᵀ, attention bwd, dy = Σ dq/k/v @ Wᵀ
  XLA        : dWq/k/v = yᵀ@dq/k/v, dWo = oᵀ@dout_s
with y/q/k/v/o saved bf16 from the forward (what XLA's autodiff saves too).

Weights (4·D² bf16 ≤ 4.7 MB at D=768) are constant-index VMEM-resident
blocks, fetched once for the whole grid. Per-sample drop-path and
per-channel LayerScale ride the epilogue; their grads (plus all biases and
LN params) accumulate across grid programs in constant-index f32 blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .block_mlp import _SMEM_SPEC, _dp_rows, _ln_f32, _pick_group, _row2

MAX_SEQ = 512


def _proj(y, w_ref, b_ref):
    """(rows, D) bf16 @ (D, D) + (1, D) → f32."""
    return jax.lax.dot_general(
        y, w_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) + b_ref[0].astype(jnp.float32)


def _head_slices(d: int, n_heads: int):
    hd = d // n_heads
    return [slice(h * hd, (h + 1) * hd) for h in range(n_heads)]


def _attn_fwd_heads(q, k, v, n_heads: int, scale: float, g: int, t: int):
    """Per-head, PER-IMAGE softmax attention on packed (g·t, D) bf16 operands
    → (list of (g·t, hd) f32 head outputs, (g, H, t, t) bf16 probs) — tokens
    never attend across the images stacked in one grid program. The probs are
    saved for the backward (an HBM stream beats recomputing logits + softmax:
    the exp over B·H·T² elements is VPU-bound)."""
    outs, probs = [], []
    for sl in _head_slices(q.shape[-1], n_heads):
        blocks, pblocks = [], []
        for gg in range(g):
            rs = slice(gg * t, (gg + 1) * t)
            logits = jax.lax.dot_general(
                q[rs, sl].astype(jnp.float32) * scale, k[rs, sl].astype(jnp.float32),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(jnp.bfloat16)
            pblocks.append(p)
            blocks.append(jnp.dot(p, v[rs, sl], preferred_element_type=jnp.float32))
        outs.append(jnp.concatenate(blocks, axis=0) if g > 1 else blocks[0])
        probs.append(jnp.stack(pblocks, axis=0))  # (g, t, t)
    return outs, jnp.stack(probs, axis=1)  # (g, H, t, t)


def _fwd_kernel(
    x_ref, lns_ref, lnb_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
    wo_ref, bo_ref, ls_ref, dp_ref,
    out_ref, xhat_ref, rstd_ref, q_ref, k_ref, v_ref, o_ref, p_ref, *rest,
    n_heads: int, eps: float, has_ls: bool,
):
    if has_ls:
        (proj_ref,) = rest
    else:
        rest = ()
    G, T, D = x_ref.shape
    rows = G * T
    scale = (D // n_heads) ** -0.5

    x = x_ref[...].reshape(rows, D).astype(jnp.float32)
    xhat, rstd = _ln_f32(x, eps)
    # saving xhat (bf16) + rstd lets the backward skip BOTH the x stream and
    # the LN-stat recompute; XLA reconstructs y = xhat·γ+β for dWq/k/v
    xhat_ref[...] = xhat.astype(jnp.bfloat16).reshape(G, T, D)
    rstd_ref[...] = rstd.reshape(G, T, 1)
    y = (xhat * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)).astype(
        jnp.bfloat16
    )

    # wq etc. stored transposed (out_dim, in_dim) so dot_general contracts
    # their minor dim against y's minor dim with no in-kernel relayout
    q = _proj(y, wq_ref, bq_ref).astype(jnp.bfloat16)
    k = _proj(y, wk_ref, bk_ref).astype(jnp.bfloat16)
    v = _proj(y, wv_ref, bv_ref).astype(jnp.bfloat16)
    q_ref[...] = q.reshape(G, T, D)
    k_ref[...] = k.reshape(G, T, D)
    v_ref[...] = v.reshape(G, T, D)

    heads, probs = _attn_fwd_heads(q, k, v, n_heads, scale, G, T)
    p_ref[...] = probs
    o = jnp.concatenate(heads, axis=1).astype(jnp.bfloat16)
    o_ref[...] = o.reshape(G, T, D)

    proj = _proj(o, wo_ref, bo_ref)
    if has_ls:
        proj_ref[...] = proj.astype(proj_ref.dtype).reshape(G, T, D)
    epi = _dp_rows(dp_ref, pl.program_id(0), G, T) * ls_ref[0].astype(jnp.float32)
    out_ref[...] = (x + epi * proj).astype(out_ref.dtype).reshape(G, T, D)


def _bwd_kernel(
    xhat_ref, rstd_ref, dout_ref, q_ref, k_ref, v_ref, p_ref, wq_ref, wk_ref, wv_ref,
    wo_ref, lns_ref, ls_ref, dp_ref, *rest,
    n_heads: int, eps: float, has_ls: bool,
):
    if has_ls:
        (proj_ref, dx_ref, dq_ref, dk_ref, dv_ref, dbq_ref, dbk_ref, dbv_ref,
         dbo_ref, dlns_ref, dlnb_ref, dls_ref) = rest
    else:
        (dx_ref, dq_ref, dk_ref, dv_ref, dbq_ref, dbk_ref, dbv_ref,
         dbo_ref, dlns_ref, dlnb_ref) = rest
    i = pl.program_id(0)
    G, T, D = xhat_ref.shape
    rows = G * T
    scale = (D // n_heads) ** -0.5

    @pl.when(i == 0)
    def _():
        dbq_ref[...] = jnp.zeros_like(dbq_ref)
        dbk_ref[...] = jnp.zeros_like(dbk_ref)
        dbv_ref[...] = jnp.zeros_like(dbv_ref)
        dbo_ref[...] = jnp.zeros_like(dbo_ref)
        dlns_ref[...] = jnp.zeros_like(dlns_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)
        if has_ls:
            dls_ref[...] = jnp.zeros_like(dls_ref)

    dout = dout_ref[...].reshape(rows, D).astype(jnp.float32)
    dprow = _dp_rows(dp_ref, pl.program_id(0), G, T)
    douts = dout * dprow * ls_ref[0].astype(jnp.float32)
    dbo_ref[...] += jnp.sum(douts, axis=0, keepdims=True)
    if has_ls:
        proj = proj_ref[...].reshape(rows, D).astype(jnp.float32)
        dls_ref[...] += jnp.sum(dout * dprow * proj, axis=0, keepdims=True)

    doutsb = douts.astype(jnp.bfloat16)
    # do = dout_s @ Wo (wo stored transposed (D_out, D_in) = (D, D): the
    # cotangent contracts wo's OUT dim, i.e. its sublane dim here)
    do = jax.lax.dot_general(
        doutsb, wo_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)

    q = q_ref[...].reshape(rows, D)
    k = k_ref[...].reshape(rows, D)
    v = v_ref[...].reshape(rows, D)
    dqs, dks, dvs = [], [], []
    for hi, sl in enumerate(_head_slices(D, n_heads)):
        dqb_, dkb_, dvb_ = [], [], []
        for gg in range(G):  # per-image: no cross-image attention
            rs = slice(gg * T, (gg + 1) * T)
            qh = q[rs, sl].astype(jnp.float32) * scale
            kh = k[rs, sl].astype(jnp.float32)
            p = p_ref[gg, hi]  # saved bf16 probs — no logits/softmax recompute
            goh = do[rs, sl]
            dvb_.append(
                jax.lax.dot_general(
                    p, goh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )
            )
            dp_ = jax.lax.dot_general(
                goh, v[rs, sl], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            pf = p.astype(jnp.float32)
            ds = (pf * (dp_ - jnp.sum(dp_ * pf, axis=-1, keepdims=True))).astype(jnp.bfloat16)
            dqb_.append(
                jnp.dot(ds, kh.astype(jnp.bfloat16), preferred_element_type=jnp.float32) * scale
            )
            dkb_.append(
                jax.lax.dot_general(
                    ds, (qh).astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        cat = lambda bs: jnp.concatenate(bs, axis=0) if G > 1 else bs[0]
        dqs.append(cat(dqb_))
        dks.append(cat(dkb_))
        dvs.append(cat(dvb_))
    dq = jnp.concatenate(dqs, axis=1)
    dk = jnp.concatenate(dks, axis=1)
    dv = jnp.concatenate(dvs, axis=1)
    dbq_ref[...] += jnp.sum(dq, axis=0, keepdims=True)
    dbk_ref[...] += jnp.sum(dk, axis=0, keepdims=True)
    dbv_ref[...] += jnp.sum(dv, axis=0, keepdims=True)
    dqb = dq.astype(jnp.bfloat16)
    dkb = dk.astype(jnp.bfloat16)
    dvb = dv.astype(jnp.bfloat16)
    dq_ref[...] = dqb.reshape(G, T, D)
    dk_ref[...] = dkb.reshape(G, T, D)
    dv_ref[...] = dvb.reshape(G, T, D)

    # dy = dq@Wqᵀ + dk@Wkᵀ + dv@Wvᵀ (w stored transposed → contract out dim)
    dy = jax.lax.dot_general(
        dqb, wq_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dy += jax.lax.dot_general(
        dkb, wk_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dy += jax.lax.dot_general(
        dvb, wv_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    xhat = xhat_ref[...].reshape(rows, D).astype(jnp.float32)
    rstd = rstd_ref[...].reshape(rows, 1)
    dlns_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    dlnb_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    dxh = dy * lns_ref[0].astype(jnp.float32)
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    dx_ln = rstd * (dxh - m1 - xhat * m2)
    dx_ref[...] = (dout + dx_ln).astype(dx_ref.dtype).reshape(G, T, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16, 17))
def _fused_attn(x, lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo, ls, dp,
                n_heads, group, has_ls, interpret, eps):
    out, _ = _fused_attn_fwd(x, lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo, ls, dp,
                             n_heads, group, has_ls, interpret, eps)
    return out


def _specs(B, T, D, G):
    act = pl.BlockSpec((G, T, D), lambda i: (i, 0, 0))
    w = pl.BlockSpec((D, D), lambda i: (0, 0))
    vec = pl.BlockSpec((1, D), lambda i: (0, 0))
    dpv = _SMEM_SPEC()
    return act, w, vec, dpv


def _fused_attn_fwd(x, lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo, ls, dp,
                    n_heads, group, has_ls, interpret, eps):
    B, T, D = x.shape
    G = _pick_group(B, group)
    act, w, vec, dpv = _specs(B, T, D, G)
    H = n_heads
    pspec = pl.BlockSpec((G, H, T, T), lambda i: (i, 0, 0, 0))
    rspec = pl.BlockSpec((G, T, 1), lambda i: (i, 0, 0))
    bact = lambda: jax.ShapeDtypeStruct((B, T, D), jnp.bfloat16)
    out_shapes = [
        jax.ShapeDtypeStruct((B, T, D), x.dtype),  # out
        bact(),  # xhat (bf16, saved for the LN backward + y reconstruction)
        jax.ShapeDtypeStruct((B, T, 1), jnp.float32),  # rstd
        bact(), bact(), bact(), bact(),  # q, k, v, o
        jax.ShapeDtypeStruct((B, H, T, T), jnp.bfloat16),  # softmax probs
    ]
    out_specs = [act, act, rspec, act, act, act, act, pspec]
    if has_ls:
        out_shapes.append(bact())  # pre-LS projection (for dγ_ls)
        out_specs.append(act)
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, n_heads=n_heads, eps=eps, has_ls=has_ls),
        grid=(B // G,),
        in_specs=[act, vec, vec, w, vec, w, vec, w, vec, w, vec, vec, dpv],
        out_specs=out_specs,
        out_shape=out_shapes,
        # same raised scoped budget as the backward: the saved-probs block
        # plus the resident weights graze the 16 MB default at D=768/T=197
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=20 * 1024 * 1024),
        interpret=interpret,
    )(
        x, _row2(lns), _row2(lnb),
        wq.T, _row2(bq), wk.T, _row2(bk), wv.T, _row2(bv), wo.T, _row2(bo),
        _row2(ls), dp,
    )
    if has_ls:
        out, xhat, rstd, q, k, v, o, p, proj = outs
    else:
        (out, xhat, rstd, q, k, v, o, p), proj = outs, None
    return out, (xhat, rstd, q, k, v, o, p, wq, bq, wk, bk, wv, bv, wo, bo, lns, lnb, ls, dp, proj)


def _fused_attn_bwd(n_heads, group, has_ls, interpret, eps, res, dout):
    xhat, rstd, q, k, v, o, p, wq, bq, wk, bk, wv, bv, wo, bo, lns, lnb, ls, dp, proj = res
    B, T, D = xhat.shape
    G = _pick_group(B, group)
    act, w, vec, dpv = _specs(B, T, D, G)
    pspec = pl.BlockSpec((G, n_heads, T, T), lambda i: (i, 0, 0, 0))
    rspec = pl.BlockSpec((G, T, 1), lambda i: (i, 0, 0))
    fvec = jax.ShapeDtypeStruct((1, D), jnp.float32)
    bact = lambda: jax.ShapeDtypeStruct((B, T, D), jnp.bfloat16)
    out_shapes = [
        jax.ShapeDtypeStruct((B, T, D), dout.dtype),  # dx
        bact(), bact(), bact(),  # dq, dk, dv
        fvec, fvec, fvec, fvec,  # dbq, dbk, dbv, dbo
        fvec, fvec,  # dγ_ln, dβ_ln
    ]
    out_specs = [act, act, act, act, vec, vec, vec, vec, vec, vec]
    if has_ls:
        out_shapes.append(fvec)
        out_specs.append(vec)
    # o is NOT a kernel operand — it is only needed for dWo, computed in XLA
    in_specs = [act, rspec, act, act, act, act, pspec, w, w, w, w, vec, vec, dpv]
    operands = [xhat, rstd, dout, q, k, v, p, wq.T, wk.T, wv.T, wo.T, _row2(lns), _row2(ls), dp]
    if has_ls:
        in_specs.append(act)
        operands.append(proj)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, n_heads=n_heads, eps=eps, has_ls=has_ls),
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        # the pipeline's double-buffered blocks + resident weights graze the
        # default 16 MB scoped budget at D=768/H=12; measured to fit and run
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=20 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    if has_ls:
        dx, dq, dk, dv, dbq, dbk, dbv, dbo, dlns, dlnb, dls = outs
    else:
        (dx, dq, dk, dv, dbq, dbk, dbv, dbo, dlns, dlnb), dls = outs, None

    rows = B * T
    # y reconstructed from the saved xhat (XLA fuses the elementwise chain
    # into the matmul input) — the forward no longer streams y to HBM
    yf = (xhat.astype(jnp.float32) * lns.astype(jnp.float32) + lnb.astype(jnp.float32)) \
        .astype(jnp.bfloat16).reshape(rows, D)
    mm = lambda a, b: jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dwq = mm(yf, dq.reshape(rows, D)).astype(wq.dtype)
    dwk = mm(yf, dk.reshape(rows, D)).astype(wk.dtype)
    dwv = mm(yf, dv.reshape(rows, D)).astype(wv.dtype)
    douts = (dout * (dp[:, None, :] * ls).astype(dout.dtype)).reshape(rows, D)
    dwo = mm(o.reshape(rows, D), douts).astype(wo.dtype)

    to = lambda a, ref: a.astype(ref.dtype)
    return (
        dx,
        to(dlns[0], lns),
        to(dlnb[0], lns),
        # bias cotangents in the BIAS's dtype (weights were bf16-cast on
        # entry, biases were not — f32 callers must get f32 bias grads back)
        dwq, to(dbq[0], bq),
        dwk, to(dbk[0], bk),
        dwv, to(dbv[0], bv),
        dwo, to(dbo[0], bo),
        to(dls[0], ls) if has_ls else jnp.zeros_like(ls),
        jnp.zeros_like(dp),
    )


_fused_attn.defvjp(_fused_attn_fwd, _fused_attn_bwd)


def fused_attention_block(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    wq: jax.Array, bq: jax.Array,
    wk: jax.Array, bk: jax.Array,
    wv: jax.Array, bv: jax.Array,
    wo: jax.Array, bo: jax.Array,
    n_heads: int,
    ls_gamma: jax.Array | None = None,
    dp_scale: jax.Array | None = None,
    *,
    eps: float = 1e-6,
    group: int = 1,
    interpret: bool | None = None,
) -> jax.Array:
    """``x + dp·γ_ls·(MHA(LN(x)) @ Wo + bo)`` as one fused Pallas program.

    x: (B, T, D); all w: (D, D) in the Linear (in, out) layout."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if _FORCED_GROUP is not None:
        group = _FORCED_GROUP
    has_ls = ls_gamma is not None
    ls = ls_gamma if has_ls else jnp.ones((x.shape[-1],), jnp.float32)
    dp = dp_scale if dp_scale is not None else jnp.ones((x.shape[0], 1), jnp.float32)
    # the kernel's matmuls run bf16×bf16 (the VMEM budget is counted in
    # bf16); casting here keeps f32-param callers working — autodiff of the
    # cast upcasts the weight cotangents back
    b16 = lambda a: a.astype(jnp.bfloat16)
    return _fused_attn(
        x, ln_scale, ln_bias, b16(wq), bq, b16(wk), bk, b16(wv), bv,
        b16(wo), bo, ls, dp, n_heads, group, has_ls, interpret, float(eps),
    )


_FORCE_ON = False  # tests set this to exercise the module dispatch on CPU
_DISABLE = False  # measurement scripts set this for in-model A/B brackets
_FORCED_GROUP: int | None = None  # measurement override for the group sweep


def _program_vmem_bytes(d_model: int, n_heads: int, t: int, g: int = 1) -> int:
    """Per-program VMEM estimate: resident weights + the T-dependent blocks
    a grid step streams (x/out/xhat + q/k/v/o + the saved (G,H,T,T) bf16
    probs + rstd). The backward adds dout/dq/dk/dv in place of some outputs
    — same order of magnitude, so one bound serves both."""
    weights = 4 * d_model * d_model * 2  # bf16
    acts = 9 * g * t * d_model * 2  # bf16 streams (x, out, xhat, q, k, v, o, proj, dout)
    probs = g * n_heads * t * t * 2
    rstd = g * t * 4
    return weights + acts + probs + rstd


def use_fused_attention(d_model: int, n_heads: int, t: int, dropout: float, bias: bool) -> bool:
    """Resident 4·D² bf16 weights + whole (T, S) score matrices in VMEM —
    the short-attention regime (T ≤ 512) with the projections folded in."""
    if _DISABLE:
        return False
    ok = (
        dropout == 0.0
        and bias
        and d_model % 128 == 0
        and d_model % n_heads == 0
        and 2 <= t <= MAX_SEQ
        # strict: ViT-L's 4·1024² bf16 weights are exactly 8 MB — together
        # with the per-program activations that over-fills v5e VMEM
        and 4 * d_model * d_model * 2 < 8 * 1024 * 1024
        # AND budget the T-DEPENDENT blocks, not just the weights: vit_b at
        # 320px+ (T=401: ~14.1 MB/program incl. the saved probs) passes the
        # shape gates but must fall back to XLA instead of failing Mosaic
        # compilation (the bug class a86df16 fixed for the CaiT kernel).
        # 12 MiB leaves pipeline-buffer headroom under the 20 MiB limit;
        # vit_b/deit_b @224 (T=197: 8.0 MiB) fit, vit_b @320 (T=401:
        # 13.5 MiB) falls back.
        and _program_vmem_bytes(d_model, n_heads, t) <= 12 * 1024 * 1024
    )
    return ok and (_FORCE_ON or jax.default_backend() == "tpu")
