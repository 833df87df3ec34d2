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
    wo_ref, bo_ref, ls_ref, dp_ref, *rest,
    n_heads: int, eps: float, has_ls: bool, has_res: bool, save: bool,
):
    if has_res:  # separate residual stream (the head-split chain's partial)
        res_ref, *rest = rest
    else:
        res_ref = None
    if save:
        out_ref, xhat_ref, rstd_ref, q_ref, k_ref, v_ref, o_ref, p_ref, *rest = rest
        if has_ls:
            (proj_ref,) = rest
    else:  # inference: out is the ONLY HBM output (no backward-save streams)
        (out_ref,) = rest
    G, T, D = x_ref.shape
    Dq = wq_ref.shape[0]  # head-group width (== D except in the split chain)
    rows = G * T
    scale = (Dq // n_heads) ** -0.5  # head_dim is per-group-head width

    x = x_ref[...].reshape(rows, D).astype(jnp.float32)
    xhat, rstd = _ln_f32(x, eps)
    if save:
        # saving xhat (bf16) + rstd lets the backward skip BOTH the x stream
        # and the LN-stat recompute; XLA reconstructs y = xhat·γ+β for dWq/k/v
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
    if save:
        q_ref[...] = q.reshape(G, T, Dq)
        k_ref[...] = k.reshape(G, T, Dq)
        v_ref[...] = v.reshape(G, T, Dq)

    heads, probs = _attn_fwd_heads(q, k, v, n_heads, scale, G, T)
    o = jnp.concatenate(heads, axis=1) if n_heads > 1 else heads[0]
    o = o.astype(jnp.bfloat16)
    if save:
        p_ref[...] = probs
        o_ref[...] = o.reshape(G, T, Dq)

    proj = _proj(o, wo_ref, bo_ref)
    if save and has_ls:
        proj_ref[...] = proj.astype(proj_ref.dtype).reshape(G, T, D)
    epi = _dp_rows(dp_ref, pl.program_id(0), G, T) * ls_ref[0].astype(jnp.float32)
    radd = (res_ref[...].reshape(rows, D).astype(jnp.float32) if has_res else x)
    out_ref[...] = (radd + epi * proj).astype(out_ref.dtype).reshape(G, T, D)


def _bwd_kernel(
    xhat_ref, rstd_ref, dout_ref, q_ref, k_ref, v_ref, p_ref, wq_ref, wk_ref, wv_ref,
    wo_ref, lns_ref, ls_ref, dp_ref, *rest,
    n_heads: int, eps: float, has_ls: bool, has_res: bool,
):
    if has_ls:
        (proj_ref, dx_ref, dq_ref, dk_ref, dv_ref, dbq_ref, dbk_ref, dbv_ref,
         dbo_ref, dlns_ref, dlnb_ref, dls_ref) = rest
    else:
        (dx_ref, dq_ref, dk_ref, dv_ref, dbq_ref, dbk_ref, dbv_ref,
         dbo_ref, dlns_ref, dlnb_ref) = rest
    i = pl.program_id(0)
    G, T, D = xhat_ref.shape
    Dq = q_ref.shape[-1]  # head-group width (== D except in the split chain)
    rows = G * T
    scale = (Dq // n_heads) ** -0.5

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

    q = q_ref[...].reshape(rows, Dq)
    k = k_ref[...].reshape(rows, Dq)
    v = v_ref[...].reshape(rows, Dq)
    dqs, dks, dvs = [], [], []
    for hi, sl in enumerate(_head_slices(Dq, n_heads)):
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
    cat1 = lambda xs: jnp.concatenate(xs, axis=1) if n_heads > 1 else xs[0]
    dq = cat1(dqs)
    dk = cat1(dks)
    dv = cat1(dvs)
    dbq_ref[...] += jnp.sum(dq, axis=0, keepdims=True)
    dbk_ref[...] += jnp.sum(dk, axis=0, keepdims=True)
    dbv_ref[...] += jnp.sum(dv, axis=0, keepdims=True)
    dqb = dq.astype(jnp.bfloat16)
    dkb = dk.astype(jnp.bfloat16)
    dvb = dv.astype(jnp.bfloat16)
    dq_ref[...] = dqb.reshape(G, T, Dq)
    dk_ref[...] = dkb.reshape(G, T, Dq)
    dv_ref[...] = dvb.reshape(G, T, Dq)

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
    if has_res:  # residual grad flows through dres (identity, XLA-side)
        dx_ref[...] = dx_ln.astype(dx_ref.dtype).reshape(G, T, D)
    else:
        dx_ref[...] = (dout + dx_ln).astype(dx_ref.dtype).reshape(G, T, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15, 16, 17, 18, 19))
def _fused_attn(x, lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo, ls, dp, res,
                n_heads, group, has_ls, has_res, interpret, eps):
    # primal body = INFERENCE: custom_vjp only routes through _fused_attn_fwd
    # under differentiation, so the un-differentiated path runs the save-free
    # kernel — none of the backward-save streams (xhat/rstd/q/k/v/o/probs ≈
    # 6 activation streams + the (B,H,T,T) probs) touch HBM at serving time.
    # XLA cannot DCE unused outputs of an opaque kernel.
    return _run_attn(x, lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo, ls, dp,
                     res, n_heads, group, has_ls, has_res, interpret, eps,
                     save=False)[0]


def _specs(B, T, D, Dq, G):
    act = pl.BlockSpec((G, T, D), lambda i: (i, 0, 0))
    qact = pl.BlockSpec((G, T, Dq), lambda i: (i, 0, 0))
    win = pl.BlockSpec((Dq, D), lambda i: (0, 0))  # wq/wk/wv transposed
    wout = pl.BlockSpec((D, Dq), lambda i: (0, 0))  # wo transposed
    vec = pl.BlockSpec((1, D), lambda i: (0, 0))
    qvec = pl.BlockSpec((1, Dq), lambda i: (0, 0))
    dpv = _SMEM_SPEC()
    return act, qact, win, wout, vec, qvec, dpv


def _fused_attn_fwd(x, lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo, ls, dp, res,
                    n_heads, group, has_ls, has_res, interpret, eps):
    outs = _run_attn(x, lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo, ls, dp, res,
                     n_heads, group, has_ls, has_res, interpret, eps, save=True)
    if has_ls:
        out, xhat, rstd, q, k, v, o, p, proj = outs
    else:
        (out, xhat, rstd, q, k, v, o, p), proj = outs, None
    return out, (xhat, rstd, q, k, v, o, p, wq, bq, wk, bk, wv, bv, wo, bo, lns, lnb, ls, dp, proj)


def _run_attn(x, lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo, ls, dp, res,
              n_heads, group, has_ls, has_res, interpret, eps, save):
    B, T, D = x.shape
    Dq = wq.shape[1]  # head-group width (== D except in the split chain)
    G = _pick_group(B, group)
    act, qact, win, wout, vec, qvec, dpv = _specs(B, T, D, Dq, G)
    H = n_heads
    pspec = pl.BlockSpec((G, H, T, T), lambda i: (i, 0, 0, 0))
    rspec = pl.BlockSpec((G, T, 1), lambda i: (i, 0, 0))
    bact = lambda: jax.ShapeDtypeStruct((B, T, D), jnp.bfloat16)
    qbact = lambda: jax.ShapeDtypeStruct((B, T, Dq), jnp.bfloat16)
    out_shapes = [jax.ShapeDtypeStruct((B, T, D), x.dtype)]  # out
    out_specs = [act]
    if save:
        out_shapes += [
            bact(),  # xhat (bf16, saved for the LN backward + y reconstruction)
            jax.ShapeDtypeStruct((B, T, 1), jnp.float32),  # rstd
            qbact(), qbact(), qbact(), qbact(),  # q, k, v, o
            jax.ShapeDtypeStruct((B, H, T, T), jnp.bfloat16),  # softmax probs
        ]
        out_specs += [act, rspec, qact, qact, qact, qact, pspec]
        if has_ls:
            out_shapes.append(bact())  # pre-LS projection (for dγ_ls)
            out_specs.append(act)
    in_specs = [act, vec, vec, win, qvec, win, qvec, win, qvec, wout, vec, vec, dpv]
    operands = [
        x, _row2(lns), _row2(lnb),
        wq.T, _row2(bq), wk.T, _row2(bk), wv.T, _row2(bv), wo.T, _row2(bo),
        _row2(ls), dp,
    ]
    if has_res:
        in_specs.append(act)
        operands.append(res)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n_heads=n_heads, eps=eps, has_ls=has_ls,
                          has_res=has_res, save=save),
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        # same raised scoped budget as the backward: the saved-probs block
        # plus the resident weights graze the 16 MB default at D=768/T=197
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=20 * 1024 * 1024),
        interpret=interpret,
    )(*operands)


def _fused_attn_bwd(n_heads, group, has_ls, has_res, interpret, eps, saved, dout):
    xhat, rstd, q, k, v, o, p, wq, bq, wk, bk, wv, bv, wo, bo, lns, lnb, ls, dp, proj = saved
    B, T, D = xhat.shape
    Dq = wq.shape[1]
    G = _pick_group(B, group)
    act, qact, win, wout, vec, qvec, dpv = _specs(B, T, D, Dq, G)
    pspec = pl.BlockSpec((G, n_heads, T, T), lambda i: (i, 0, 0, 0))
    rspec = pl.BlockSpec((G, T, 1), lambda i: (i, 0, 0))
    fvec = jax.ShapeDtypeStruct((1, D), jnp.float32)
    fqvec = jax.ShapeDtypeStruct((1, Dq), jnp.float32)
    qbact = lambda: jax.ShapeDtypeStruct((B, T, Dq), jnp.bfloat16)
    out_shapes = [
        jax.ShapeDtypeStruct((B, T, D), dout.dtype),  # dx
        qbact(), qbact(), qbact(),  # dq, dk, dv
        fqvec, fqvec, fqvec, fvec,  # dbq, dbk, dbv, dbo
        fvec, fvec,  # dγ_ln, dβ_ln
    ]
    out_specs = [act, qact, qact, qact, qvec, qvec, qvec, vec, vec, vec]
    if has_ls:
        out_shapes.append(fvec)
        out_specs.append(vec)
    # o is NOT a kernel operand — it is only needed for dWo, computed in XLA
    in_specs = [act, rspec, act, qact, qact, qact, pspec, win, win, win, wout, vec, vec, dpv]
    operands = [xhat, rstd, dout, q, k, v, p, wq.T, wk.T, wv.T, wo.T, _row2(lns), _row2(ls), dp]
    if has_ls:
        in_specs.append(act)
        operands.append(proj)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, n_heads=n_heads, eps=eps, has_ls=has_ls,
                          has_res=has_res),
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
    dwq = mm(yf, dq.reshape(rows, Dq)).astype(wq.dtype)
    dwk = mm(yf, dk.reshape(rows, Dq)).astype(wk.dtype)
    dwv = mm(yf, dv.reshape(rows, Dq)).astype(wv.dtype)
    douts = (dout * (dp[:, None, :] * ls).astype(dout.dtype)).reshape(rows, D)
    dwo = mm(o.reshape(rows, Dq), douts).astype(wo.dtype)

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
        # separate residual: identity path, cotangent = dout. has_res=False
        # callers alias res=x, so a structural zero keeps d(x) = dx exactly.
        dout if has_res else jnp.zeros_like(dout),
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

    x: (B, T, D); all w: (D, D) in the Linear (in, out) layout. When the
    resident weights exceed the VMEM budget (ViT-L/H), the call chains the
    SAME kernel over head groups — heads are independent and the output
    projection distributes over them (``out = x + Σ_g epi·(o_g @ Wo_g)``),
    with the running partial carried as a separate-residual operand exactly
    like the hidden-split MLP chain (ops/block_mlp.py)."""
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
    D = x.shape[-1]
    ns = _head_splits(D, n_heads, x.shape[1])
    if ns == 0:
        raise ValueError(
            f"fused_attention_block: no feasible head-split plan for "
            f"d_model={D}, n_heads={n_heads}, t={x.shape[1]}; gate calls "
            f"with use_fused_attention()"
        )
    if ns == 1:
        return _fused_attn(
            x, ln_scale, ln_bias, b16(wq), bq, b16(wk), bk, b16(wv), bv,
            b16(wo), bo, ls, dp, x, n_heads, group, has_ls, False,
            interpret, float(eps),
        )
    c = D // ns
    cur = x
    for s in range(ns):
        sl = slice(s * c, (s + 1) * c)
        cur = _fused_attn(
            x, ln_scale, ln_bias,
            b16(wq[:, sl]), bq[sl], b16(wk[:, sl]), bk[sl], b16(wv[:, sl]), bv[sl],
            b16(wo[sl]), bo if s == 0 else jnp.zeros_like(bo), ls, dp, cur,
            n_heads // ns, group, has_ls, True, interpret, float(eps),
        )
    return cur


_FORCE_ON = False  # tests set this to exercise the module dispatch on CPU
_DISABLE = False  # measurement scripts set this for in-model A/B brackets
_FORCED_GROUP: int | None = None  # measurement override for the group sweep
_ALLOW_HEAD_SPLIT = True  # measured positive on chip (round 4, v5e):
# scripts/measure_block_kernels.py --models vit_l_16, bs32@224 in-model
# A/B/A — attn-only arm 126.7 → 112.1 ms/step (+13.1%); with the MLP
# hidden-split chain the combined arm hits +31.1% train / +20% infer.


_RESIDENT_BUDGET = 8 * 1024 * 1024  # bf16 wq/wk/wv/wo (slices) held in VMEM
_PROGRAM_BUDGET = 12 * 1024 * 1024  # whole per-program estimate (see below)
_LANE_ALIGN = 128  # per-call width alignment (tests shrink to force splits)


def _head_splits(d_model: int, n_heads: int, t: int) -> int:
    """Number of sequential head-group slices so each call's resident
    weights (wq/wk/wv column slices + the wo row slice, bf16) AND its full
    per-program block estimate fit VMEM, with the per-call width keeping
    the proven 128-lane alignment. ViT-Ti/S/B need 1; ViT-L @224 and
    ViT-B @320 need 2; ViT-H has no feasible plan (ns=2 overflows the
    T=257 program budget, ns=4's 320-lane blocks break alignment) and
    falls back to XLA. 0 = no feasible plan. Shared by the dispatch gate
    and the wrapper (one plan)."""
    for ns in (1, 2, 4):
        if n_heads % ns or d_model % ns:
            continue
        if (d_model // ns) % _LANE_ALIGN:
            # per-call q/k/v/o blocks and weight slices must keep the
            # 128-lane alignment the single-call kernel is proven at —
            # a (G,T,320) ViT-H ns=4 block has never compiled under Mosaic
            continue
        if (
            4 * d_model * (d_model // ns) * 2 < _RESIDENT_BUDGET
            and _program_vmem_bytes(d_model, n_heads, t, ns=ns) <= _PROGRAM_BUDGET
        ):
            return ns
    return 0


def _program_vmem_bytes(d_model: int, n_heads: int, t: int, g: int = 1, ns: int = 1) -> int:
    """Per-program VMEM estimate for one (possibly head-split) call:
    resident weight slices + the T-dependent blocks a grid step streams
    (x/out/xhat/proj/dout/res at D, q/k/v/o at D/ns, the saved
    (G, H/ns, T, T) bf16 probs, rstd). The backward swaps dq/dk/dv for some
    forward outputs — same order of magnitude, so one bound serves both."""
    dq = d_model // ns
    weights = 4 * d_model * dq * 2  # bf16
    acts = (6 * d_model + 4 * dq) * g * t * 2  # bf16 streams
    probs = g * (n_heads // ns) * t * t * 2
    rstd = g * t * 4
    return weights + acts + probs + rstd


def use_fused_attention(d_model: int, n_heads: int, t: int, dropout: float, bias: bool) -> bool:
    """Resident weight slices + whole (T, S) score matrices in VMEM — the
    short-attention regime (T ≤ 512) with the projections folded in. ViT-L/H
    route through the head-split chain once _ALLOW_HEAD_SPLIT lands its A/B."""
    if _DISABLE:
        return False
    # shared plan with the wrapper; the plan budgets BOTH the resident
    # weight slices and the T-DEPENDENT blocks (saved probs etc.) — shapes
    # that pass the weight gate but overflow per-program VMEM must fall back
    # to XLA instead of failing Mosaic compilation (the bug class a86df16
    # fixed for the CaiT kernel). 12 MiB leaves pipeline-buffer headroom
    # under the 20 MiB limit; vit_b @224 (T=197: 8.7 MiB, ns=1) fits,
    # vit_b @320 (T=401) needs the ns=2 chain, ViT-L @224 ns=2; ViT-H has
    # no aligned in-budget plan and falls back to XLA.
    ns = _head_splits(d_model, n_heads, t)
    if ns == 0 or (ns > 1 and not _ALLOW_HEAD_SPLIT):
        return False
    ok = (
        dropout == 0.0
        and bias
        and d_model % 128 == 0
        and d_model % n_heads == 0
        and 2 <= t <= MAX_SEQ
    )
    return ok and (_FORCE_ON or jax.default_backend() == "tpu")
