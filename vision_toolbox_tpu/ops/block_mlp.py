"""Fused transformer MLP half-block — Pallas TPU kernel.

Computes ``out = x + drop_path · layer_scale · (gelu(LN(x) @ W1 + b1) @ W2 + b2)``
in one kernel per (image-group, hidden-tile) grid step, replacing the XLA
chain LayerNorm → Linear → GELU → Linear → LayerScale → StochasticDepth →
residual (reference block structure: vit.py:60-92, mlp at vit.py:51-57).

Why: vit_b_16 train sits at 61% of its HBM roof (BENCHMARKS.md roofline);
the written round-3 analysis attributes the gap to *phase alternation* —
bandwidth-bound LN/GELU phases interleaved with compute-bound matmuls, each
crossing HBM. Here the LN (VPU) runs on the resident tile feeding the W1
matmul (MXU) directly, GELU runs on the resident hidden tile feeding W2,
and the residual add happens in the epilogue: activation traffic is exactly
x in, (out, y2, h) out — y2/h are saved for the backward's weight-gradient
matmuls, which is what XLA's autodiff saves too, so the kernel adds ZERO
recompute matmul FLOPs (the byte floor is the target; the MXU floor must
not move).

Memory plan (per core, v5e ~16 MB VMEM): W1ᵀ and W2 live as full
constant-index blocks — fetched ONCE for the whole grid — in (Dh, D)
layout so the per-tile slice is a supported dynamic *sublane* slice; the
per-tile bias lives as a (nj, ht) table sliced by row. The hidden dimension
is tiled over the inner grid axis so the (rows, Dh) tensors never exist in
VMEM, only (rows, ht) tiles.

Backward = one Pallas kernel (K1) + two XLA matmuls:
  K1 (same grid): recomputes the LN statistics (VPU-only — free in FLOPs),
  streams the saved h tiles to produce dh = (dout·dp·γ_ls)@W2ᵀ ⊙ gelu'(h),
  accumulates dy2 = Σ_j dh_j@W1_jᵀ in VMEM and finishes with the LayerNorm
  backward to emit dx; db1/db2/dγ_ln/dβ_ln/dγ_ls accumulate across grid
  programs in constant-index f32 output blocks.
  XLA: dW1 = y2ᵀ@dh and dW2 = gelu(h)ᵀ@(dout·dp·γ_ls) — plain big matmuls
  the MXU already runs at peak; fusing them in-kernel would need ~19 MB of
  f32 accumulators.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT_2 = math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _erf_f32(x):
    """erf via Abramowitz–Stegun 7.1.26 (max abs error 1.5e-7 — far below
    bf16 resolution). Mosaic has no erf lowering; this uses only exp/mul/add.
    """
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    y = 1.0 - ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t * jnp.exp(-ax * ax)
    return jnp.where(x < 0, -y, y)


def _gelu_f32(h):
    return 0.5 * h * (1.0 + _erf_f32(h / _SQRT_2))


def _gelu_grad_f32(h):
    # gelu'(h) = Φ(h) + h·φ(h); the A-S erf polynomial's exp(-x²) at
    # x = h/√2 IS exp(-h²/2) = √(2π)·φ(h) — compute it once for both terms
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    x = h * (1.0 / _SQRT_2)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    e = jnp.exp(-x * x)
    y = 1.0 - ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t * e
    erf = jnp.where(x < 0, -y, y)
    return 0.5 * (1.0 + erf) + h * e * _INV_SQRT_2PI


def _pick_hidden_tile(dh: int) -> int:
    # one tile (nj=1) measured fastest whenever the raised VMEM budget admits
    # it — fewer grid steps, no dy2 re-accumulation passes
    if dh <= 3072:
        return dh
    for ht in (1536, 1024, 768, 512, 384, 256, 128):
        if dh % ht == 0:
            return ht
    return dh


_RESIDENT_BUDGET = 10 * 1024 * 1024  # bf16 W1ᵀ+W2 held in VMEM for the grid


def _hidden_splits(d_model: int, hidden: int) -> int:
    """Number of sequential hidden-dim slices so each call's resident
    weights (W1ᵀ + W2 slices, bf16) fit the VMEM budget. ViT-Ti/S/B need 1;
    ViT-L (2·1024·4096·2 B = 16.8 MB) needs 2; ViT-H needs 4. 0 = no
    feasible plan. Shared by the dispatch gate and the wrapper (one plan)."""
    for ns in (1, 2, 4):
        if hidden % ns:
            continue
        if (
            2 * d_model * (hidden // ns) * 2 <= _RESIDENT_BUDGET
            and _pick_hidden_tile(hidden // ns) <= 3072
        ):
            return ns
    return 0


def _pick_group(b: int, group: int) -> int:
    g = min(group, b)
    while b % g:
        g -= 1
    return g


def _chunk_plan(t: int, d: int, heavy: bool) -> int:
    """THE row re-bin policy — used by both the dispatch gate and the kernel
    wrapper so they can never budget different configurations. Heavy configs
    (extra residual/mlpout streams) OOM VMEM at stage-1 lengths; the light
    config measured FASTER unchunked at T=3136 (+8.5% vs +5.6% swin_t train),
    so it only re-bins when the unchunked f32 row scratch would be large."""
    light = not heavy and t * d * 4 <= 2 * 1024 * 1024
    return _row_chunk(t, target=3136 if light else 512)


def _row_chunk(t: int, target: int = 512) -> int:
    """Smallest k dividing t with t/k <= target (1 if t already fits). The
    whole block is positionwise per token, so rows can be re-binned into
    more, shorter 'images' for free — keeps the kernel's f32 row
    temporaries (LN/GELU chains) inside VMEM at Swin/ConvNeXt stage-1
    lengths (T = 56·56)."""
    if t <= target:
        return 1
    for k in range(2, t + 1):
        if t % k == 0 and t // k <= target:
            return k
    return 1  # prime t > target: caller's gate rejects via t_eff


def _dp_rows(dp_ref, i, g: int, t: int):
    """Per-sample drop-path scales (SMEM (B, 1) array, program i covers
    samples i·G..i·G+G) → (G·T, 1) f32 row scale."""
    rows = [jnp.full((t, 1), dp_ref[i * g + gg, 0], jnp.float32) for gg in range(g)]
    return jnp.concatenate(rows, axis=0) if g > 1 else rows[0]


_SMEM_SPEC = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)


def _ln_f32(x, eps: float):
    """Fast-variance LayerNorm statistics (flax semantics)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(var + eps)
    return (x - mu) * rstd, rstd


def _fwd_kernel(
    x_ref, lns_ref, lnb_ref, w1t_ref, b1_ref, w2_ref, b2_ref, ls_ref, dp_ref,
    *rest,
    nj: int, ht: int, eps: float, has_ls: bool, has_res: bool, save: bool,
):
    if has_res:  # separate residual stream (ConvNeXt: res=x, LN input=dwconv(x))
        res_ref, *rest = rest
    else:
        res_ref = None
    if save:
        out_ref, xhat_ref, rstd_ref, h_ref, *rest = rest
        if has_ls:
            g_ref, mlpout_ref, y2_scr, acc_scr = rest
        else:
            g_ref, y2_scr, acc_scr = rest
    else:  # inference: out is the ONLY HBM output (no backward-save streams)
        out_ref, y2_scr, acc_scr = rest
    i = pl.program_id(0)  # hoisted: program_id inside a pl.when body
    j = pl.program_id(1)  # does not lower in interpret mode
    G, T, D = x_ref.shape
    rows = G * T

    @pl.when(j == 0)
    def _():
        x = x_ref[...].reshape(rows, D).astype(jnp.float32)
        xhat, rstd = _ln_f32(x, eps)
        if save:
            # xhat (bf16) + rstd saved: the backward skips the x stream and
            # the LN-stat recompute; XLA reconstructs y2 = xhat·γ+β for dW1
            xhat_ref[...] = xhat.astype(jnp.bfloat16).reshape(G, T, D)
            rstd_ref[...] = rstd.reshape(G, T, 1)
        y2 = xhat * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
        y2_scr[...] = y2.astype(jnp.bfloat16)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    w1j = w1t_ref[pl.ds(j * ht, ht), :]  # (ht, D) — sublane slice of resident W1ᵀ
    b1j = b1_ref[0]  # (1, ht) — BlockSpec row (j, 0, 0): Mosaic can't prove a
    # dynamic in-kernel sublane index aligned, so the pipeline slices it
    hf = jax.lax.dot_general(
        y2_scr[...], w1j, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) + b1j.astype(jnp.float32)
    hb = hf.astype(jnp.bfloat16)
    g = _gelu_f32(hb.astype(jnp.float32)).astype(jnp.bfloat16)
    if save:
        h_ref[...] = hb.reshape(G, T, ht)
        # saving g costs one bf16 HBM stream but spares the backward an
        # XLA-side gelu recompute for dW2 (erf+exp over B·T·Dh on the VPU)
        g_ref[...] = g.reshape(G, T, ht)
    w2j = w2_ref[pl.ds(j * ht, ht), :]  # (ht, D)
    acc_scr[...] += jnp.dot(g, w2j, preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        mlp = acc_scr[...] + b2_ref[0].astype(jnp.float32)
        if save and has_ls:
            mlpout_ref[...] = mlp.astype(mlpout_ref.dtype).reshape(G, T, D)
        scale = _dp_rows(dp_ref, i, G, T) * ls_ref[0].astype(jnp.float32)
        radd = (res_ref if has_res else x_ref)[...].reshape(rows, D).astype(jnp.float32)
        out_ref[...] = (radd + scale * mlp).astype(out_ref.dtype).reshape(G, T, D)


def _bwd_kernel(
    xhat_ref, rstd_ref, dout_ref, h_ref, w1t_ref, w2_ref, lns_ref, ls_ref, dp_ref, *rest,
    nj: int, ht: int, eps: float, has_ls: bool, has_res: bool,
):
    if has_ls:
        (mlpout_ref, dx_ref, dh_ref, db1_ref, db2_ref, dlns_ref, dlnb_ref,
         dls_ref, douts_scr, dy2_scr) = rest
    else:
        (dx_ref, dh_ref, db1_ref, db2_ref, dlns_ref, dlnb_ref,
         douts_scr, dy2_scr) = rest
    i = pl.program_id(0)
    j = pl.program_id(1)
    G, T, D = xhat_ref.shape
    rows = G * T

    @pl.when((i == 0) & (j == 0))
    def _():
        db1_ref[...] = jnp.zeros_like(db1_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dlns_ref[...] = jnp.zeros_like(dlns_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)
        if has_ls:
            dls_ref[...] = jnp.zeros_like(dls_ref)

    @pl.when(j == 0)
    def _():
        dout = dout_ref[...].reshape(rows, D).astype(jnp.float32)
        dprow = _dp_rows(dp_ref, i, G, T)
        douts = dout * dprow * ls_ref[0].astype(jnp.float32)
        douts_scr[...] = douts.astype(jnp.bfloat16)
        db2_ref[...] += jnp.sum(douts, axis=0, keepdims=True)
        if has_ls:
            mlp = mlpout_ref[...].reshape(rows, D).astype(jnp.float32)
            dls_ref[...] += jnp.sum(dout * dprow * mlp, axis=0, keepdims=True)
        dy2_scr[...] = jnp.zeros_like(dy2_scr)

    hb = h_ref[...].reshape(rows, ht)
    w2j = w2_ref[pl.ds(j * ht, ht), :]  # (ht, D)
    dg = jax.lax.dot_general(
        douts_scr[...], w2j, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (rows, ht)
    dh = dg * _gelu_grad_f32(hb.astype(jnp.float32))
    dhb = dh.astype(jnp.bfloat16)
    dh_ref[...] = dhb.reshape(G, T, ht)
    # masked accumulate into row j of the resident (nj, ht) block — a dynamic
    # sublane store is not provably aligned for Mosaic; nj·ht is tiny
    row = jax.lax.broadcasted_iota(jnp.int32, (nj, ht), 0)
    db1_ref[...] += jnp.where(
        row == j, jnp.broadcast_to(jnp.sum(dh, axis=0, keepdims=True), (nj, ht)), 0.0
    )
    w1j = w1t_ref[pl.ds(j * ht, ht), :]  # (ht, D)
    dy2_scr[...] += jnp.dot(dhb, w1j, preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        dy2 = dy2_scr[...]
        xhat = xhat_ref[...].reshape(rows, D).astype(jnp.float32)
        dlns_ref[...] += jnp.sum(dy2 * xhat, axis=0, keepdims=True)
        dlnb_ref[...] += jnp.sum(dy2, axis=0, keepdims=True)
        dxh = dy2 * lns_ref[0].astype(jnp.float32)
        m1 = jnp.mean(dxh, axis=-1, keepdims=True)
        m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
        dx_ln = rstd_ref[...].reshape(rows, 1) * (dxh - m1 - xhat * m2)
        if has_res:  # residual grad flows through dres (identity, XLA-side)
            dx_ref[...] = dx_ln.astype(dx_ref.dtype).reshape(G, T, D)
        else:
            dout = dout_ref[...].reshape(rows, D).astype(jnp.float32)
            dx_ref[...] = (dout + dx_ln).astype(dx_ref.dtype).reshape(G, T, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14))
def _fused_mlp(x, lns, lnb, w1, b1, w2, b2, ls, dp, res, group, has_ls, has_res,
               interpret, eps):
    # primal body = INFERENCE: custom_vjp only routes through _fused_mlp_fwd
    # under differentiation, so the un-differentiated path runs the save-free
    # kernel — none of the backward-save streams (xhat/rstd/h/gelu ≈ half the
    # kernel's HBM writes) touch HBM at serving time. XLA cannot DCE unused
    # outputs of an opaque kernel, so this must be a separate program.
    return _run_mlp(
        x, lns, lnb, w1, b1, w2, b2, ls, dp, res, group, has_ls, has_res,
        interpret, eps, save=False,
    )[0]


def _common(x, w1, group):
    B, T, D = x.shape
    Dh = w1.shape[1]
    ht = _pick_hidden_tile(Dh)
    nj = Dh // ht
    G = _pick_group(B, group)
    return B, T, D, Dh, ht, nj, G


def _row2(a):
    return a.reshape(1, -1)


def _fused_mlp_fwd(x, lns, lnb, w1, b1, w2, b2, ls, dp, res, group, has_ls, has_res,
                   interpret, eps):
    outs = _run_mlp(x, lns, lnb, w1, b1, w2, b2, ls, dp, res, group, has_ls,
                    has_res, interpret, eps, save=True)
    if has_ls:
        out, xhat, rstd, h, g, mlpout = outs
    else:
        (out, xhat, rstd, h, g), mlpout = outs, None
    return out, (xhat, rstd, h, g, w1, b1, w2, b2, lns, lnb, ls, dp, mlpout)


def _run_mlp(x, lns, lnb, w1, b1, w2, b2, ls, dp, res, group, has_ls, has_res,
             interpret, eps, save):
    B, T, D, Dh, ht, nj, G = _common(x, w1, group)
    w1t = w1.T  # (Dh, D); one-time relayout, negligible vs activation traffic
    out_shapes = [jax.ShapeDtypeStruct((B, T, D), x.dtype)]  # out
    out_specs = [pl.BlockSpec((G, T, D), lambda i, j: (i, 0, 0))]
    if save:
        out_shapes += [
            jax.ShapeDtypeStruct((B, T, D), jnp.bfloat16),  # xhat (LN bwd + y2)
            jax.ShapeDtypeStruct((B, T, 1), jnp.float32),  # rstd
            jax.ShapeDtypeStruct((B, T, Dh), jnp.bfloat16),  # h (saved for bwd)
            jax.ShapeDtypeStruct((B, T, Dh), jnp.bfloat16),  # gelu(h) (for dW2)
        ]
        out_specs += [
            pl.BlockSpec((G, T, D), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((G, T, 1), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((G, T, ht), lambda i, j: (i, 0, j)),
            pl.BlockSpec((G, T, ht), lambda i, j: (i, 0, j)),
        ]
        if has_ls:
            out_shapes.append(jax.ShapeDtypeStruct((B, T, D), jnp.bfloat16))  # mlpout
            out_specs.append(pl.BlockSpec((G, T, D), lambda i, j: (i, 0, 0)))
    in_specs = [
        pl.BlockSpec((G, T, D), lambda i, j: (i, 0, 0)),  # x
        pl.BlockSpec((1, D), lambda i, j: (0, 0)),  # ln scale
        pl.BlockSpec((1, D), lambda i, j: (0, 0)),  # ln bias
        pl.BlockSpec((Dh, D), lambda i, j: (0, 0)),  # W1ᵀ (resident)
        pl.BlockSpec((1, 1, ht), lambda i, j: (j, 0, 0)),  # b1 row for tile j
        pl.BlockSpec((Dh, D), lambda i, j: (0, 0)),  # W2 (resident)
        pl.BlockSpec((1, D), lambda i, j: (0, 0)),  # b2
        pl.BlockSpec((1, D), lambda i, j: (0, 0)),  # layer-scale γ (ones if absent)
        _SMEM_SPEC(),  # drop-path scale (SMEM, whole array)
    ]
    operands = [x, _row2(lns), _row2(lnb), w1t, b1.reshape(nj, 1, ht), w2,
                _row2(b2), _row2(ls), dp]
    if has_res:
        in_specs.append(pl.BlockSpec((G, T, D), lambda i, j: (i, 0, 0)))  # residual
        operands.append(res)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, nj=nj, ht=ht, eps=eps, has_ls=has_ls,
                          has_res=has_res, save=save),
        grid=(B // G, nj),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((G * T, D), jnp.bfloat16),  # y2
            pltpu.VMEM((G * T, D), jnp.float32),  # W2 output accumulator
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=24 * 1024 * 1024),
        interpret=interpret,
    )(*operands)


def _fused_mlp_bwd(group, has_ls, has_res, interpret, eps, saved, dout):
    xhat, rstd, h, g, w1, b1, w2, b2, lns, lnb, ls, dp, mlpout = saved
    B, T, D, Dh, ht, nj, G = _common(xhat, w1, group)
    w1t = w1.T
    out_shapes = [
        jax.ShapeDtypeStruct((B, T, D), dout.dtype),  # dx
        jax.ShapeDtypeStruct((B, T, Dh), jnp.bfloat16),  # dh (for dW1)
        jax.ShapeDtypeStruct((nj, ht), jnp.float32),  # db1
        jax.ShapeDtypeStruct((1, D), jnp.float32),  # db2
        jax.ShapeDtypeStruct((1, D), jnp.float32),  # dγ_ln
        jax.ShapeDtypeStruct((1, D), jnp.float32),  # dβ_ln
    ]
    const_spec = pl.BlockSpec((1, D), lambda i, j: (0, 0))
    out_specs = [
        pl.BlockSpec((G, T, D), lambda i, j: (i, 0, 0)),
        pl.BlockSpec((G, T, ht), lambda i, j: (i, 0, j)),
        pl.BlockSpec((nj, ht), lambda i, j: (0, 0)),
        const_spec,
        const_spec,
        const_spec,
    ]
    if has_ls:
        out_shapes.append(jax.ShapeDtypeStruct((1, D), jnp.float32))  # dγ_ls
        out_specs.append(const_spec)
    in_specs = [
        pl.BlockSpec((G, T, D), lambda i, j: (i, 0, 0)),  # xhat
        pl.BlockSpec((G, T, 1), lambda i, j: (i, 0, 0)),  # rstd
        pl.BlockSpec((G, T, D), lambda i, j: (i, 0, 0)),  # dout
        pl.BlockSpec((G, T, ht), lambda i, j: (i, 0, j)),  # h
        pl.BlockSpec((Dh, D), lambda i, j: (0, 0)),  # W1ᵀ
        pl.BlockSpec((Dh, D), lambda i, j: (0, 0)),  # W2
        const_spec,  # ln scale
        const_spec,  # layer-scale
        _SMEM_SPEC(),  # drop-path (SMEM, whole array)
    ]
    operands = [xhat, rstd, dout, h, w1t, w2, _row2(lns), _row2(ls), dp]
    if has_ls:
        in_specs.append(pl.BlockSpec((G, T, D), lambda i, j: (i, 0, 0)))
        operands.append(mlpout)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, nj=nj, ht=ht, eps=eps, has_ls=has_ls,
                          has_res=has_res),
        grid=(B // G, nj),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((G * T, D), jnp.bfloat16),  # dout·dp·γ_ls
            pltpu.VMEM((G * T, D), jnp.float32),  # dy2 accumulator
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=24 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    if has_ls:
        dx, dh, db1, db2, dlns, dlnb, dls = outs
    else:
        (dx, dh, db1, db2, dlns, dlnb), dls = outs, None

    # weight grads: two big MXU matmuls over the saved activations (exactly
    # what XLA's autodiff runs — no recompute, no extra traffic); y2 is
    # reconstructed from xhat (elementwise, fused into the matmul input)
    rows = B * T
    y2 = (xhat.astype(jnp.float32) * lns.astype(jnp.float32) + lnb.astype(jnp.float32)) \
        .astype(jnp.bfloat16)
    dw1 = jax.lax.dot_general(
        y2.reshape(rows, D), dh.reshape(rows, Dh),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(w1.dtype)
    douts = (dout * (dp[:, None, :] * ls).astype(dout.dtype)).reshape(rows, D)
    dw2 = jax.lax.dot_general(
        g.reshape(rows, Dh), douts, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w2.dtype)

    to = lambda a, ref: a.astype(ref.dtype)
    return (
        dx,
        to(dlns[0], lns),
        to(dlnb[0], lns),
        dw1,
        to(db1.reshape(Dh), b1),  # bias cotangent in the BIAS's dtype — the
        # weights were bf16-cast on entry, the biases were not (f32 callers
        # must get f32 bias grads back)
        dw2,
        to(db2[0], b2),
        to(dls[0], ls) if has_ls else jnp.zeros_like(ls),
        jnp.zeros_like(dp),
        # separate residual: identity path, cotangent = dout. has_res=False
        # callers alias res=x, so a structural zero keeps d(x) = dx exactly.
        dout if has_res else jnp.zeros_like(dout),
    )


_fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


def fused_mlp_block(
    x: jax.Array,
    ln_scale: jax.Array,
    ln_bias: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    ls_gamma: jax.Array | None = None,
    dp_scale: jax.Array | None = None,
    *,
    residual: jax.Array | None = None,
    eps: float = 1e-6,
    group: int = 1,
    interpret: bool | None = None,
) -> jax.Array:
    """``r + dp·γ_ls·(gelu(LN(x)@W1+b1)@W2+b2)`` as one fused Pallas program,
    where ``r`` is ``residual`` if given (ConvNeXt: the block input ahead of
    the dwconv) else ``x`` itself (transformer MLP half-block).

    x: (B, T, D); w1: (D, Dh); w2: (Dh, D); dp_scale: (B, 1) per-sample
    drop-path scale (mask/keep_p), ones if None. Exact-erf GELU, fast-variance
    LayerNorm (flax semantics)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if _FORCED_GROUP is not None:
        group = _FORCED_GROUP
    has_ls = ls_gamma is not None
    has_res = residual is not None
    ls = ls_gamma if has_ls else jnp.ones((x.shape[-1],), jnp.float32)
    dp = dp_scale if dp_scale is not None else jnp.ones((x.shape[0], 1), jnp.float32)
    res = residual if has_res else x

    B, T, D = x.shape
    Dh = w1.shape[1]
    ns = _hidden_splits(D, Dh)
    if ns == 0:
        # keep the gate and the wrapper on ONE plan: shapes the planner
        # rejected must not reach the kernel (a 10+ MB-over-budget resident
        # block dies inside Mosaic with an opaque VMEM error)
        raise ValueError(
            f"fused_mlp_block: no feasible hidden-split plan for d_model={D}, "
            f"hidden={Dh} (resident weights exceed the VMEM budget at every "
            f"supported split); gate calls with use_fused_mlp()"
        )
    k = _chunk_plan(T, D, heavy=has_res or has_ls or ns > 1)
    if k > 1:  # re-bin long rows (free reshape — the op is positionwise)
        x = x.reshape(B * k, T // k, D)
        res = res.reshape(B * k, T // k, D)
        dp = jnp.repeat(dp, k, axis=0)

    # bf16 weights: the kernel's matmuls are bf16×bf16 (VMEM budget counts
    # bf16); autodiff of the cast upcasts f32 callers' weight cotangents
    b16 = lambda a: a.astype(jnp.bfloat16)
    if ns == 1:
        out = _fused_mlp(
            x, ln_scale, ln_bias, b16(w1), b1, b16(w2), b2, ls, dp, res,
            group, has_ls, has_res, interpret, float(eps),
        )
    else:
        # hidden-split chain (ViT-L/H class — resident weights exceed the
        # VMEM budget at full width): mlp(x) = Σ_s gelu(LN(x)@W1_s+b1_s)@W2_s
        # (+ b2 once), so each slice runs the SAME kernel with the running
        # partial as its separate-residual operand. The LN is recomputed per
        # slice (VPU-free); each extra slice costs one extra (B,T,D) stream
        # of x in and xhat/rstd out. Gradients compose exactly: d(x) sums the
        # per-slice LN cotangents plus dout via the residual chain; dβ2 lands
        # on slice 0 only (the zeros_like(b2) operands are non-differentiable).
        c = Dh // ns
        cur = res
        for s in range(ns):
            sl = slice(s * c, (s + 1) * c)
            cur = _fused_mlp(
                x, ln_scale, ln_bias, b16(w1[:, sl]), b1[sl], b16(w2[sl]),
                b2 if s == 0 else jnp.zeros_like(b2), ls, dp, cur,
                group, has_ls, True, interpret, float(eps),
            )
        out = cur
    return out.reshape(B, T, D) if k > 1 else out


# Dispatch: resident-weight budget (both weight matrices live in VMEM for the
# whole grid) + row bound for the f32 (G·T, D) scratches. ViT-Ti/S/B, DeiT,
# DeiT3-S/B fit in one call; ViT-L/H route through the hidden-split chain
# when _ALLOW_HIDDEN_SPLIT is on (pending its TPU A/B — round4_tpu_queue.sh).
_FORCE_ON = False  # tests set this to exercise the module dispatch on CPU
_DISABLE = False  # measurement scripts set this for in-model A/B brackets
_FORCED_GROUP: int | None = None  # measurement override for the group sweep
_ALLOW_HIDDEN_SPLIT = True  # measured positive on chip (round 4, v5e):
# scripts/measure_block_kernels.py --models vit_l_16, bs32@224 in-model
# A/B/A — mlp-only arm 126.7 → 98.2 ms/step (+29.1%); combined with the
# attention head-split chain the both-arm hits +31.1% train / +20% infer.


def use_fused_mlp(d_model: int, hidden: int, t: int, dropout: float,
                  has_res: bool = False, has_ls: bool = False) -> bool:
    if _DISABLE:
        return False
    ns = _hidden_splits(d_model, hidden)  # shared plan with the wrapper
    if ns == 0 or (ns > 1 and not _ALLOW_HIDDEN_SPLIT):
        return False
    ht = _pick_hidden_tile(hidden // ns)
    # budget exactly the configuration the kernel will run (shared plan)
    t_eff = t // _chunk_plan(t, d_model, heavy=has_res or has_ls or ns > 1)
    ok = (
        dropout == 0.0
        # lane dim: multiples of 32 lower fine (Mosaic pads to 128 lanes —
        # same padding XLA pays on these channel counts anyway); covers the
        # Swin/ConvNeXt stage widths 96/192 as well as transformer 384+
        and d_model % 32 == 0
        and t_eff * d_model * 4 <= 2 * 1024 * 1024  # f32 row scratches
        and t_eff * ht * 4 <= 8 * 1024 * 1024  # f32 GELU temps
    )
    return ok and (_FORCE_ON or jax.default_backend() == "tpu")
