"""Pallas TPU depthwise k×k convolution (stride 1, SAME padding).

Why: XLA's TPU lowering of ``feature_group_count=C`` convs is pathological —
measured (round 3, /tmp roofline diagnosis, v5e bs128): a 7×7 depthwise fwd
costs ~4.3-5.9 ms at EVERY ConvNeXt-T stage shape, 22-110× its HBM byte
floor, nearly independent of tensor size — i.e. it is lowering/serialization
overhead, not bandwidth. ConvNeXt-T has 18 of them (93.8 ms train step, 54%
of roofline); PatchConvNet and the MBConv families carry the same op.

Design: a depthwise conv is k² shifted multiply-accumulates — pure VPU work
with zero MXU involvement. One grid program holds a group of padded images
(one channel block) in VMEM and accumulates the k² static-slice MACs in f32.
Grid is (channel_blocks, batch_groups) with batch fastest, so the backward's
weight-gradient block stays VMEM-resident across the whole batch and
accumulates exactly (sequential TPU grid). HBM traffic is x (+pad) in, y
out — the byte floor.

Layout/param compatibility: weights stay in flax ``nn.Conv`` HWIO depthwise
shape (k, k, 1, C); module-level integration (nn/layers.py DepthwiseConv)
keeps the param tree identical to the nn.Conv it replaces.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# v5e scoped VMEM is 16 MB; budget per-program by the number of live
# padded-image-sized buffers (ref blocks + scratch + one slice temp)
_VMEM_LIMIT = 12 * 1024 * 1024


def _pick_blocks(B: int, C: int, Hp: int, Wp: int, n_bufs: int) -> tuple[int, int]:
    # Mosaic: lane block must be a multiple of 128 or the full channel dim
    cb = 128 if C % 128 == 0 else C
    per_img = Hp * Wp * cb * 4 * n_bufs
    gb = max(1, min(B, _VMEM_LIMIT // max(per_img, 1)))
    while B % gb:
        gb -= 1
    return gb, cb


def _fwd_kernel(x_ref, w_ref, o_ref, acc_ref, *, k: int, H: int, W: int):
    # accumulate through the VMEM scratch: each tap's slice-MAC is a separate
    # read-modify-write, so only ONE slice temp is live at a time (a pure
    # functional chain kept all k² temps on the Mosaic stack → VMEM OOM)
    for g in range(x_ref.shape[0]):
        acc_ref[...] = jnp.zeros_like(acc_ref)
        for dy in range(k):
            for dx in range(k):
                acc_ref[...] += (
                    x_ref[g, dy : dy + H, dx : dx + W, :].astype(jnp.float32)
                    * w_ref[dy, dx, 0, :].astype(jnp.float32)
                )
        o_ref[g] = acc_ref[...].astype(o_ref.dtype)


def _bwd_kernel(xp_ref, gp_ref, w_ref, dx_ref, dw_ref, acc_ref, *, k: int, H: int, W: int):
    p = k // 2
    ib = pl.program_id(1)  # batch-group index (fastest grid dim)

    @pl.when(ib == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    for gi in range(xp_ref.shape[0]):
        # dx = full correlation of g with the flipped kernel
        acc_ref[...] = jnp.zeros_like(acc_ref)
        for dy in range(k):
            for dx in range(k):
                acc_ref[...] += (
                    gp_ref[gi, dy : dy + H, dx : dx + W, :].astype(jnp.float32)
                    * w_ref[k - 1 - dy, k - 1 - dx, 0, :].astype(jnp.float32)
                )
        dx_ref[gi] = acc_ref[...].astype(dx_ref.dtype)
        # dw[dy,dx,c] = sum_{h,w} xpad[h+dy, w+dx, c] * g[h, w, c]
        for dy in range(k):
            for dx in range(k):
                prod = xp_ref[gi, dy : dy + H, dx : dx + W, :].astype(
                    jnp.float32
                ) * gp_ref[gi, p : p + H, p : p + W, :].astype(jnp.float32)
                dw_ref[dy * k + dx, :] += jnp.sum(prod, axis=(0, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dw_conv(x, w, interpret: bool):
    out, _ = _dw_fwd(x, w, interpret)
    return out


def _dw_fwd(x, w, interpret: bool):
    B, H, W, C = x.shape
    k = w.shape[0]
    p = k // 2
    gb, cb = _pick_blocks(B, C, H + 2 * p, W + 2 * p, n_bufs=4)
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, k=k, H=H, W=W),
        grid=(C // cb, B // gb),
        in_specs=[
            pl.BlockSpec((gb, H + 2 * p, W + 2 * p, cb), lambda c, b: (b, 0, 0, c)),
            pl.BlockSpec((k, k, 1, cb), lambda c, b: (0, 0, 0, c)),
        ],
        out_specs=pl.BlockSpec((gb, H, W, cb), lambda c, b: (b, 0, 0, c)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((H, W, cb), jnp.float32)],
        interpret=interpret,
    )(xp, w)
    return out, (x, w)


def _dw_bwd(interpret: bool, res, g):
    x, w = res
    B, H, W, C = x.shape
    k = w.shape[0]
    p = k // 2
    gb, cb = _pick_blocks(B, C, H + 2 * p, W + 2 * p, n_bufs=5)
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    gp = jnp.pad(g, ((0, 0), (p, p), (p, p), (0, 0)))
    dx, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k, H=H, W=W),
        grid=(C // cb, B // gb),
        in_specs=[
            pl.BlockSpec((gb, H + 2 * p, W + 2 * p, cb), lambda c, b: (b, 0, 0, c)),
            pl.BlockSpec((gb, H + 2 * p, W + 2 * p, cb), lambda c, b: (b, 0, 0, c)),
            pl.BlockSpec((k, k, 1, cb), lambda c, b: (0, 0, 0, c)),
        ],
        out_specs=(
            pl.BlockSpec((gb, H, W, cb), lambda c, b: (b, 0, 0, c)),
            pl.BlockSpec((k * k, cb), lambda c, b: (0, c)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
            jax.ShapeDtypeStruct((k * k, C), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((H, W, cb), jnp.float32)],
        interpret=interpret,
    )(xp, gp, w)
    return dx, dw.reshape(k, k, 1, C).astype(w.dtype)


_dw_conv.defvjp(_dw_fwd, _dw_bwd)


def depthwise_conv2d(x: jax.Array, w: jax.Array, interpret: bool | None = None) -> jax.Array:
    """Depthwise conv, NHWC × (k, k, 1, C) HWIO, stride 1, SAME (odd k)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _dw_conv(x, w, interpret)


def use_depthwise_kernel(k: int, stride: int, dilation: int, h: int, w: int) -> bool:
    """Dispatch: DISABLED — measured NEGATIVE (round 3, v5e, A/B/A).

    convnext_t bs128@224: train 179.8 ms/step with this kernel vs 93.7 on
    XLA (1.9× slower); infer 123.6 vs 68.3 ms. The motivating diagnosis
    (standalone dwconv ~5 ms at every stage shape) was dispatch-floor
    artifact: inside the jitted model XLA pipelines grouped convs across the
    batch and fuses the surrounding elementwise chain, while this kernel's
    serialized per-tap VMEM read-modify-write and fusion break cost more
    than the lowering it replaces. Kept (with gradient tests) as the
    negative-result record; flip here to re-evaluate on future
    hardware/Mosaic versions."""
    return False
