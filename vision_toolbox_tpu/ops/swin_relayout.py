"""Fused shifted-window relayout — Pallas TPU kernels.

Swin's shifted blocks move the whole feature map through HBM three times on
the way INTO attention (roll rows → roll cols → window-partition transpose,
each a materialized copy in XLA) and three times back out (ref
swin.py:73-86; our models/swin.py WindowAttention). The compiled-HLO byte
audit (scripts/analyze_swin_bytes.py) shows these relayout copies are ~10%
of swin_t's materialized write bytes. Each kernel here does the roll AND the
(un)partition in ONE read + ONE write: the image lives in VMEM (≤602 KB at
the largest stage), the cyclic shift is two VMEM concats, and the window
gather/scatter is an unrolled set of static slices — pure data movement, no
compute.

Both directions are permutations, so the VJPs are exactly each other:
d(partition) = unpartition, d(unpartition) = partition (same window/shift).

Dispatch is OFF by default until an in-model A/B on the real chip records a
win (repo rule: standalone op timings on this tunnel mislead — CLAUDE.md);
scripts/round4_tpu_queue.sh carries the measurement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _roll2(img, s: int):
    """Cyclic shift by (-s, -s) on (H, W, C) — two VMEM concats."""
    if s == 0:
        return img
    img = jnp.concatenate([img[s:], img[:s]], axis=0)
    return jnp.concatenate([img[:, s:], img[:, :s]], axis=1)


def _unroll2(img, s: int):
    """Inverse cyclic shift (+s, +s)."""
    if s == 0:
        return img
    img = jnp.concatenate([img[-s:], img[:-s]], axis=0)
    return jnp.concatenate([img[:, -s:], img[:, :-s]], axis=1)


def _partition_kernel(x_ref, out_ref, *, w: int, shift: int):
    # Mosaic cannot shape-cast (w, w, C) -> (w*w, C) when w is not a sublane
    # multiple (measured: "infer-vector-layout: unsupported shape cast" at
    # w=7); instead each window ROW is written as a strided (w, C) slice of
    # the flattened-token axis — token r*w+col of window (ih, iw) is image
    # pixel (ih*w+r, iw*w+col), so rows r*w:(r+1)*w come from one image row.
    _, H, W, C = x_ref.shape
    nH, nW = H // w, W // w
    img = _roll2(x_ref[0], shift)
    for ih in range(nH):
        band = img[ih * w:(ih + 1) * w]  # (w, W, C)
        for iw in range(nW):
            for r in range(w):
                out_ref[0, ih * nW + iw, r * w:(r + 1) * w] = band[
                    r, iw * w:(iw + 1) * w, :
                ]


def _unpartition_kernel(y_ref, out_ref, *, w: int, shift: int, nH: int, nW: int):
    _, _, _, C = y_ref.shape
    rows = []
    for ih in range(nH):
        row_blocks = []
        for iw in range(nW):
            win = y_ref[0, ih * nW + iw]  # (w*w, C)
            row_blocks.append(jnp.stack(
                [win[r * w:(r + 1) * w] for r in range(w)], axis=0
            ))  # (w, w, C) rebuilt by slices, not shape cast
        rows.append(jnp.concatenate(row_blocks, axis=1))
    out_ref[0] = _unroll2(jnp.concatenate(rows, axis=0), shift)


def _part_call(x, w: int, shift: int, interpret: bool):
    B, H, W, C = x.shape
    nHW = (H // w) * (W // w)
    return pl.pallas_call(
        functools.partial(_partition_kernel, w=w, shift=shift),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, nHW, w * w, C), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, nHW, w * w, C), x.dtype),
        interpret=interpret,
    )(x)


def _unpart_call(y, w: int, shift: int, H: int, W: int, interpret: bool):
    B, nHW, _, C = y.shape
    nH, nW = H // w, W // w
    return pl.pallas_call(
        functools.partial(_unpartition_kernel, w=w, shift=shift, nH=nH, nW=nW),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, nHW, w * w, C), lambda b: (b, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), y.dtype),
        interpret=interpret,
    )(y)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def shifted_window_partition(x, w: int, shift: int, interpret: bool = False):
    """(B, H, W, C) → (B, nW, w², C), equal to
    ``window_partition(jnp.roll(x, (-shift, -shift), (1, 2)), w)`` in one
    read + one write."""
    return _part_call(x, w, shift, interpret)


def _part_fwd(x, w, shift, interpret):
    return _part_call(x, w, shift, interpret), x.shape


def _part_bwd(w, shift, interpret, shape, dy):
    _, H, W, _ = shape
    return (_unpart_call(dy, w, shift, H, W, interpret),)


shifted_window_partition.defvjp(_part_fwd, _part_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def shifted_window_unpartition(y, w: int, shift: int, H: int, W: int,
                               interpret: bool = False):
    """(B, nW, w², C) → (B, H, W, C), equal to
    ``jnp.roll(window_unpartition(y, w, nH, nW), (shift, shift), (1, 2))``
    in one read + one write."""
    return _unpart_call(y, w, shift, H, W, interpret)


def _unpart_fwd(y, w, shift, H, W, interpret):
    return _unpart_call(y, w, shift, H, W, interpret), None


def _unpart_bwd(w, shift, H, W, interpret, _, dx):
    return (_part_call(dx, w, shift, interpret),)


shifted_window_unpartition.defvjp(_unpart_fwd, _unpart_bwd)


# OFF: measured NEUTRAL in-model (round 4, v5e, scripts/measure_swin_relayout
# .py): swin_t train 122.21 -> 122.33 ms (-0.1%), infer 43.61 -> 44.08 ms.
# The fused roll+partition saves two of XLA's three relayout copies, but the
# per-window-row strided writes (w=7 misaligned to the 8-sublane tile ->
# read-modify-write) cost that saving back; relayouts are only ~3% of step
# bytes (analyze_swin_bytes.py), so there was never more than that to win.
# Kernels kept exact + gradient-tested as the record.
_ENABLED = False
_FORCE_ON = False


def use_swin_relayout(shift: int) -> bool:
    if shift <= 0:
        return False
    if _FORCE_ON:
        return True
    return _ENABLED and jax.default_backend() == "tpu"
