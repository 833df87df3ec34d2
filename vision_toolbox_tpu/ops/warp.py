"""TPU-fast affine warp for TrivialAugment's geometric ops.

The naive formulation (4 bilinear-tap gathers with per-pixel indices,
ops/trivial_augment.py:_affine_warp) measures ~650 ms for bs256@176 on a v5e
chip — per-element gathers don't vectorize on the VPU. This module replaces
it with a **three-shear decomposition**: every geometric op in the TA set
(identity / shear X/Y / translate X/Y / rotate) factors into at most three
1-D shear passes,

    R(-θ) = ShX(tan θ/2) · ShY(-sin θ) · ShX(tan θ/2)

and a 1-D shear pass only ever resamples *along one axis with a per-row
shift* — no 2-D gather. Rotations are first reduced to |θ'| ≤ 45° by a
quarter-turn pre-pass (transpose + flip), which bounds every shear factor by
tan(22.5°) ≈ 0.414 and keeps the intermediate canvas small.

Two implementations with identical semantics:
  * ``shear3_warp_xla`` — per-(image,row) ``dynamic_slice`` from a padded
    canvas (XLA lowers this to a gather of long contiguous rows — bandwidth
    bound, works everywhere incl. CPU tests).
  * ``shear3_warp_pallas`` (ops/warp_pallas.py) — canvas lives in VMEM for
    all three passes; variable per-row shifts via a lane barrel shifter.

Both match the reference semantics (torchvision F.affine bilinear, zero
fill): shear/translate are exactly 1-D resamples, so they equal the 2-D
bilinear result; rotation differs only by the 3-pass interpolation (~1-2
greylevels median, well inside the PIL-oracle tolerance used in tests).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .trivial_augment import (
    OP_ROTATE,
    OP_SHEAR_X,
    OP_SHEAR_Y,
    OP_TRANSLATE_X,
    OP_TRANSLATE_Y,
)

# Padding of the working canvas on each side. Intermediate shear passes of a
# 45° rotation push content up to ~114 px outside the frame before the later
# passes bring it back; 128 covers it (see derivation in the PR notes).
CANVAS_PAD = 128


def shear3_params(op: jax.Array, mag: jax.Array):
    """Per-sample shear program (k90, p1, t1, p2, t2, p3) for the inverse
    warp ``src = S1(p1,t1) · S2(p2,t2) · S3(p3) · out`` (center-relative).

    Magnitude conventions match trivial_augment._affine_matrices: ``mag`` is
    the signed magnitude in [-1, 1]; shear ±0.99, translate ±32 px (rounded),
    rotate ±135°.
    """
    shear = mag * 0.99
    t = jnp.round(mag * 32.0)
    theta = mag * (135.0 * math.pi / 180.0)
    is_rot = op == OP_ROTATE
    # quarter-turn reduction: θ = 90°·k + θ', |θ'| ≤ 45°
    k90 = jnp.where(is_rot, jnp.clip(jnp.round(theta / (math.pi / 2)), -1, 1), 0.0)
    tp = theta - k90 * (math.pi / 2)

    zeros = jnp.zeros_like(mag)
    p1 = jnp.where(is_rot, jnp.tan(tp / 2), jnp.where(op == OP_SHEAR_X, -shear, zeros))
    p2 = jnp.where(is_rot, -jnp.sin(tp), jnp.where(op == OP_SHEAR_Y, -shear, zeros))
    p3 = jnp.where(is_rot, jnp.tan(tp / 2), zeros)
    t1 = jnp.where(op == OP_TRANSLATE_X, -t, zeros)
    t2 = jnp.where(op == OP_TRANSLATE_Y, -t, zeros)
    return k90.astype(jnp.int32), p1, t1, p2, t2, p3


def _quarter_turn(canvas: jax.Array, k90: jax.Array) -> jax.Array:
    """Apply the per-sample quarter turn on a square canvas.
    k=+1: img1[y,x] = in[x, S-1-y]; k=-1: img1[y,x] = in[S-1-x, y]."""
    T = jnp.swapaxes(canvas, 1, 2)
    sel = k90[:, None, None, None]
    return jnp.where(
        sel == 1, jnp.flip(T, axis=2), jnp.where(sel == -1, jnp.flip(T, axis=1), canvas)
    )


def _xpass_slice(cv: jax.Array, delta: jax.Array) -> jax.Array:
    """One 1-D shear pass along axis 2: out[b,y,x] = in[b,y,x+delta[b,y]]
    with bilinear (2-tap) interpolation and zero fill, via per-row
    dynamic_slice from a zero-padded row (long contiguous gathers)."""
    B, S, W, C = cv.shape
    k = jnp.floor(delta)
    f = (delta - k)[..., None, None].astype(cv.dtype)
    # |shift| >= W produces all zeros either way, so clamping is lossless
    start = (jnp.clip(k, -W, W) + W).astype(jnp.int32)  # in [0, 2W]
    padded = jnp.pad(cv, ((0, 0), (0, 0), (W, W + 1), (0, 0)))

    def row(r, s):  # r: (3W+1, C)
        return jax.lax.dynamic_slice(r, (s, 0), (W + 1, C))

    rows = jax.vmap(jax.vmap(row))(padded, start)  # (B, S, W+1, C)
    return rows[:, :, :-1, :] * (1.0 - f) + rows[:, :, 1:, :] * f


def shear3_warp_xla(images: jax.Array, op: jax.Array, mag: jax.Array) -> jax.Array:
    """Three-shear affine warp, pure XLA. ``images`` is NHWC with H == W."""
    B, H, W, C = images.shape
    assert H == W, "shear3 warp expects square images (TA runs on square crops)"
    P = CANVAS_PAD
    S = H + 2 * P
    k90, p1, t1, p2, t2, p3 = shear3_params(op, mag)

    canvas = jnp.pad(images, ((0, 0), (P, P), (P, P), (0, 0)))
    canvas = _quarter_turn(canvas, k90)

    ys = (jnp.arange(S, dtype=jnp.float32) - (S - 1) / 2.0)[None, :]  # center-relative
    canvas = _xpass_slice(canvas, p1[:, None] * ys + t1[:, None])
    canvas = jnp.swapaxes(canvas, 1, 2)
    canvas = _xpass_slice(canvas, p2[:, None] * ys + t2[:, None])
    canvas = jnp.swapaxes(canvas, 1, 2)
    canvas = _xpass_slice(canvas, p3[:, None] * ys)
    return canvas[:, P : P + H, P : P + W, :]


def affine_warp(images: jax.Array, op: jax.Array, mag: jax.Array) -> jax.Array:
    """Dispatching affine warp: Pallas kernel on TPU (4.4 ms vs 650 ms for
    the gather formulation at bs256@176 on v5e), exact 2-D bilinear gather
    elsewhere (CPU tests; XLA gathers scalarize on TPU only)."""
    if jax.default_backend() == "tpu" and images.shape[1] == images.shape[2]:
        from .warp_pallas import shear3_warp_pallas

        return shear3_warp_pallas(images, op, mag)
    from .trivial_augment import _affine_warp

    return _affine_warp(images, op, mag)
