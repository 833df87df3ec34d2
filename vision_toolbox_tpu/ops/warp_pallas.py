"""Pallas TPU kernel for the three-shear affine warp (see ops/warp.py).

Design: one grid program per (image, channel). The padded square canvas
(S×S, S a power of two) lives in a VMEM scratch buffer for the whole warp, so
HBM traffic is exactly one image read + one image write. Each 1-D shear pass
applies a per-row variable shift with a **lane barrel shifter**: log2(S)
static rolls (concat of two static lane slices — VPU-friendly, no gathers),
each kept per-row via a select on the shift's bit, then a 2-tap fractional
blend and a wrap-validity mask. Rotations arrive quarter-turn-reduced
(|θ'| ≤ 45°, ops/warp.py:shear3_params), so shear factors stay ≤ tan 22.5°.

Per-image pass skipping: most TrivialAugment draws are pixel ops (identity
warp), so each pass (and the quarter turn) is wrapped in @pl.when on scalars
prefetched to SMEM — the expected cost is ~0.7 passes/image instead of 3.
The per-row shift vectors are built in-kernel from the prefetched (p, t)
shear coefficients (δ(y) = p·(y − c) + t) — nothing but the image crosses
HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .warp import shear3_params


def canvas_size(h: int) -> int:
    """Smallest power of two ≥ h + 2·(intermediate excursion bound).

    A 45° rotation's shear passes push content up to ~0.65·h outside the
    frame before later passes bring it back (pad ≥ 114 for h=176)."""
    need = h + 2 * (int(0.65 * h) + 2)
    s = 128
    while s < need:
        s *= 2
    return s


def _pass2_slab(S: int, P: int, H: int, W: int) -> tuple[int, int]:
    """Row range (in transposed space = canvas columns) pass 2 must process.

    Only canvas columns that pass 3 / the final crop can read matter: the
    crop reads cols [P, P+W); pass 3 (x-shear, |p3| ≤ tan 22.5° over output
    rows |y−c| ≤ (H+1)/2) reaches ±(tan22.5°·(H+1)/2 + 2) further."""
    reach = int(0.4143 * (H + 1) / 2) + 3
    lo = max(0, (P - reach) // 8 * 8)
    hi = min(S, -((P + W + reach) // -8) * 8)
    return lo, hi


def _roll_lanes(a: jax.Array, s: int, size: int) -> jax.Array:
    """roll(a, s)[.., x] = a[.., (x - s) % size] via two static lane slices."""
    return jnp.concatenate([a[:, size - s :], a[:, : size - s]], axis=1)


def _shear_pass(a: jax.Array, p, t, S: int, row0: int = 0) -> jax.Array:
    """out[y, x] = bilinear( a[y, x + p·(y+row0−c) + t] ), zero outside [0, S).

    ``a`` may be a row slab of the canvas starting at canvas row ``row0``;
    lanes always span the full canvas width S."""
    R = a.shape[0]
    ys = (
        jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0).astype(jnp.float32)
        + row0
        - (S - 1) / 2.0
    )
    delta = p * ys + t  # (R, 1)
    k = jnp.floor(delta)
    f = (delta - k).astype(a.dtype)
    ki = k.astype(jnp.int32)
    kneg = (-ki) % S
    bit = 1
    while bit < S:
        a = jnp.where((kneg & bit) != 0, _roll_lanes(a, bit, S), a)
        bit *= 2
    a2 = _roll_lanes(a, S - 1, S)  # second tap: src + 1
    xs = jax.lax.broadcasted_iota(jnp.int32, (R, S), 1)
    src = xs + ki
    tap1 = jnp.where((src >= 0) & (src < S), a, 0.0)
    tap2 = jnp.where((src + 1 >= 0) & (src + 1 < S), a2, 0.0)
    return tap1 * (1.0 - f) + tap2 * f


def _warp_kernel(flags_ref, coef_ref, x_ref, out_ref, cv, *, S, P, H, W):
    b = pl.program_id(0)
    k90 = flags_ref[b, 0]

    cv[:] = jnp.zeros((S, S), x_ref.dtype)
    cv[P : P + H, P : P + W] = x_ref[0, 0]

    @pl.when(k90 != 0)
    def _():
        # Mosaic has no `rev`; flip = matmul with the reversal permutation
        # matrix J (exact for 0/1 matrices, MXU, rotate-images only).
        t = cv[:].T
        ii = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        rev = ((ii + jj) == S - 1).astype(t.dtype)
        flip1 = jnp.dot(t, rev, preferred_element_type=jnp.float32)  # flip axis 1
        flip0 = jnp.dot(rev, t, preferred_element_type=jnp.float32)  # flip axis 0
        cv[:] = jnp.where(k90 == 1, flip1, flip0)

    # Slab trimming: each 1-D pass only processes the canvas rows that can
    # still influence the final [P, P+H) crop — pass 1 and 3 touch only the
    # content/output rows [P, P+H); pass 2 (canvas columns, via transpose)
    # only the columns within pass 3's shear reach of the crop. Rows outside
    # a slab hold zero or never-read content. ~2× less VPU work at 176px.
    lo2, hi2 = _pass2_slab(S, P, H, W)

    @pl.when(flags_ref[b, 1] != 0)
    def _():
        cv[P : P + H] = _shear_pass(cv[P : P + H], coef_ref[b, 0], coef_ref[b, 1], S, row0=P)

    @pl.when(flags_ref[b, 2] != 0)
    def _():
        t = cv[:].T
        slab = _shear_pass(t[lo2:hi2], coef_ref[b, 2], coef_ref[b, 3], S, row0=lo2)
        cv[:] = jnp.concatenate([t[:lo2], slab, t[hi2:]], axis=0).T

    @pl.when(flags_ref[b, 3] != 0)
    def _():
        cv[P : P + H] = _shear_pass(cv[P : P + H], coef_ref[b, 4], 0.0, S, row0=P)

    out_ref[0, 0] = cv[P : P + H, P : P + W]


@functools.partial(jax.jit, static_argnames=("interpret",))
def shear3_warp_pallas(
    images: jax.Array, op: jax.Array, mag: jax.Array, interpret: bool = False
) -> jax.Array:
    """Three-shear affine warp, Pallas TPU kernel. NHWC, H == W."""
    B, H, W, C = images.shape
    assert H == W, "shear3 warp expects square images"
    S = canvas_size(H)
    P = (S - H) // 2

    k90, p1, t1, p2, t2, p3 = shear3_params(op, mag)
    flags = jnp.stack(
        [
            k90,
            ((p1 != 0) | (t1 != 0)).astype(jnp.int32),
            ((p2 != 0) | (t2 != 0)).astype(jnp.int32),
            (p3 != 0).astype(jnp.int32),
        ],
        axis=1,
    )  # (B, 4) int32
    coef = jnp.stack([p1, t1, p2, t2, p3], axis=1).astype(jnp.float32)  # (B, 5)

    x = images.astype(jnp.float32).transpose(0, 3, 1, 2)  # (B, C, H, W)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, C),
        in_specs=[
            pl.BlockSpec((1, 1, H, W), lambda b, c, flags, coef: (b, c, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, H, W), lambda b, c, flags, coef: (b, c, 0, 0)),
        scratch_shapes=[pltpu.VMEM((S, S), jnp.float32)],
    )
    kernel = functools.partial(_warp_kernel, S=S, P=P, H=H, W=W)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), jnp.float32),
        interpret=interpret,
    )(flags, coef, x)
    return out.transpose(0, 2, 3, 1).astype(images.dtype)


# ---------------------------------------------------------------------------
# NOTE — fully-fused TrivialAugment kernel: tried, measured, rejected.
#
# Folding the pixel ops (and the rotate quarter-turn) into this kernel was
# SLOWER than the split path on v5e: Mosaic charges a large fixed cost for
# @pl.when branches with big bodies even when the predicate is false (an
# in-kernel MXU-flip quarter-turn on a (B,)-grid 3-channel variant added
# ~25 µs/program when never taken; seven pixel-op branches ~12 µs/program),
# and hoisting the quarter-turn to XLA costs ~3 ms batch-wide. Measured at
# bs256@176, mixed ops: split path (this kernel + XLA pixel ops + MXU
# equalize) 10.1 ms; fused variants 11.6-14.4 ms. The split path in
# trivial_augment_wide is the production one.
# ---------------------------------------------------------------------------
