"""TrivialAugmentWide as fused device kernels (TPU-side batch augmentation).

The reference applies torchvision's ``TrivialAugmentWide`` per-sample on host
PIL images (data.py:48). Host-side python transforms are the input-bound hot
loop of the reference's training (SURVEY.md §3.1); here the whole op runs
batched inside the jitted train step.

Semantics follow torchvision's TrivialAugmentWide: ONE op per image drawn
uniformly from 14 candidates, magnitude index uniform in [0, 30], sign flipped
with p=1/2. Wide magnitude ranges:
  shear ±[0,0.99], translate ±[0,32]px, rotate ±[0,135]°,
  brightness/color/contrast/sharpness 1±[0,0.99], posterize 8→2 bits,
  solarize threshold 255→0, autocontrast & equalize unparameterized.

Design for TPU:
  * All geometric ops (identity/shear/translate/rotate) collapse into ONE
    bilinear affine warp with a per-sample inverse matrix (identity matrix
    when a pixel op was drawn) — a single gather pass.
  * Pixel ops are branchless elementwise chains selected per-sample; XLA
    fuses the selects so only the gather-based ops (warp, equalize LUT)
    materialize intermediates.
  * uint8-faithful where torchvision quantizes (posterize/solarize/equalize/
    autocontrast use the 0..255 integer scale); blends stay in float and are
    clamped — the only deviation is the absence of intermediate uint8
    rounding in blends.

Input: NHWC float images in [0, 1].
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

NUM_OPS = 14
(
    OP_IDENTITY, OP_SHEAR_X, OP_SHEAR_Y, OP_TRANSLATE_X, OP_TRANSLATE_Y,
    OP_ROTATE, OP_BRIGHTNESS, OP_COLOR, OP_CONTRAST, OP_SHARPNESS,
    OP_POSTERIZE, OP_SOLARIZE, OP_AUTOCONTRAST, OP_EQUALIZE,
) = range(NUM_OPS)

_NUM_MAGNITUDES = 31


def _affine_matrices(op, mag, H, W):
    """Per-sample 2×3 *inverse* affine matrix (src = A @ [x, y, 1]) about the
    image center; identity for non-geometric ops."""
    ones = jnp.ones_like(mag)

    # ``mag`` is the signed magnitude in [-1, 1]; op-specific ranges applied here
    shear = mag * 0.99  # x' = x + m*y (torchvision shear via atan/tan roundtrip)
    tx = jnp.round(mag * 32.0)
    ty = jnp.round(mag * 32.0)
    theta = mag * 135.0 * jnp.pi / 180.0
    cos, sin = jnp.cos(theta), jnp.sin(theta)

    is_ = lambda o: (op == o).astype(mag.dtype)
    # inverse matrices: shearX^-1 = [1,-m;0,1]; rotate^-1 = R(-θ); translate^-1 = -t
    a = jnp.where(op == OP_ROTATE, cos, ones)
    b = is_(OP_SHEAR_X) * (-shear) + is_(OP_ROTATE) * sin
    c = is_(OP_SHEAR_Y) * (-shear) + is_(OP_ROTATE) * (-sin)
    d = jnp.where(op == OP_ROTATE, cos, ones)
    e = is_(OP_TRANSLATE_X) * (-tx)
    f = is_(OP_TRANSLATE_Y) * (-ty)
    return a, b, c, d, e, f


def _affine_warp(images, op, mag):
    """Single bilinear warp pass for the whole batch, zero fill outside."""
    B, H, W, C = images.shape
    a, b, c, d, e, f = _affine_matrices(op, mag, H, W)

    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    xr = xs - cx
    yr = ys - cy
    # src = A @ (out - center) + center + translation
    src_x = a[:, None, None] * xr + b[:, None, None] * yr + cx + e[:, None, None]
    src_y = c[:, None, None] * xr + d[:, None, None] * yr + cy + f[:, None, None]

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    wx = src_x - x0
    wy = src_y - y0

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = images.reshape(B, H * W, C)
        idx = yi_c * W + xi_c  # (B, H, W)
        vals = jnp.take_along_axis(flat, idx.reshape(B, H * W, 1), axis=1).reshape(B, H, W, C)
        return vals * valid[..., None].astype(images.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[..., None].astype(images.dtype)
    wy = wy[..., None].astype(images.dtype)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _grayscale(images):
    r, g, b = images[..., 0:1], images[..., 1:2], images[..., 2:3]
    return 0.2989 * r + 0.587 * g + 0.114 * b


def _blend(img1, img2, ratio):
    out = img1 * ratio + img2 * (1.0 - ratio)
    return jnp.clip(out, 0.0, 1.0)


def _sharpness_blur(images):
    """torchvision degenerate image: 3×3 [[1,1,1],[1,5,1],[1,1,1]]/13 conv on
    the interior; border pixels unchanged."""
    B, H, W, C = images.shape
    kernel = jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], images.dtype) / 13.0
    k = kernel.reshape(3, 3, 1, 1)
    k = jnp.tile(k, (1, 1, 1, C))  # depthwise
    blurred = jax.lax.conv_general_dilated(
        images, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )
    blurred = jnp.clip(blurred, 0.0, 1.0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    interior = ((rows > 0) & (rows < H - 1) & (cols > 0) & (cols < W - 1))[None, :, :, None]
    return jnp.where(interior, blurred, images)


def _posterize(images, mag):
    bits = 8 - jnp.round(mag * 6.0).astype(jnp.int32)  # 2..8 bits
    shift = 8 - bits  # (B,)
    v = jnp.round(images * 255.0).astype(jnp.int32)
    mask = (0xFF >> shift << shift)[:, None, None, None]
    return (v & mask).astype(images.dtype) / 255.0


def _solarize(images, mag):
    threshold = ((1.0 - mag) * 255.0)[:, None, None, None] / 255.0
    return jnp.where(images >= threshold, 1.0 - images, images)


def _autocontrast(images):
    lo = images.min(axis=(1, 2), keepdims=True)
    hi = images.max(axis=(1, 2), keepdims=True)
    scale = jnp.where(hi > lo, 1.0 / (hi - lo), 1.0)
    out = jnp.clip((images - lo) * scale, 0.0, 1.0)
    return jnp.where(hi > lo, out, images)


def _equalize(images):
    """Per-channel histogram equalization with torchvision's integer LUT.

    TPU-friendly formulation: a 256-way one-hot would materialize a
    (B·C, HW, 256) intermediate (~24 GB at bs256@176) and the final LUT
    lookup is a per-element gather (which scalarizes on TPU). Instead the
    8-bit value splits into nibbles v = 16·hi + lo, and both the histogram
    and the LUT application become MXU matmuls over two (HW, 16) one-hots:

        hist[h, l] = Σ_px onehot_hi[px, h] · onehot_lo[px, l]
        eq[px]     = Σ_h  onehot_hi[px, h] · (onehot_lo @ LUTᵀ)[px, h]

    All products involve a single nonzero per row with integer values ≤ 255
    (exact in bf16) and accumulate in fp32, so the result is bit-identical
    to the gather formulation. 292 ms → ~3 ms at bs256@176 on v5e.
    """
    B, H, W, C = images.shape
    N, P = B * C, H * W
    v = jnp.round(images * 255.0).astype(jnp.int32)  # (B,H,W,C)
    flat = v.transpose(0, 3, 1, 2).reshape(N, P)

    bins = jnp.arange(16, dtype=jnp.int32)
    oh_hi = ((flat >> 4)[..., None] == bins).astype(jnp.bfloat16)  # (N, P, 16)
    oh_lo = ((flat & 15)[..., None] == bins).astype(jnp.bfloat16)
    hist = jnp.einsum(
        "nph,npl->nhl", oh_hi, oh_lo, preferred_element_type=jnp.float32
    ).reshape(N, 256).astype(jnp.int32)

    # step = (pixel count minus last nonzero bin) // 255 (torchvision)
    idx = jax.lax.broadcasted_iota(jnp.int32, (256,), 0)
    has = hist > 0
    last_nonzero = jnp.max(jnp.where(has, idx[None, :], -1), axis=1)  # (N,)
    last_count = jnp.max(jnp.where(idx[None, :] == last_nonzero[:, None], hist, 0), axis=1)
    step = (hist.sum(axis=1) - last_count) // 255  # (N,)

    cum = jnp.cumsum(hist, axis=1)
    safe_step = jnp.maximum(step, 1)
    lut = (cum + (safe_step // 2)[:, None]) // safe_step[:, None]
    lut = jnp.clip(jnp.pad(lut, ((0, 0), (1, 0)))[:, :-1], 0, 255)  # shift right

    # eq[px] = LUT[hi[px], lo[px]] via the same one-hots on the MXU
    lut16 = lut.reshape(N, 16, 16).astype(jnp.bfloat16)
    tmp = jnp.einsum(
        "nhl,npl->nph", lut16, oh_lo, preferred_element_type=jnp.float32
    )  # (N, P, 16): row p holds LUT[:, lo[p]]
    eq = jnp.sum(oh_hi.astype(jnp.float32) * tmp, axis=-1)  # (N, P)

    eq = eq.reshape(B, C, H, W).transpose(0, 2, 3, 1).astype(images.dtype) / 255.0
    return jnp.where((step > 0).reshape(B, C)[:, None, None, :], eq, images)


def _subset_capacity(batch: int, n_ops: int) -> int:
    """Fixed gather capacity covering Binomial(batch, n_ops/14) draws with a
    ≥6σ margin: P(overflow) < 1e-13 per batch, and an overflowing image just
    keeps the identity op (graceful)."""
    p = n_ops / NUM_OPS
    mean = batch * p
    sd = math.sqrt(batch * p * (1.0 - p))
    k = int(mean + 6.0 * sd + 8.0)
    return min(batch, -(-k // 8) * 8)


def _apply_pixel_ops(
    out: jax.Array,
    op: jax.Array,
    mag01: jax.Array,
    signed: jax.Array,
    capacity: int | None = None,
) -> jax.Array:
    """Apply the per-sample pixel-op candidates (everything but the warp).

    Cheap elementwise ops run branchlessly on the full batch (XLA fuses the
    selects into one pass). The two heavy ops — sharpness (depthwise conv)
    and equalize (nibble-matmul histogram) — cost ~6 ms/batch at bs256@176
    when computed for all images although only ~2/14 of draws need them, so
    they run on a fixed-capacity gathered subset of the batch instead
    (gather → compute → scatter back; ~3× cheaper, identical results up to
    the astronomically-unlikely capacity overflow, see _subset_capacity).
    """
    B = out.shape[0]
    factor = (1.0 + signed * 0.99)[:, None, None, None]
    gray = _grayscale(out)
    cheap = [
        (OP_BRIGHTNESS, _blend(out, jnp.zeros_like(out), factor)),
        (OP_COLOR, _blend(out, jnp.broadcast_to(gray, out.shape), factor)),
        (OP_CONTRAST, _blend(out, jnp.round(gray * 255.0).mean(axis=(1, 2, 3), keepdims=True) / 255.0 * jnp.ones_like(out), factor)),
        (OP_POSTERIZE, _posterize(out, mag01)),
        (OP_SOLARIZE, _solarize(out, mag01)),
        (OP_AUTOCONTRAST, _autocontrast(out)),
    ]
    for op_id, result in cheap:
        sel = (op == op_id)[:, None, None, None]
        out = jnp.where(sel, result, out)

    K = _subset_capacity(B, 2) if capacity is None else capacity
    if K >= B:
        sharp = _blend(out, _sharpness_blur(out), factor)
        out = jnp.where((op == OP_SHARPNESS)[:, None, None, None], sharp, out)
        out = jnp.where((op == OP_EQUALIZE)[:, None, None, None], _equalize(out), out)
        return out

    member = (op == OP_SHARPNESS) | (op == OP_EQUALIZE)
    idx = jnp.argsort(~member)[:K]  # stable: member rows first
    sub = out[idx]
    sub_op = op[idx]
    res = jnp.where(
        (sub_op == OP_SHARPNESS)[:, None, None, None],
        _blend(sub, _sharpness_blur(sub), factor[idx]),
        sub,
    )
    res = jnp.where((sub_op == OP_EQUALIZE)[:, None, None, None], _equalize(sub), res)
    return out.at[idx].set(res, unique_indices=True)


def trivial_augment_wide(rng: jax.Array, images: jax.Array) -> jax.Array:
    """Apply one TrivialAugmentWide op per image, batched on device."""
    B = images.shape[0]
    rng_op, rng_mag, rng_sign = jax.random.split(rng, 3)
    op = jax.random.randint(rng_op, (B,), 0, NUM_OPS)
    mag_idx = jax.random.randint(rng_mag, (B,), 0, _NUM_MAGNITUDES)
    sign = jnp.where(jax.random.bernoulli(rng_sign, 0.5, (B,)), 1.0, -1.0)
    mag01 = mag_idx.astype(jnp.float32) / (_NUM_MAGNITUDES - 1)  # [0, 1]
    signed = mag01 * sign  # [-1, 1]; op-specific ranges applied downstream

    # geometric pass (identity for pixel ops); Pallas three-shear kernel on
    # TPU, exact bilinear gather elsewhere (ops/warp.py)
    from .warp import affine_warp

    out = affine_warp(images, op, signed)
    return _apply_pixel_ops(out, op, mag01, signed)
