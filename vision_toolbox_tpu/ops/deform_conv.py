"""Deformable convolution v1/v2 (reference components.py:77-135 wraps
torchvision's C++/CUDA DeformConv2d; exported-but-unused in-repo —
SURVEY.md §2.1 "build as optional op").

TPU-native: one bilinear gather + one MXU matmul per kernel tap (k² taps),
all batched — no scatter, no dynamic shapes. Offset layout matches
torchvision: channel 2*(ky*k+kx) is Δy, +1 is Δx.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_sample(x: jax.Array, sy: jax.Array, sx: jax.Array) -> jax.Array:
    """Sample x (B,H,W,C) at float coords sy/sx (B,Ho,Wo) with zero padding."""
    B, H, W, C = x.shape
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = (sy - y0)[..., None]
    wx = (sx - x0)[..., None]

    flat = x.reshape(B, H * W, C)

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        idx = (yi_c * W + xi_c).reshape(B, -1, 1)
        vals = jnp.take_along_axis(flat, idx, axis=1).reshape(*yi.shape, C)
        return vals * valid[..., None].astype(x.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def deform_conv2d(
    x: jax.Array,
    weight: jax.Array,
    offset: jax.Array,
    mask: jax.Array | None = None,
    bias: jax.Array | None = None,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
) -> jax.Array:
    """x (B,H,W,C), weight (k,k,C,Co), offset (B,Ho,Wo,2k²), mask (B,Ho,Wo,k²)."""
    B, H, W, C = x.shape
    k = weight.shape[0]
    Ho = (H + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    assert offset.shape[:3] == (B, Ho, Wo), (offset.shape, (B, Ho, Wo))

    base_y = jax.lax.broadcasted_iota(jnp.float32, (Ho, Wo), 0) * stride - padding
    base_x = jax.lax.broadcasted_iota(jnp.float32, (Ho, Wo), 1) * stride - padding

    out = jnp.zeros((B, Ho, Wo, weight.shape[-1]), x.dtype)
    for ky in range(k):
        for kx in range(k):
            tap = ky * k + kx
            dy = offset[..., 2 * tap]
            dx = offset[..., 2 * tap + 1]
            sy = base_y[None] + ky * dilation + dy
            sx = base_x[None] + kx * dilation + dx
            sampled = _bilinear_sample(x, sy, sx)  # (B,Ho,Wo,C)
            if mask is not None:
                sampled = sampled * mask[..., tap][..., None]
            out = out + jnp.einsum(
                "bhwc,co->bhwo", sampled, weight[ky, kx]
            )
    if bias is not None:
        out = out + bias
    return out
