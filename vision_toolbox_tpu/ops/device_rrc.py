"""On-device RandomResizedCrop + horizontal flip for device-resident datasets.

The reference runs RandomResizedCrop(176) + RandomHorizontalFlip per sample in
DataLoader worker processes (/root/reference/data.py:44-52). With the training
set resident in HBM (uint8, decoded once), the TPU-native formulation of the
same transform is a *batched separable resampling matmul*:

    out[b] = Wy[b] @ img[b] @ Wx[b]^T      (per channel)

where ``Wy (B, out, H)`` / ``Wx (B, out, W)`` are per-image bilinear (or
antialiased-triangle) weight rows determined by that image's crop box and flip
bit. Both contractions run on the MXU; for a 256-image batch of 256px stores
resampled to 176px the two einsums cost ~26 GFLOP — under 1% of the model's
step FLOPs — and the only per-step host→device traffic left is the (B,) index
vector, which removes the H2D image-copy bound entirely (measured 31 MB/s
through the dev tunnel ⇒ 333 img/s ceiling; PCIe hosts pay a full batch copy
per step too).

Box sampling follows torchvision's ``RandomResizedCrop.get_params`` (10
rejection attempts over area-scale × log-uniform aspect, center-crop
fallback), vectorized: all 10 candidates are drawn at once and the first
valid one is selected with a mask-argmax — no data-dependent control flow
under jit. Divergence from torchvision: crop geometry stays continuous
(sub-pixel) instead of integer-rounded, and the source is the fixed
squash-resized store rather than the original-resolution frame (the same
trade data/raw_shards.py documents).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_rrc_boxes(
    rng: jax.Array,
    batch: int,
    src_h: int,
    src_w: int,
    scale: tuple[float, float] = (0.08, 1.0),
    ratio: tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-image crop boxes ``(i, j, h, w)`` — float32 (B,) each.

    torchvision semantics (transforms.RandomResizedCrop.get_params): 10
    attempts of ``target_area = area * U(scale)``, aspect ``exp(U(log ratio))``;
    first attempt with ``h <= src_h and w <= src_w`` wins, else the
    ratio-clamped center crop.
    """
    k_area, k_ratio, k_i, k_j = jax.random.split(rng, 4)
    area = float(src_h * src_w)
    ta = area * jax.random.uniform(
        k_area, (batch, 10), minval=scale[0], maxval=scale[1]
    )
    log_r = jax.random.uniform(
        k_ratio, (batch, 10),
        minval=jnp.log(jnp.float32(ratio[0])), maxval=jnp.log(jnp.float32(ratio[1])),
    )
    r = jnp.exp(log_r)
    w = jnp.sqrt(ta * r)
    h = jnp.sqrt(ta / r)
    valid = (w <= src_w) & (h <= src_h)  # > 0 by construction
    # first valid attempt: argmax returns the first True
    pick = jnp.argmax(valid, axis=1)
    any_valid = valid.any(axis=1)
    h = jnp.take_along_axis(h, pick[:, None], axis=1)[:, 0]
    w = jnp.take_along_axis(w, pick[:, None], axis=1)[:, 0]

    # fallback: center crop at the nearest in-range aspect (torchvision's
    # min/max-ratio clamp of the full frame)
    in_ratio = src_w / src_h
    fb_w = jnp.where(
        in_ratio < ratio[0], jnp.float32(src_w),
        jnp.where(in_ratio > ratio[1], src_h * jnp.float32(ratio[1]), jnp.float32(src_w)),
    )
    fb_h = jnp.where(
        in_ratio < ratio[0], src_w / jnp.float32(ratio[0]),
        jnp.where(in_ratio > ratio[1], jnp.float32(src_h), jnp.float32(src_h)),
    )
    h = jnp.where(any_valid, h, fb_h)
    w = jnp.where(any_valid, w, fb_w)

    u_i = jax.random.uniform(k_i, (batch,))
    u_j = jax.random.uniform(k_j, (batch,))
    i = jnp.where(any_valid, u_i * (src_h - h), (src_h - h) / 2)
    j = jnp.where(any_valid, u_j * (src_w - w), (src_w - w) / 2)
    return i, j, h, w


def _axis_weights(start, size, src: int, out: int, antialias: bool, flipped=None):
    """Triangle-filter resampling rows: (B, out, src) weights for one axis.

    ``start``/``size`` are (B,) crop offsets/extents in source pixels. With
    ``antialias`` the triangle widens by the downscale factor (PIL/torchvision
    antialiased bilinear); at scale 1 both reduce to classic bilinear.
    """
    o = jnp.arange(out, dtype=jnp.float32)[None, :]  # (1, out)
    step = size[:, None] / out  # (B, 1)
    coord = start[:, None] + (o + 0.5) * step - 0.5  # (B, out)
    if flipped is not None:
        flip_coord = start[:, None] + size[:, None] - (o + 0.5) * step - 0.5
        coord = jnp.where(flipped[:, None], flip_coord, coord)
    s = jnp.maximum(step, 1.0) if antialias else jnp.ones_like(step)
    src_pos = jnp.arange(src, dtype=jnp.float32)[None, None, :]  # (1, 1, src)
    wts = jnp.maximum(0.0, 1.0 - jnp.abs(src_pos - coord[:, :, None]) / s[:, :, None])
    return wts / jnp.maximum(wts.sum(-1, keepdims=True), 1e-8)


def crop_resize_flip(
    images: jax.Array,
    i: jax.Array,
    j: jax.Array,
    h: jax.Array,
    w: jax.Array,
    flip: jax.Array | None,
    out_size: int,
    antialias: bool = True,
) -> jax.Array:
    """Resample per-image boxes to (out_size, out_size) via two MXU einsums.

    ``images``: (B, H, W, C) float; ``i/j/h/w``: (B,) float boxes;
    ``flip``: (B,) bool or None.
    """
    B, H, W, C = images.shape
    wy = _axis_weights(i, h, H, out_size, antialias)  # (B, O, H)
    wx = _axis_weights(j, w, W, out_size, antialias, flipped=flip)  # (B, O, W)
    tmp = jnp.einsum("boh,bhwc->bowc", wy, images)
    return jnp.einsum("bowc,bpw->bopc", tmp, wx)


def random_resized_crop_flip(
    rng: jax.Array,
    images: jax.Array,
    out_size: int,
    scale: tuple[float, float] = (0.08, 1.0),
    ratio: tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
    hflip_p: float = 0.5,
    antialias: bool = True,
) -> jax.Array:
    """RandomResizedCrop(out_size) + RandomHorizontalFlip, batched on device."""
    B, H, W, _ = images.shape
    k_box, k_flip = jax.random.split(rng)
    i, j, h, w = sample_rrc_boxes(k_box, B, H, W, scale, ratio)
    flip = None
    if hflip_p > 0:
        flip = jax.random.uniform(k_flip, (B,)) < hflip_p
    return crop_resize_flip(images, i, j, h, w, flip, out_size, antialias)
