"""TrivialAugment op parity vs PIL (the torchvision PIL backend the reference
uses): enhancement blends and geometric warps. Geometric comparisons exclude
a 1-px border (resampling edge conventions differ) and allow small
interpolation tolerance."""

import numpy as np
import pytest
from PIL import Image, ImageEnhance

import jax
import jax.numpy as jnp

from vision_toolbox_tpu.ops.trivial_augment import (
    OP_BRIGHTNESS,
    OP_COLOR,
    OP_CONTRAST,
    OP_ROTATE,
    OP_SHEAR_X,
    _affine_warp,
    _blend,
    _grayscale,
)


def _image(seed=0, size=32):
    rng = np.random.default_rng(seed)
    # smooth image: parity not dominated by interpolation differences
    base = rng.standard_normal((8, 8, 3))
    img = np.asarray(Image.fromarray(
        (np.clip(base, -2, 2) * 50 + 128).astype(np.uint8), "RGB"
    ).resize((size, size), Image.BILINEAR))
    return img


@pytest.mark.parametrize("factor", [0.5, 1.0, 1.5])
def test_brightness_matches_pil(factor):
    arr = _image(0)
    ref = np.asarray(ImageEnhance.Brightness(Image.fromarray(arr)).enhance(factor), np.float32)
    x = jnp.asarray(arr, jnp.float32) / 255.0
    out = _blend(x[None], jnp.zeros_like(x)[None], factor)[0] * 255.0
    np.testing.assert_allclose(np.asarray(out), ref, atol=1.01)


@pytest.mark.parametrize("factor", [0.5, 1.5])
def test_color_matches_pil(factor):
    arr = _image(1)
    ref = np.asarray(ImageEnhance.Color(Image.fromarray(arr)).enhance(factor), np.float32)
    x = jnp.asarray(arr, jnp.float32)[None] / 255.0
    gray = jnp.broadcast_to(_grayscale(x), x.shape)
    out = _blend(x, gray, factor)[0] * 255.0
    # PIL computes the degenerate grayscale in uint8 (rounded L mode);
    # allow ±2 levels
    np.testing.assert_allclose(np.asarray(out), ref, atol=2.01)


@pytest.mark.parametrize("factor", [0.5, 1.5])
def test_contrast_matches_pil(factor):
    arr = _image(2)
    ref = np.asarray(ImageEnhance.Contrast(Image.fromarray(arr)).enhance(factor), np.float32)
    x = jnp.asarray(arr, jnp.float32)[None] / 255.0
    gray_mean = jnp.round(jnp.round(_grayscale(x) * 255.0)).mean() / 255.0
    # PIL uses the rounded mean of the L-mode image
    mean_img = jnp.full_like(x, jnp.round(gray_mean * 255.0) / 255.0)
    out = _blend(x, mean_img, factor)[0] * 255.0
    np.testing.assert_allclose(np.asarray(out), ref, atol=3.0)


def test_rotate_matches_pil():
    arr = _image(3)
    angle = 30.0
    ref = np.asarray(
        Image.fromarray(arr).rotate(-angle, Image.BILINEAR), np.float32
    )
    x = jnp.asarray(arr, jnp.float32)[None] / 255.0
    out = _affine_warp(x, jnp.asarray([OP_ROTATE]), jnp.asarray([angle / 135.0]))[0] * 255.0
    out = np.asarray(out)
    interior = np.s_[4:-4, 4:-4]
    mask = (ref[interior] > 0).all(-1)  # exclude fill regions
    diff = np.abs(out[interior] - ref[interior])[mask]
    assert np.median(diff) < 4.0, np.median(diff)


def test_shear_matches_pil():
    arr = _image(4)
    m = 0.3
    W, H = 32, 32
    # PIL inverse-affine shear about center (torchvision convention)
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    a, b, c = 1.0, m, -cx - m * cy + cx
    ref = np.asarray(
        Image.fromarray(arr).transform(
            (W, H), Image.AFFINE, (a, b, c, 0.0, 1.0, 0.0), Image.BILINEAR
        ),
        np.float32,
    )
    x = jnp.asarray(arr, jnp.float32)[None] / 255.0
    out = np.asarray(
        _affine_warp(x, jnp.asarray([OP_SHEAR_X]), jnp.asarray([-m / 0.99]))[0] * 255.0
    )
    interior = np.s_[4:-4, 4:-4]
    mask = (ref[interior] > 0).all(-1)
    diff = np.abs(out[interior] - ref[interior])[mask]
    assert np.median(diff) < 4.0, np.median(diff)
