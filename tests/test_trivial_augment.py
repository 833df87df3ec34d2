"""TrivialAugmentWide device-kernel semantics: invariants + parity of the
integer ops vs PIL/numpy replicas of the torchvision formulas."""

import numpy as np
import pytest
from PIL import Image, ImageOps

import jax
import jax.numpy as jnp

from vision_toolbox_tpu.ops.trivial_augment import (
    NUM_OPS,
    OP_EQUALIZE,
    OP_IDENTITY,
    OP_POSTERIZE,
    OP_ROTATE,
    OP_SOLARIZE,
    OP_TRANSLATE_X,
    _affine_warp,
    _autocontrast,
    _equalize,
    _posterize,
    _solarize,
    trivial_augment_wide,
)


def _rand_images(n=2, size=16, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 256, (n, size, size, 3)).astype(np.float32) / 255.0)


def test_identity_warp_is_exact():
    images = _rand_images()
    op = jnp.full((2,), OP_IDENTITY)
    out = _affine_warp(images, op, jnp.zeros((2,)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(images), atol=1e-6)


def test_translate_x_moves_pixels():
    images = jnp.zeros((1, 8, 8, 3)).at[0, 4, 2, :].set(1.0)
    # signed magnitude 0.25 → round(0.25*32)=8? too far for 8px; use small
    mag = jnp.asarray([2.0 / 32.0])  # tx = 2
    out = _affine_warp(images, jnp.asarray([OP_TRANSLATE_X]), mag)
    # forward translate by +2: pixel moves from x=2 to x=4
    assert float(out[0, 4, 4, 0]) == pytest.approx(1.0, abs=1e-5)
    assert float(out[0, 4, 2, 0]) == pytest.approx(0.0, abs=1e-5)


def test_rotate_180_flips():
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.random((1, 9, 9, 3), dtype=np.float32))
    mag = jnp.asarray([180.0 / 135.0])  # theta = 180 deg (out of range but exact)
    out = _affine_warp(images, jnp.asarray([OP_ROTATE]), mag)
    ref = np.asarray(images)[:, ::-1, ::-1, :]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


@pytest.mark.parametrize("bits_mag", [0.0, 0.5, 1.0])
def test_posterize_matches_pil(bits_mag):
    images = _rand_images(1, 8, seed=2)
    out = _posterize(images, jnp.asarray([bits_mag]))
    bits = 8 - round(bits_mag * 6)
    arr = (np.asarray(images[0]) * 255).round().astype(np.uint8)
    ref = np.asarray(ImageOps.posterize(Image.fromarray(arr), bits)).astype(np.float32) / 255.0
    np.testing.assert_allclose(np.asarray(out[0]), ref, atol=1e-6)


def test_solarize_matches_numpy():
    images = _rand_images(1, 8, seed=3)
    mag = 0.5  # threshold = 127.5
    out = _solarize(images, jnp.asarray([mag]))
    x = np.asarray(images[0])
    ref = np.where(x >= 127.5 / 255.0, 1.0 - x, x)
    np.testing.assert_allclose(np.asarray(out[0]), ref, atol=1e-6)


def test_autocontrast_full_range_is_identity():
    x = np.zeros((1, 4, 4, 3), np.float32)
    x[0, 0, 0] = 0.0
    x[0, -1, -1] = 1.0
    x[0, 1, 1] = 0.5
    out = _autocontrast(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-6)


def test_autocontrast_rescales():
    x = np.full((1, 4, 4, 1), 0.25, np.float32)
    x[0, 0, 0] = 0.25
    x[0, 3, 3] = 0.75
    out = _autocontrast(jnp.asarray(x))
    assert float(out.min()) == pytest.approx(0.0, abs=1e-6)
    assert float(out.max()) == pytest.approx(1.0, abs=1e-6)


def test_equalize_matches_torchvision_formula():
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 200, (12, 12, 3)).astype(np.uint8)  # skewed histogram
    images = jnp.asarray(arr.astype(np.float32) / 255.0)[None]
    out = np.asarray(_equalize(images)[0])

    # numpy replica of torchvision's integer LUT
    ref = np.zeros_like(arr)
    for c in range(3):
        chan = arr[..., c].ravel()
        hist = np.bincount(chan, minlength=256)
        nonzero = hist[hist != 0]
        step = (hist.sum() - nonzero[-1]) // 255
        if step == 0:
            ref[..., c] = arr[..., c]
            continue
        lut = (np.cumsum(hist) + step // 2) // step
        lut = np.clip(np.concatenate([[0], lut[:-1]]), 0, 255)
        ref[..., c] = lut[arr[..., c]]
    np.testing.assert_allclose(out * 255.0, ref.astype(np.float32), atol=0.51)


def test_full_op_jits_and_preserves_range():
    images = _rand_images(16, 16, seed=5)
    fn = jax.jit(trivial_augment_wide)
    for seed in range(3):
        out = fn(jax.random.PRNGKey(seed), images)
        assert out.shape == images.shape
        assert float(out.min()) >= -1e-5
        assert float(out.max()) <= 1.0 + 1e-5


def test_gathered_heavy_ops_match_full_path():
    """The fixed-capacity gather path for sharpness/equalize (used when the
    batch is large enough that computing them full-batch would dominate TA
    cost) produces the same images as the branchless full-batch path."""
    from vision_toolbox_tpu.ops.trivial_augment import _apply_pixel_ops, _subset_capacity

    B = 64
    images = _rand_images(B, 16, seed=7)
    rng = np.random.default_rng(8)
    op = jnp.asarray(rng.integers(0, NUM_OPS, (B,)), jnp.int32)
    mag01 = jnp.asarray(rng.random((B,), dtype=np.float32))
    signed = mag01 * jnp.asarray(np.where(rng.random(B) < 0.5, 1.0, -1.0), jnp.float32)

    k = _subset_capacity(B, 2)
    assert k < B, "test batch must exercise the gather path"
    full = _apply_pixel_ops(images, op, mag01, signed, capacity=B)
    gathered = _apply_pixel_ops(images, op, mag01, signed, capacity=None)
    np.testing.assert_allclose(np.asarray(gathered), np.asarray(full), atol=1e-6)


def test_gathered_path_overflow_degrades_to_identity():
    """If more images draw a pooled heavy op than the gather capacity, the
    overflow images keep their (post-warp) pixels instead of erroring."""
    from vision_toolbox_tpu.ops.trivial_augment import _apply_pixel_ops

    B = 16
    images = _rand_images(B, 8, seed=9)
    op = jnp.full((B,), OP_EQUALIZE, jnp.int32)  # all 16 draw equalize
    mag01 = jnp.zeros((B,))
    out = _apply_pixel_ops(images, op, mag01, mag01, capacity=8)
    eq = _apply_pixel_ops(images, op, mag01, mag01, capacity=B)
    # first 8 (stable argsort order) equalized, rest untouched
    np.testing.assert_allclose(np.asarray(out[:8]), np.asarray(eq[:8]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[8:]), np.asarray(images[8:]), atol=1e-6)
