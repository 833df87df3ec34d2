"""shear3 warp (ops/warp.py) vs the reference 2-D bilinear gather warp
(ops/trivial_augment._affine_warp) as oracle.

Shear/translate/identity are single 1-D resamples in both formulations, so
they must match to float tolerance. Rotation is a 3-pass interpolation —
compared with a loose median criterion like the PIL-oracle tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_toolbox_tpu.ops.trivial_augment import (
    NUM_OPS,
    OP_IDENTITY,
    OP_ROTATE,
    OP_SHEAR_X,
    OP_SHEAR_Y,
    OP_SOLARIZE,
    OP_TRANSLATE_X,
    OP_TRANSLATE_Y,
    _affine_warp,
)
from vision_toolbox_tpu.ops.warp import shear3_warp_xla


def _images(b=4, s=32, seed=0):
    rng = np.random.default_rng(seed)
    # smooth-ish image: random low-freq + structure
    base = rng.random((b, 6, 6, 3)).astype(np.float32)
    img = jax.image.resize(jnp.asarray(base), (b, s, s, 3), "linear")
    return jnp.clip(img, 0.0, 1.0)


@pytest.mark.parametrize(
    "op,mag",
    [
        (OP_IDENTITY, 0.3),
        (OP_SHEAR_X, 0.5),
        (OP_SHEAR_X, -0.8),
        (OP_SHEAR_Y, 0.6),
        (OP_SHEAR_Y, -0.2),
        (OP_TRANSLATE_X, 0.4),
        (OP_TRANSLATE_X, -0.9),
        (OP_TRANSLATE_Y, 0.7),
        (OP_SOLARIZE, 0.5),  # non-geometric -> identity warp
    ],
)
def test_shear3_matches_gather_exact_ops(op, mag):
    x = _images()
    op_a = jnp.full((4,), op, jnp.int32)
    mag_a = jnp.full((4,), mag, jnp.float32)
    ref = np.asarray(_affine_warp(x, op_a, mag_a))
    out = np.asarray(shear3_warp_xla(x, op_a, mag_a))
    np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.parametrize("mag", [0.05, 0.2, -0.33, 0.5, -0.66, 0.8, 1.0, -1.0])
def test_shear3_rotation_close_to_gather(mag):
    x = _images(2, 48)
    op_a = jnp.full((2,), OP_ROTATE, jnp.int32)
    mag_a = jnp.full((2,), mag, jnp.float32)
    ref = np.asarray(_affine_warp(x, op_a, mag_a)) * 255.0
    out = np.asarray(shear3_warp_xla(x, op_a, mag_a)) * 255.0
    # interior, ignore fill regions
    interior = np.s_[:, 6:-6, 6:-6, :]
    mask = ref[interior] > 1.0
    diff = np.abs(out[interior] - ref[interior])[mask]
    assert np.median(diff) < 2.0, (mag, np.median(diff))
    # overall agreement incl. the fill boundary (3-pass smears the edge by a
    # pixel differently from single-pass bilinear — small in the mean)
    assert np.mean(np.abs(out - ref)) < 2.0, (mag, np.mean(np.abs(out - ref)))


def test_shear3_mixed_batch():
    """Per-sample programs stay independent within one batch."""
    x = _images(6, 32, seed=3)
    ops = jnp.asarray([OP_IDENTITY, OP_SHEAR_X, OP_ROTATE, OP_TRANSLATE_Y, OP_SHEAR_Y, OP_ROTATE])
    mags = jnp.asarray([0.0, 0.4, 0.25, -0.5, 0.9, -0.75])
    full = np.asarray(shear3_warp_xla(x, ops, mags))
    for i in range(6):
        single = np.asarray(shear3_warp_xla(x[i : i + 1], ops[i : i + 1], mags[i : i + 1]))
        np.testing.assert_allclose(full[i], single[0], atol=1e-5)


def test_pallas_warp_matches_xla_interpret():
    """The Pallas kernel (interpret mode on CPU) is the same algorithm as
    shear3_warp_xla — bit-level agreement expected."""
    from vision_toolbox_tpu.ops.warp_pallas import shear3_warp_pallas

    x = _images(5, 32, seed=7)
    ops = jnp.asarray([OP_IDENTITY, OP_SHEAR_X, OP_ROTATE, OP_TRANSLATE_Y, OP_ROTATE])
    mags = jnp.asarray([0.0, 0.4, 0.7, -0.5, -0.95], jnp.float32)
    ref = np.asarray(shear3_warp_xla(x, ops, mags))
    out = np.asarray(shear3_warp_pallas(x, ops, mags, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_shear3_jits():
    x = _images(2, 32)
    f = jax.jit(shear3_warp_xla)
    out = f(jnp.asarray(x), jnp.asarray([OP_ROTATE, OP_SHEAR_X]), jnp.asarray([0.5, -0.5]))
    assert out.shape == x.shape
    assert float(out.min()) >= -1e-5 and float(out.max()) <= 1.0 + 1e-5
