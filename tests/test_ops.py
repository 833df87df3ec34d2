"""Op-level tests: deformable conv reduces to standard conv at zero offsets;
profile helper returns sane numbers."""

import numpy as np

import jax
import jax.numpy as jnp

from vision_toolbox_tpu.ops.deform_conv import deform_conv2d


def test_deform_conv_zero_offset_equals_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 9, 9, 4), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 6), dtype=np.float32))
    offset = jnp.zeros((2, 9, 9, 18))
    out = deform_conv2d(x, w, offset, stride=1, padding=1)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_deform_conv_integer_offset_shifts():
    """Offset (0, +1) on every tap == conv over x shifted left by 1."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 2), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 2, 3), dtype=np.float32))
    offset = jnp.zeros((1, 8, 8, 18)).at[..., 1::2].set(1.0)  # dx = 1
    out = deform_conv2d(x, w, offset, stride=1, padding=1)
    x_shift = jnp.pad(x[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
    ref = jax.lax.conv_general_dilated(
        x_shift, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    # interior matches exactly (border differs by padding semantics)
    np.testing.assert_allclose(
        np.asarray(out)[:, 1:-1, 1:-2], np.asarray(ref)[:, 1:-1, 1:-2], rtol=1e-4, atol=1e-4
    )


def test_deform_conv_mask_scales():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 2), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 2, 2), dtype=np.float32))
    offset = jnp.zeros((1, 6, 6, 18))
    half = jnp.full((1, 6, 6, 9), 0.5)
    out_half = deform_conv2d(x, w, offset, half, padding=1)
    out_full = deform_conv2d(x, w, offset, jnp.ones_like(half), padding=1)
    np.testing.assert_allclose(np.asarray(out_half), np.asarray(out_full) * 0.5, rtol=1e-4, atol=1e-5)


def test_deformable_conv2d_module():
    from vision_toolbox_tpu.nn.layers import DeformableConv2d

    m = DeformableConv2d(out_channels=8, kernel_size=3, padding=1, v2=True)
    x = jnp.zeros((1, 8, 8, 4))
    v = m.init({"params": jax.random.PRNGKey(0)}, x)
    out = m.apply(v, x)
    assert out.shape == (1, 8, 8, 8)


def test_profile_helper():
    from vision_toolbox_tpu import create_backbone
    from vision_toolbox_tpu.utils.profile import profile_model

    model = create_backbone("darknet19")
    variables = model.init_variables(0, 64)
    stats = profile_model(model, variables, (1, 64, 64, 3), n=2)
    assert stats["params_m"] > 10  # darknet19 ≈ 19.8M backbone params
    assert stats["gflops"] > 0.1
    assert stats["fwd_ms"] > 0
    assert stats["fwd_bwd_ms"] > 0
