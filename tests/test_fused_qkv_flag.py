"""FUSE_SELF_ATTENTION_QKV is default-off (measured −5-7% on v5e,
BENCHMARKS.md) but the fused path must stay numerically identical — it is
kept as an honest A/B switch and must not rot."""

import jax
import jax.numpy as jnp
import numpy as np

import vision_toolbox_tpu.nn.attention as attn


def test_fused_matches_separate():
    mha = attn.MHA(d_model=64, n_heads=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 64))

    assert attn.FUSE_SELF_ATTENTION_QKV is False  # measured default
    v = mha.init({"params": jax.random.PRNGKey(1)}, x)
    want = mha.apply(v, x)

    try:
        attn.FUSE_SELF_ATTENTION_QKV = True
        v_fused = mha.init({"params": jax.random.PRNGKey(1)}, x)
        # identical param trees (same names, shapes, AND rng draws)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            v, v_fused,
        )
        got = mha.apply(v, x)
    finally:
        attn.FUSE_SELF_ATTENTION_QKV = False

    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
