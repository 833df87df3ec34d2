"""Swin resolution transfer: because position information is *relative*
(PE tables indexed by in-window offsets, masks static per size), the same
parameters run at any compatible resolution — where the reference raises
NotImplementedError (swin.py:186-187)."""

import numpy as np

import jax
import jax.numpy as jnp

from vision_toolbox_tpu.models.swin import SwinTransformer


def test_swin_params_transfer_across_resolutions():
    kwargs = dict(d_model=8, n_heads=2, depths=(2, 2), window_sizes=(2, 2))
    small = SwinTransformer(img_size=16, **kwargs)
    variables = small.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 16, 16, 3)), train=False)

    big = SwinTransformer(img_size=32, **kwargs)
    out = big.apply(variables, jnp.ones((2, 32, 32, 3)))
    assert out.shape == (2, 16)
    assert np.all(np.isfinite(np.asarray(out)))

    # shifted-window masks actually engage at the larger size (grid > window)
    feats = big.apply(variables, jnp.ones((1, 32, 32, 3)), method="get_feature_maps")
    assert [f.shape[1] for f in feats] == [8, 4]


def test_window_size_transfer():
    """Params trained at one window size run at another via bicubic
    interpolation of the relative-PE tables (ref swin.py:186-187 raises)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vision_toolbox_tpu.models.swin import SwinTransformer, resize_window_tables

    depths, old_w, new_w = (1, 1), (4, 4), (8, 8)
    m_old = SwinTransformer(img_size=64, d_model=16, n_heads=2, depths=depths, window_sizes=old_w)
    variables = m_old.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3)), train=False)

    params_new = resize_window_tables(variables["params"], depths, old_w, new_w)
    m_new = SwinTransformer(img_size=64, d_model=16, n_heads=2, depths=depths, window_sizes=new_w)
    init_new = m_new.init({"params": jax.random.PRNGKey(1)}, jnp.zeros((1, 64, 64, 3)), train=False)
    # structure matches the new-window model exactly
    a = jax.tree_util.tree_map(jnp.shape, params_new)
    b = jax.tree_util.tree_map(jnp.shape, init_new["params"])
    assert a == b
    out = m_new.apply({"params": params_new}, jnp.ones((2, 64, 64, 3)), train=False)
    assert out.shape == (2, 32)
    assert np.all(np.isfinite(np.asarray(out)))
    # no-op transfer shares leaves untouched
    same = resize_window_tables(variables["params"], depths, old_w, old_w)
    ref_leaf = variables["params"]["stage_0_block_0"]["mha"]["relative_pe_table"]
    assert same["stage_0_block_0"]["mha"]["relative_pe_table"] is ref_leaf
