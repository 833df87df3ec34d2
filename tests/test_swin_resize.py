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
