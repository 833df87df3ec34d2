"""Backbone contract tests — port of the reference's tests/test_backbones.py:39-78
pattern to JAX: out_channels_list/stride/get_feature_maps contract, forward
shape, feature-map channel parity, and 'every model jits' (the reference's
torch.jit.trace equivalent).

Small input sizes keep CPU compile time in check; strides are powers of two so
the contract math is unchanged.
"""

import jax
import jax.numpy as jnp
import pytest

from vision_toolbox_tpu import create_backbone

# name -> test image size (small but >= stride), extra kwargs
BACKBONES = [
    ("darknet19", 64, {}),
    ("cspdarknet53", 64, {}),
    ("darknet_yolov5n", 64, {}),
    ("darknet_yolov5l", 64, {}),
    ("vovnet27_slim", 64, {}),
    ("vovnet39", 64, {}),
    ("vovnet19_slim_ese", 64, {}),
    ("swin_t", 64, {"img_size": 64, "window_sizes": (2, 2, 2, 2)}),
    ("convnext_a", 64, {}),
    ("resnet18", 64, {}),
    ("mobilenet_v3_small", 64, {}),
    ("efficientnet_b0", 64, {}),
    ("regnet_y_400mf", 64, {}),
]


@pytest.fixture(scope="module", params=BACKBONES, ids=lambda p: p[0])
def built(request):
    name, size, kwargs = request.param
    model = create_backbone(name, **kwargs)
    variables = model.init_variables(0, size)
    return name, size, model, variables


class TestBackbones:
    def test_attributes(self, built):
        _, _, model, _ = built
        assert isinstance(model.out_channels_list, tuple)
        assert all(isinstance(c, int) for c in model.out_channels_list)
        assert isinstance(model.stride, int)
        assert callable(model.get_feature_maps)

    def test_forward(self, built):
        _, size, model, variables = built
        x = jnp.zeros((1, size, size, 3))
        out = model.apply(variables, x)
        # conv backbones return the last 4D map; swin/convnext return the
        # pooled+normed embedding (matching reference swin.py:183-184,
        # convnext.py:109-110)
        if out.ndim == 4:
            assert out.shape[1] == size // model.stride
        else:
            assert out.ndim == 2
            assert out.shape[-1] == model.out_channels_list[-1]

    def test_get_feature_maps(self, built):
        _, size, model, variables = built
        x = jnp.zeros((1, size, size, 3))
        feats = model.apply(variables, x, method="get_feature_maps")
        assert len(feats) == len(model.out_channels_list)
        for f, c in zip(feats, model.out_channels_list):
            assert f.ndim == 4
            assert f.shape[-1] == c

    def test_jit(self, built):
        _, size, model, variables = built
        x = jnp.zeros((1, size, size, 3))
        out = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
        assert out.shape[0] == 1


TOKEN_MODELS = [
    ("vit_s_16", 32, 384),
    ("deit_s_16", 32, 384),
    ("deit3_s_16", 32, 384),
    ("cait_xxs_24", 32, 192),
    ("mixer_s_16", 32, 512),
    ("patchconvnet_s", 32, 384),
]


@pytest.mark.parametrize("name,size,d_model", TOKEN_MODELS, ids=[t[0] for t in TOKEN_MODELS])
def test_token_model_forward_and_jit(name, size, d_model):
    kwargs = {"img_size": size} if not name.startswith("patchconvnet") else {"depth": 2}
    model = create_backbone(name, **kwargs)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, size, size, 3)), train=False)
    out = jax.jit(lambda v, x: model.apply(v, x))(variables, jnp.zeros((2, size, size, 3)))
    assert out.shape == (2, d_model)


def test_registry_unknown():
    with pytest.raises(KeyError):
        create_backbone("not_a_model")


def test_train_mode_updates_batch_stats():
    model = create_backbone("darknet19")
    variables = model.init_variables(0, 64)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    out, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    # running stats must actually move
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(float(jnp.abs(a - b).max()) > 0 for a, b in zip(old, new))
