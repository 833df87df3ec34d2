"""PatchConvNet (reference backbones/patchconvnet.py).

4× conv3×3/2 GELU stem without bias (ref patchconvnet.py:124-133), BN or LN
trunk blocks with dwconv + SqueezeExcitation + layer-scale + drop-path
(ref 25-65), single-head attention-pooling head (ref 68-103). NHWC native —
the reference's Permute shims (ref 34,38,137-139) disappear. All conv/linear
weights use trunc-normal(0.02) init with zero bias (ref 143-151).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.attention import MLP
from ..nn.initializers import trunc_normal
from ..nn.layers import SqueezeExcitation, StochasticDepth, _gelu_exact
from .base import Backbone, register_model


def _conv(features, kernel, stride=1, groups=1, use_bias=True, name=None, dtype=None, pad=0):
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)], feature_group_count=groups,
        use_bias=use_bias, kernel_init=trunc_normal(0.02),
        bias_init=nn.initializers.zeros, dtype=dtype, name=name,
    )


def _linear(features, name=None, dtype=None):
    return nn.Dense(
        features, kernel_init=trunc_normal(0.02), bias_init=nn.initializers.zeros,
        dtype=dtype, name=name,
    )


class PatchConvBlock(nn.Module):
    """Trunk block; norm_type 'bn' (1×1 convs) or 'ln' (linears) — on NHWC the
    two reference layouts (ref patchconvnet.py:25-65) collapse into one block
    differing only in the norm layer and mixer type."""

    embed_dim: int
    drop_path: float = 0.3
    layer_scale_init: float = 1e-6
    norm_type: str = "bn"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.norm_type == "bn":
            y = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="norm",
            )(x)
        else:
            y = nn.LayerNorm(1e-6, dtype=self.dtype, name="norm")(x)
        y = _linear(self.embed_dim, name="mix1", dtype=self.dtype)(y)
        y = _gelu_exact(y)
        from ..nn.layers import DepthwiseConv

        y = DepthwiseConv(
            3, kernel_init=trunc_normal(0.02), bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="dwconv",
        )(y)
        y = _gelu_exact(y)
        y = SqueezeExcitation(self.embed_dim // 4, dtype=self.dtype, name="se")(y)
        y = _linear(self.embed_dim, name="mix2", dtype=self.dtype)(y)
        gamma = self.param("layer_scale", nn.initializers.constant(self.layer_scale_init), (self.embed_dim,))
        y = y * gamma.astype(y.dtype)
        y = StochasticDepth(self.drop_path, name="droppath")(y, train=train)
        return x + y


class AttentionPooling(nn.Module):
    """Single-head attention pooling with cls token (ref patchconvnet.py:68-103)."""

    embed_dim: int
    mlp_ratio: int = 3
    drop_path: float = 0.3
    layer_scale_init: float = 1e-6
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        d = self.embed_dim
        cls = self.param("cls_token", trunc_normal(0.02), (d,))
        B = x.shape[0]
        cls_tok = jnp.broadcast_to(cls, (B, 1, d)).astype(x.dtype)
        tokens = jnp.concatenate([cls_tok, x], axis=1)

        y = nn.LayerNorm(1e-5, dtype=self.dtype, name="norm1")(tokens)
        q = _linear(d, name="q_proj", dtype=self.dtype)(y[:, :1])
        k = _linear(d, name="k_proj", dtype=self.dtype)(y)
        v = _linear(d, name="v_proj", dtype=self.dtype)(y)
        out = jax.nn.dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        out = _linear(d, name="out_proj", dtype=self.dtype)(out)
        gamma1 = self.param("layer_scale_1", nn.initializers.constant(self.layer_scale_init), (d,))
        out = out * gamma1.astype(out.dtype)
        out = StochasticDepth(self.drop_path, name="droppath1")(out, train=train)
        cls_tok = cls_tok + out

        y = nn.LayerNorm(1e-5, dtype=self.dtype, name="norm2")(cls_tok)
        y = MLP(int(d * self.mlp_ratio), dtype=self.dtype, name="mlp")(y, train=train)
        gamma2 = self.param("layer_scale_2", nn.initializers.constant(self.layer_scale_init), (d,))
        y = y * gamma2.astype(y.dtype)
        y = StochasticDepth(self.drop_path, name="droppath2")(y, train=train)
        cls_tok = cls_tok + y

        return nn.LayerNorm(1e-5, dtype=self.dtype, name="norm3")(cls_tok)[:, 0]


class PatchConvNet(Backbone):
    embed_dim: int
    depth: int
    mlp_ratio: int = 3
    drop_path: float = 0.3
    layer_scale_init: float = 1e-6
    norm_type: str = "bn"
    dtype: Any = None

    @property
    def out_channels_list(self) -> tuple[int, ...]:
        return (self.embed_dim,)

    @property
    def stride(self) -> int:
        return 16

    @nn.compact
    def get_feature_maps(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        d = self.embed_dim
        for i, ch in enumerate((d // 8, d // 4, d // 2, d)):
            x = _conv(ch, 3, stride=2, pad=1, use_bias=False, name=f"stem_{i}", dtype=self.dtype)(x)
            if i < 3:
                x = _gelu_exact(x)
        for i in range(self.depth):
            x = PatchConvBlock(
                d, self.drop_path, self.layer_scale_init, self.norm_type,
                dtype=self.dtype, name=f"block_{i}",
            )(x, train=train)
        x = x.reshape(x.shape[0], -1, d)
        pooled = AttentionPooling(
            d, self.mlp_ratio, self.drop_path, self.layer_scale_init,
            dtype=self.dtype, name="pool",
        )(x, train=train)
        return [pooled]


def patchconvnet_from_config(variant: str, depth: int = 60, **kwargs: Any) -> PatchConvNet:
    embed_dim = {"S": 384, "B": 768, "L": 1024}[variant]
    return PatchConvNet(embed_dim=embed_dim, depth=depth, **kwargs)


for _v in ("S", "B", "L"):
    register_model(f"patchconvnet_{_v.lower()}")(
        lambda variant=_v, depth=60, **kw: patchconvnet_from_config(variant, depth, **kw)
    )
