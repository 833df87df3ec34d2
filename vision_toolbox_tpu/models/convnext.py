"""ConvNeXt v1/v2 (reference backbones/convnext.py).

NHWC-native (the reference permutes in and out of NCHW around the dwconv,
convnext.py:45-47 — unnecessary on TPU). GlobalResponseNorm (v2) normalizes
the spatial L2 norm per channel (ref convnext.py:15-26). Stochastic-depth
rates are linearly spaced over all blocks (ref convnext.py:76,94-97).

Deviation from the reference (deliberate, SURVEY.md §2.1): the reference's
``get_feature_maps`` returns only the last stage (convnext.py:107), breaking
the multi-scale contract — here it returns all four stage outputs.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.initializers import torch_default_bias, torch_default_kernel
from ..nn.layers import LayerScale, Linear, StochasticDepth, _gelu_exact
from .base import Backbone, register_model


class GlobalResponseNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.zeros, (dim,))
        beta = self.param("beta", nn.initializers.zeros, (dim,))
        gx = jnp.sqrt(jnp.sum(jnp.square(x), axis=(1, 2), keepdims=True))  # (B,1,1,C)
        nx = gx / (gx.mean(axis=-1, keepdims=True) + self.eps)
        return x + x * nx * gamma.astype(x.dtype) + beta.astype(x.dtype)


class ConvNeXtBlock(nn.Module):
    d_model: int
    expansion_ratio: float = 4.0
    bias: bool = True
    layer_scale_init: float | None = 1e-6
    stochastic_depth: float = 0.0
    norm_eps: float = 1e-6
    v2: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        layer_scale_init = None if self.v2 else self.layer_scale_init
        hidden = int(self.d_model * self.expansion_ratio)
        from ..nn.layers import DepthwiseConv

        y = DepthwiseConv(
            7, use_bias=self.bias,
            kernel_init=torch_default_kernel, bias_init=torch_default_bias(49),
            dtype=self.dtype, name="dwconv",
        )(x)

        from ..nn.attention import fused_mlp_halfblock
        from ..ops.block_mlp import use_fused_mlp

        B, H, W, C = y.shape
        if (
            not self.v2  # GRN sits between GELU and pwconv2 — no fused form
            and self.bias
            and use_fused_mlp(self.d_model, hidden, H * W, 0.0,
                              has_res=True, has_ls=layer_scale_init is not None)
        ):
            # fused LN→pwconv1→GELU→pwconv2→(LS)→drop-path→residual Pallas
            # half-block on the flattened map (same kernel as the transformer
            # MLP half — the v1 block IS that structure, ref convnext.py:29-58
            # with the dwconv ahead of it); residual = the BLOCK input x,
            # passed as the kernel's separate-residual operand.
            out = fused_mlp_halfblock(
                y.reshape(B, H * W, C), self.d_model, hidden,
                norm_name="norm", proj_names=("pwconv1", "pwconv2"),
                ls_init=layer_scale_init, ls_name="layer_scale",
                sd_rate=self.stochastic_depth, sd_name="droppath",
                residual=x.reshape(B, H * W, C),
                eps=self.norm_eps, dtype=self.dtype, train=train,
                group=max(1, 256 // (H * W)),
            )
            return out.reshape(B, H, W, C)

        y = nn.LayerNorm(self.norm_eps, dtype=self.dtype, name="norm")(y)
        y = Linear(hidden, use_bias=self.bias, dtype=self.dtype, name="pwconv1")(y)
        y = _gelu_exact(y)
        if self.v2:
            y = GlobalResponseNorm(name="grn")(y)
        y = Linear(self.d_model, use_bias=self.bias, dtype=self.dtype, name="pwconv2")(y)
        if layer_scale_init is not None:
            y = LayerScale(layer_scale_init, name="layer_scale")(y)
        y = StochasticDepth(self.stochastic_depth, name="droppath")(y, train=train)
        return x + y


class ConvNeXt(Backbone):
    d_model: int
    depths: tuple[int, ...]
    expansion_ratio: float = 4.0
    bias: bool = True
    layer_scale_init: float | None = 1e-6
    stochastic_depth: float = 0.0
    norm_eps: float = 1e-6
    v2: bool = False
    dtype: Any = None

    @property
    def out_channels_list(self) -> tuple[int, ...]:
        return tuple(self.d_model * 2**i for i in range(len(self.depths)))

    @property
    def stride(self) -> int:
        return 4 * 2 ** (len(self.depths) - 1)

    def setup(self):
        self.stem_conv = nn.Conv(
            self.d_model, (4, 4), strides=(4, 4), padding="VALID",
            kernel_init=torch_default_kernel, bias_init=torch_default_bias(48),
            dtype=self.dtype, name="stem_conv",
        )
        self.stem_norm = nn.LayerNorm(self.norm_eps, dtype=self.dtype, name="stem_norm")

        rates = np.linspace(0, self.stochastic_depth, sum(self.depths))
        d = self.d_model
        ds_norms, ds_convs, stages = [], [], []
        for i, depth in enumerate(self.depths):
            if i > 0:
                ds_norms.append(nn.LayerNorm(self.norm_eps, dtype=self.dtype, name=f"downsample_norm_{i}"))
                d *= 2
                ds_convs.append(
                    nn.Conv(
                        d, (2, 2), strides=(2, 2), padding="VALID",
                        kernel_init=torch_default_kernel, bias_init=torch_default_bias(2 * d),
                        dtype=self.dtype, name=f"downsample_conv_{i}",
                    )
                )
            blocks = []
            for j in range(depth):
                rate = float(rates[sum(self.depths[:i]) + j])
                blocks.append(
                    ConvNeXtBlock(
                        d, self.expansion_ratio, self.bias, self.layer_scale_init,
                        rate, self.norm_eps, self.v2, dtype=self.dtype,
                        name=f"stage_{i}_block_{j}",
                    )
                )
            stages.append(blocks)
        self.ds_norms = ds_norms
        self.ds_convs = ds_convs
        self.stage_blocks = stages
        self.final_norm = nn.LayerNorm(self.norm_eps, dtype=self.dtype, name="norm")

    def get_feature_maps(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        x = self.stem_norm(self.stem_conv(x))
        outputs = []
        for i, blocks in enumerate(self.stage_blocks):
            if i > 0:
                x = self.ds_convs[i - 1](self.ds_norms[i - 1](x))
            for block in blocks:
                x = block(x, train=train)
            outputs.append(x)
        return outputs

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        out = self.get_feature_maps(x, train=train)[-1]
        return self.final_norm(out.mean(axis=(1, 2)))

    @property
    def last_out_channels(self) -> int:
        return self.out_channels_list[-1]


# ref convnext.py:114-124
_CONVNEXT_VARIANTS = {
    "A": (40, (2, 2, 6, 2)),
    "F": (48, (2, 2, 6, 2)),
    "P": (64, (2, 2, 6, 2)),
    "N": (80, (2, 2, 8, 2)),
    "T": (96, (3, 3, 9, 3)),
    "S": (96, (3, 3, 27, 3)),
    "B": (128, (3, 3, 27, 3)),
    "L": (192, (3, 3, 27, 3)),
    "XL": (256, (3, 3, 27, 3)),
    "H": (352, (3, 3, 27, 3)),
}


def convnext_from_config(variant: str, v2: bool = False, **kwargs: Any) -> ConvNeXt:
    d_model, depths = _CONVNEXT_VARIANTS[variant]
    return ConvNeXt(d_model=d_model, depths=depths, v2=v2, **kwargs)


for _v in _CONVNEXT_VARIANTS:
    register_model(f"convnext_{_v.lower()}")(
        lambda variant=_v, **kw: convnext_from_config(variant, v2=False, **kw)
    )
    register_model(f"convnextv2_{_v.lower()}")(
        lambda variant=_v, **kw: convnext_from_config(variant, v2=True, **kw)
    )
