"""ResNet family — native replacement for the reference's torchvision
ResNetExtractor (torchvision_models.py:21-31 wraps create_feature_extractor
over torchvision ResNet; here the architecture is implemented directly,
NHWC, same stage taps: layer1..layer4 outputs at strides 4/8/16/32).
"""

from __future__ import annotations

from typing import Any

import jax
from flax import linen as nn

from ..nn.layers import ConvNormAct, max_pool_torch
from .base import Backbone, register_model


class BasicBlock(nn.Module):
    out_channels: int
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        identity = x
        y = ConvNormAct(self.out_channels, 3, self.stride, dtype=self.dtype, name="conv1")(x, train=train)
        y = ConvNormAct(self.out_channels, 3, act="none", dtype=self.dtype, name="conv2")(y, train=train)
        if self.stride != 1 or x.shape[-1] != self.out_channels:
            identity = ConvNormAct(
                self.out_channels, 1, self.stride, act="none", dtype=self.dtype, name="downsample"
            )(x, train=train)
        return jax.nn.relu(y + identity)


class Bottleneck(nn.Module):
    out_channels: int  # expanded (4× mid)
    stride: int = 1
    groups: int = 1
    width_per_group: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        mid = self.out_channels // 4
        width = int(mid * (self.width_per_group / 64.0)) * self.groups
        identity = x
        y = ConvNormAct(width, 1, dtype=self.dtype, name="conv1")(x, train=train)
        y = ConvNormAct(width, 3, self.stride, groups=self.groups, dtype=self.dtype, name="conv2")(y, train=train)
        y = ConvNormAct(self.out_channels, 1, act="none", dtype=self.dtype, name="conv3")(y, train=train)
        if self.stride != 1 or x.shape[-1] != self.out_channels:
            identity = ConvNormAct(
                self.out_channels, 1, self.stride, act="none", dtype=self.dtype, name="downsample"
            )(x, train=train)
        return jax.nn.relu(y + identity)


class ResNet(Backbone):
    depths: tuple[int, ...]
    bottleneck: bool = False
    groups: int = 1
    width_per_group: int = 64
    dtype: Any = None

    @property
    def out_channels_list(self) -> tuple[int, ...]:
        expansion = 4 if self.bottleneck else 1
        return tuple(64 * expansion * 2**i for i in range(len(self.depths)))

    @property
    def stride(self) -> int:
        return 4 * 2 ** (len(self.depths) - 1)

    @nn.compact
    def get_feature_maps(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        x = ConvNormAct(64, 7, 2, dtype=self.dtype, name="stem")(x, train=train)
        x = max_pool_torch(x, 3, 2, 1)
        outputs = []
        block_cls = Bottleneck if self.bottleneck else BasicBlock
        for i, depth in enumerate(self.depths):
            out_ch = self.out_channels_list[i]
            for j in range(depth):
                stride = 2 if (i > 0 and j == 0) else 1
                kwargs = dict(dtype=self.dtype)
                if self.bottleneck:
                    kwargs.update(groups=self.groups, width_per_group=self.width_per_group)
                x = block_cls(out_ch, stride, name=f"layer{i+1}_block{j}", **kwargs)(x, train=train)
            outputs.append(x)
        return outputs


_RESNET_VARIANTS = {
    "resnet18": ((2, 2, 2, 2), False, {}),
    "resnet34": ((3, 4, 6, 3), False, {}),
    "resnet50": ((3, 4, 6, 3), True, {}),
    "resnet101": ((3, 4, 23, 3), True, {}),
    "resnet152": ((3, 8, 36, 3), True, {}),
    "resnext50_32x4d": ((3, 4, 6, 3), True, {"groups": 32, "width_per_group": 4}),
    "resnext101_32x8d": ((3, 4, 23, 3), True, {"groups": 32, "width_per_group": 8}),
    "wide_resnet50_2": ((3, 4, 6, 3), True, {"width_per_group": 128}),
    "wide_resnet101_2": ((3, 4, 23, 3), True, {"width_per_group": 128}),
}


def resnet_from_config(variant: str, **kwargs: Any) -> ResNet:
    depths, bottleneck, extra = _RESNET_VARIANTS[variant]
    return ResNet(depths=depths, bottleneck=bottleneck, **extra, **kwargs)


for _v in _RESNET_VARIANTS:
    register_model(_v)(lambda variant=_v, **kw: resnet_from_config(variant, **kw))
