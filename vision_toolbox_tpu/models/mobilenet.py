"""MobileNetV3 large/small — native replacement for the reference's
torchvision MobileNetExtractor (torchvision_models.py:34-45). Feature taps
follow the reference convention: the expansion 1×1 conv output of each
strided MBConv plus the final conv (README.md:191)."""

from __future__ import annotations

from typing import Any

import jax
from flax import linen as nn

from ..nn.layers import ConvNormAct
from .base import Backbone, register_model
from .mbconv import MBConv, make_divisible

# (kernel, expanded, out, use_se, act, stride) — MobileNetV3 paper Tables 1/2
_LARGE = [
    (3, 16, 16, False, "relu", 1),
    (3, 64, 24, False, "relu", 2),
    (3, 72, 24, False, "relu", 1),
    (5, 72, 40, True, "relu", 2),
    (5, 120, 40, True, "relu", 1),
    (5, 120, 40, True, "relu", 1),
    (3, 240, 80, False, "hardswish", 2),
    (3, 200, 80, False, "hardswish", 1),
    (3, 184, 80, False, "hardswish", 1),
    (3, 184, 80, False, "hardswish", 1),
    (3, 480, 112, True, "hardswish", 1),
    (3, 672, 112, True, "hardswish", 1),
    (5, 672, 160, True, "hardswish", 2),
    (5, 960, 160, True, "hardswish", 1),
    (5, 960, 160, True, "hardswish", 1),
]
_SMALL = [
    (3, 16, 16, True, "relu", 2),
    (3, 72, 24, False, "relu", 2),
    (3, 88, 24, False, "relu", 1),
    (5, 96, 40, True, "hardswish", 2),
    (5, 240, 40, True, "hardswish", 1),
    (5, 240, 40, True, "hardswish", 1),
    (5, 120, 48, True, "hardswish", 1),
    (5, 144, 48, True, "hardswish", 1),
    (5, 288, 96, True, "hardswish", 2),
    (5, 576, 96, True, "hardswish", 1),
    (5, 576, 96, True, "hardswish", 1),
]


class MobileNetV3(Backbone):
    config: tuple = tuple(tuple(c) for c in _LARGE)
    last_channels: int = 960
    dtype: Any = None

    @property
    def out_channels_list(self) -> tuple[int, ...]:
        taps = [cfg[1] for cfg in self.config if cfg[5] == 2]
        return tuple(taps) + (self.last_channels,)

    @property
    def stride(self) -> int:
        return 32

    @nn.compact
    def get_feature_maps(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        norm_kw = dict(norm_eps=1e-3, norm_momentum=0.99, dtype=self.dtype)
        x = ConvNormAct(16, 3, 2, act="hardswish", name="stem", **norm_kw)(x, train=train)
        outputs = []
        for i, (k, exp, out, se, act, stride) in enumerate(self.config):
            se_ch = make_divisible(exp // 4) if se else None
            block = MBConv(
                exp, out, k, stride, se_channels=se_ch, act=act,
                se_act="relu", se_gate="hardsigmoid", dtype=self.dtype, name=f"block_{i}",
            )
            if stride == 2:
                x, expanded = block(x, train=train, tap_expansion=True)
                outputs.append(expanded)
            else:
                x = block(x, train=train)
        x = ConvNormAct(self.last_channels, 1, act="hardswish", name="last_conv", **norm_kw)(x, train=train)
        outputs.append(x)
        return outputs


def mobilenet_from_config(variant: str, **kwargs: Any) -> MobileNetV3:
    if variant == "large":
        return MobileNetV3(config=tuple(tuple(c) for c in _LARGE), last_channels=960, **kwargs)
    return MobileNetV3(config=tuple(tuple(c) for c in _SMALL), last_channels=576, **kwargs)


register_model("mobilenet_v3_large")(lambda **kw: mobilenet_from_config("large", **kw))
register_model("mobilenet_v3_small")(lambda **kw: mobilenet_from_config("small", **kw))
