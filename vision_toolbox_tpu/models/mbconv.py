"""Shared inverted-residual (MBConv) block for MobileNetV3 / EfficientNet —
the native replacement core for the reference's torchvision extractors
(torchvision_models.py:34-55)."""

from __future__ import annotations

from typing import Any

import jax
from flax import linen as nn

from ..nn.layers import ConvNormAct, SqueezeExcitation, StochasticDepth


def make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class MBConv(nn.Module):
    """expand 1×1 → depthwise k×k (stride) → SE → project 1×1 (linear),
    residual when stride 1 and channels match.

    ``tap_expansion``: also return the expansion-conv output — the feature
    the reference taps for detection (README.md:191, torchvision_models.py:43-45).
    """

    expanded_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    se_channels: int | None = None
    se_act: str = "relu"
    se_gate: str = "hardsigmoid"
    act: str = "hardswish"
    stochastic_depth: float = 0.0
    norm_eps: float = 1e-3  # torchvision mobilenet/efficientnet BN eps 0.001
    norm_momentum: float = 0.99  # ≡ torch momentum 0.01
    dtype: Any = None

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, tap_expansion: bool = False
    ):
        in_ch = x.shape[-1]
        norm_kw = dict(norm_eps=self.norm_eps, norm_momentum=self.norm_momentum, dtype=self.dtype)
        y = x
        if self.expanded_channels != in_ch:
            y = ConvNormAct(self.expanded_channels, 1, act=self.act, name="expand", **norm_kw)(y, train=train)
        expanded = y
        y = ConvNormAct(
            self.expanded_channels, self.kernel_size, self.stride,
            groups=self.expanded_channels, act=self.act, name="dwconv", **norm_kw,
        )(y, train=train)
        if self.se_channels:
            y = SqueezeExcitation(
                self.se_channels, act=self.se_act, gate=self.se_gate,
                dtype=self.dtype, name="se",
            )(y)
        y = ConvNormAct(self.out_channels, 1, act="none", name="project", **norm_kw)(y, train=train)
        if self.stride == 1 and in_ch == self.out_channels:
            y = StochasticDepth(self.stochastic_depth, name="droppath")(y, train=train)
            y = y + x
        if tap_expansion:
            return y, expanded
        return y
