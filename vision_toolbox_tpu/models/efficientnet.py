"""EfficientNet B0–B7 — native replacement for the reference's torchvision
EfficientNetExtractor (torchvision_models.py:48-55). Width/depth compound
scaling with channel rounding to multiples of 8; SiLU activations, sigmoid
SE; feature taps = expansion conv of each strided MBConv + final 1×1 conv
(README.md:191)."""

from __future__ import annotations

import math
from typing import Any

import jax
from flax import linen as nn

from ..nn.layers import ConvNormAct
from .base import Backbone, register_model
from .mbconv import MBConv, make_divisible

# B0 stage table: (expand_ratio, kernel, stride, out_channels, num_layers)
_B0_STAGES = [
    (1, 3, 1, 16, 1),
    (6, 3, 2, 24, 2),
    (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3),
    (6, 5, 1, 112, 3),
    (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1),
]

# (width_mult, depth_mult)
_SCALING = {
    "b0": (1.0, 1.0), "b1": (1.0, 1.1), "b2": (1.1, 1.2), "b3": (1.2, 1.4),
    "b4": (1.4, 1.8), "b5": (1.6, 2.2), "b6": (1.8, 2.6), "b7": (2.0, 3.1),
}


class EfficientNet(Backbone):
    width_mult: float = 1.0
    depth_mult: float = 1.0
    stochastic_depth: float = 0.2
    dtype: Any = None

    def _stages(self):
        out = []
        for expand, k, s, ch, n in _B0_STAGES:
            out.append((expand, k, s, make_divisible(ch * self.width_mult),
                        int(math.ceil(n * self.depth_mult))))
        return out

    @property
    def out_channels_list(self) -> tuple[int, ...]:
        taps = []
        in_ch = make_divisible(32 * self.width_mult)
        for expand, _k, s, ch, _n in self._stages():
            if s == 2:
                taps.append(in_ch * expand if expand != 1 else in_ch)
            in_ch = ch
        last = make_divisible(1280 * self.width_mult) if self.width_mult > 1.0 else 1280
        return tuple(taps) + (last,)

    @property
    def stride(self) -> int:
        return 32

    @nn.compact
    def get_feature_maps(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        norm_kw = dict(norm_eps=1e-3, norm_momentum=0.99, dtype=self.dtype)
        stages = self._stages()
        total_blocks = sum(n for *_rest, n in stages)
        stem_ch = make_divisible(32 * self.width_mult)
        x = ConvNormAct(stem_ch, 3, 2, act="silu", name="stem", **norm_kw)(x, train=train)

        outputs = []
        block_idx = 0
        for si, (expand, k, s, ch, n) in enumerate(stages):
            for j in range(n):
                stride = s if j == 0 else 1
                in_ch = x.shape[-1]
                exp_ch = in_ch * expand
                se_ch = max(1, in_ch // 4)
                sd = self.stochastic_depth * block_idx / total_blocks
                block = MBConv(
                    exp_ch, ch, k, stride, se_channels=se_ch,
                    se_act="silu", se_gate="sigmoid", act="silu",
                    stochastic_depth=sd, dtype=self.dtype,
                    name=f"stage_{si}_block_{j}",
                )
                if stride == 2:
                    x, expanded = block(x, train=train, tap_expansion=True)
                    outputs.append(expanded)
                else:
                    x = block(x, train=train)
                block_idx += 1
        last = make_divisible(1280 * self.width_mult) if self.width_mult > 1.0 else 1280
        x = ConvNormAct(last, 1, act="silu", name="last_conv", **norm_kw)(x, train=train)
        outputs.append(x)
        return outputs


def efficientnet_from_config(variant: str, **kwargs: Any) -> EfficientNet:
    w, d = _SCALING[variant]
    return EfficientNet(width_mult=w, depth_mult=d, **kwargs)


for _v in _SCALING:
    register_model(f"efficientnet_{_v}")(
        lambda variant=_v, **kw: efficientnet_from_config(variant, **kw)
    )
