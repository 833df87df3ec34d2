"""Darknet family: Darknet-19/53, CSPDarknet-53, YOLOv5 backbones.

Capability parity with reference backbones/darknet.py (variant tables at
darknet.py:91-96 and 124-133), re-designed NHWC/functional for TPU:
  * DarknetBlock = 1×1 reduce + 3×3 + residual (ref darknet.py:20-28)
  * DarknetStage = stride-2 conv + n blocks (ref darknet.py:31-36)
  * CSPDarknetStage = stride-2 conv, dual 1×1 split, blocks on one branch,
    concat, 1×1 out (ref darknet.py:39-55)
  * n_blocks == 0 stage degrades to a single stride-2 conv (ref darknet.py:79)

The CSP split/merge is written as two 1×1 convs from the same tensor followed
by a channel concat — XLA fuses the concat into the consumer 1×1 conv, so no
extra HBM round-trip materializes.
"""

from __future__ import annotations

from typing import Any

import jax
from flax import linen as nn
import jax.numpy as jnp

from ..nn.layers import ConvNormAct
from .base import Backbone, register_model


class DarknetBlock(nn.Module):
    expansion: float = 0.5
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_channels = x.shape[-1]
        mid = int(in_channels * self.expansion)
        y = ConvNormAct(mid, 1, dtype=self.dtype, name="conv1")(x, train=train)
        y = ConvNormAct(in_channels, 3, dtype=self.dtype, name="conv2")(y, train=train)
        return x + y


class DarknetStage(nn.Module):
    n_blocks: int
    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = ConvNormAct(self.out_channels, 3, stride=2, dtype=self.dtype, name="conv")(x, train=train)
        for i in range(self.n_blocks):
            x = DarknetBlock(dtype=self.dtype, name=f"block_{i}")(x, train=train)
        return x


class CSPDarknetStage(nn.Module):
    n_blocks: int
    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        assert self.n_blocks > 0
        x = ConvNormAct(self.out_channels, 3, stride=2, dtype=self.dtype, name="conv")(x, train=train)
        half = self.out_channels // 2
        a = ConvNormAct(half, 1, dtype=self.dtype, name="conv1")(x, train=train)
        b = ConvNormAct(half, 1, dtype=self.dtype, name="conv2")(x, train=train)
        for i in range(self.n_blocks):
            b = DarknetBlock(expansion=1.0, dtype=self.dtype, name=f"block_{i}")(b, train=train)
        out = jnp.concatenate([a, b], axis=-1)
        out = ConvNormAct(self.out_channels, 1, dtype=self.dtype, name="out_conv")(out, train=train)
        return out


class Darknet(Backbone):
    """Darknet-19/53 and CSPDarknet-53 (ref darknet.py:63-100)."""

    stem_channels: int
    stage_configs: tuple[tuple[int, int], ...]  # (n_blocks, out_channels)
    csp: bool = False
    dtype: Any = None

    @property
    def out_channels_list(self) -> tuple[int, ...]:
        return tuple(cfg[1] for cfg in self.stage_configs)

    @property
    def stride(self) -> int:
        return 32

    @nn.compact
    def get_feature_maps(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        x = ConvNormAct(self.stem_channels, 3, dtype=self.dtype, name="stem")(x, train=train)
        outputs = []
        for i, (n_blocks, out_ch) in enumerate(self.stage_configs):
            if n_blocks == 0:
                x = ConvNormAct(out_ch, 3, stride=2, dtype=self.dtype, name=f"stage_{i}")(x, train=train)
            elif self.csp:
                x = CSPDarknetStage(n_blocks, out_ch, dtype=self.dtype, name=f"stage_{i}")(x, train=train)
            else:
                x = DarknetStage(n_blocks, out_ch, dtype=self.dtype, name=f"stage_{i}")(x, train=train)
            outputs.append(x)
        return outputs


class DarknetYOLOv5(Backbone):
    """YOLOv5 backbone without SPPF (ref darknet.py:103-137): 6×6/2 stem +
    4 CSP stages; feature maps include the stem output."""

    stem_channels: int
    stage_configs: tuple[tuple[int, int], ...]
    dtype: Any = None

    @property
    def out_channels_list(self) -> tuple[int, ...]:
        return (self.stem_channels,) + tuple(cfg[1] for cfg in self.stage_configs)

    @property
    def stride(self) -> int:
        return 2 ** len(self.out_channels_list)

    @nn.compact
    def get_feature_maps(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        x = ConvNormAct(self.stem_channels, 6, stride=2, dtype=self.dtype, name="stem")(x, train=train)
        outputs = [x]
        for i, (n_blocks, out_ch) in enumerate(self.stage_configs):
            x = CSPDarknetStage(n_blocks, out_ch, dtype=self.dtype, name=f"stage_{i}")(x, train=train)
            outputs.append(x)
        return outputs


_DARKNET_VARIANTS = {
    # ref darknet.py:91-95
    "darknet19": ((0, 1, 1, 2, 2), False),
    "darknet53": ((1, 2, 8, 8, 4), False),
    "cspdarknet53": ((1, 2, 8, 8, 4), True),
}

_YOLOV5_VARIANTS = {
    # ref darknet.py:124-130
    "n": (1 / 3, 1 / 4),
    "s": (1 / 3, 1 / 2),
    "m": (2 / 3, 3 / 4),
    "l": (1.0, 1.0),
    "x": (4 / 3, 5 / 4),
}


def darknet_from_config(variant: str, **kwargs: Any) -> Darknet:
    n_blocks_list, csp = _DARKNET_VARIANTS[variant]
    stage_configs = tuple(zip(n_blocks_list, (64, 128, 256, 512, 1024)))
    return Darknet(stem_channels=32, stage_configs=stage_configs, csp=csp, **kwargs)


def darknet_yolov5_from_config(variant: str, **kwargs: Any) -> DarknetYOLOv5:
    depth_scale, width_scale = _YOLOV5_VARIANTS[variant]
    stage_configs = tuple(
        (int(d * depth_scale), int(w * width_scale))
        for d, w in zip((3, 6, 9, 3), (128, 256, 512, 1024))
    )
    return DarknetYOLOv5(stem_channels=int(64 * width_scale), stage_configs=stage_configs, **kwargs)


for _v in _DARKNET_VARIANTS:
    register_model(_v)(lambda variant=_v, **kw: darknet_from_config(variant, **kw))
for _v in _YOLOV5_VARIANTS:
    register_model(f"darknet_yolov5{_v}")(
        lambda variant=_v, **kw: darknet_yolov5_from_config(variant, **kw)
    )
