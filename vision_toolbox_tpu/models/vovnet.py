"""VoVNet V1/V2 (One-Shot Aggregation networks).

Capability parity with reference backbones/vovnet.py:
  * OSABlock = n chained 3×3 convs, concat of ALL intermediate outputs + input,
    1×1 project, optional eSE gate, residual when in==out (ref vovnet.py:31-63)
  * 3-conv stem, first conv stride 2 (ref vovnet.py:84-88)
  * stage = 3×3/2 maxpool + OSA blocks (ref vovnet.py:92-98)
  * variants 19/27/39/57/99 × slim × ese (ref vovnet.py:107-118)

TPU notes: the big OSA concat feeds a 1×1 conv — on TPU this lowers to a
single MXU matmul over the concatenated channel dim; XLA fuses the concat
into the matmul operand so intermediates never round-trip HBM separately.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import ConvNormAct, ESEBlock, max_pool_torch
from .base import Backbone, register_model


class OSABlock(nn.Module):
    mid_channels: int
    num_layers: int
    out_channels: int
    ese: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_channels = x.shape[-1]
        outputs = [x]
        y = x
        for i in range(self.num_layers):
            y = ConvNormAct(self.mid_channels, 3, dtype=self.dtype, name=f"conv_{i}")(y, train=train)
            outputs.append(y)
        out = jnp.concatenate(outputs, axis=-1)
        out = ConvNormAct(self.out_channels, 1, dtype=self.dtype, name="out_conv")(out, train=train)
        if self.ese:
            out = ESEBlock(dtype=self.dtype, name="ese")(out)
        if in_channels == self.out_channels:
            out = out + x
        return out


class VoVNet(Backbone):
    stem_channels: int
    # (n_blocks, mid_channels, n_layers, out_channels) per stage, ref vovnet.py:66-70
    stage_configs: tuple[tuple[int, int, int, int], ...]
    ese: bool = True
    dtype: Any = None

    @property
    def out_channels_list(self) -> tuple[int, ...]:
        return (self.stem_channels,) + tuple(cfg[3] for cfg in self.stage_configs)

    @property
    def stride(self) -> int:
        return 2 ** len(self.out_channels_list)

    @nn.compact
    def get_feature_maps(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        half = self.stem_channels // 2
        x = ConvNormAct(half, 3, stride=2, dtype=self.dtype, name="stem_0")(x, train=train)
        x = ConvNormAct(half, 3, dtype=self.dtype, name="stem_1")(x, train=train)
        x = ConvNormAct(self.stem_channels, 3, dtype=self.dtype, name="stem_2")(x, train=train)
        outputs = [x]
        for i, (n_blocks, mid_ch, n_layers, out_ch) in enumerate(self.stage_configs):
            x = max_pool_torch(x, 3, 2, 1)
            for j in range(n_blocks):
                x = OSABlock(
                    mid_ch, n_layers, out_ch, ese=self.ese,
                    dtype=self.dtype, name=f"stage_{i}_block_{j}",
                )(x, train=train)
            outputs.append(x)
        return outputs


# ref vovnet.py:107-117
_VOVNET_TABLES = {
    19: ((1, 1, 1, 1), (3, 3, 3, 3)),
    27: ((1, 1, 1, 1), (5, 5, 5, 5)),
    39: ((1, 1, 2, 2), (5, 5, 5, 5)),
    57: ((1, 1, 4, 3), (5, 5, 5, 5)),
    99: ((1, 3, 9, 3), (5, 5, 5, 5)),
}


def vovnet_from_config(variant: int, slim: bool = False, ese: bool = False, **kwargs: Any) -> VoVNet:
    mid_channels_list = (64, 80, 96, 112) if slim else (128, 160, 192, 224)
    out_channels_list = (128, 256, 384, 512) if slim else (256, 512, 768, 1024)
    n_blocks_list, n_layers_list = _VOVNET_TABLES[variant]
    stage_configs = tuple(zip(n_blocks_list, mid_channels_list, n_layers_list, out_channels_list))
    return VoVNet(stem_channels=128, stage_configs=stage_configs, ese=ese, **kwargs)


for _variant, _slim, _ese in [
    (19, True, True), (19, False, True),
    (27, True, False),
    (39, False, False), (39, False, True),
    (57, False, False), (57, False, True),
    (99, False, True),
]:
    _name = f"vovnet{_variant}" + ("_slim" if _slim else "") + ("_ese" if _ese else "")
    register_model(_name)(
        lambda variant=_variant, slim=_slim, ese=_ese, **kw: vovnet_from_config(
            variant, slim=slim, ese=ese, **kw
        )
    )
