"""Detection necks: FPN, PAN, BiFPN (reference necks.py).

* FPN: lateral 1×1 (identity when channels already match, ref necks.py:60-65),
  fuse ∈ {concat, sum, avg, max} (ref 36-41), nearest 2× upsample, output
  convs inside the top-down path; ``top_down=False`` flips to bottom-up with
  0.5× "upsample" (ref 66, 76-80).
* PAN: top-down FPN then bottom-up FPN (ref 92-120).
* BiFPN: per-level lateral 1×1 + stacked BiFPN layers with ReLU-normalized
  WeightedFeatureFusion (ref 125-215). The reference's default block
  (SeparableConv2d) is broken (components.py:62-72); ours works.

Feature maps are NHWC, ordered bottom (largest) → top (smallest).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.initializers import torch_default_bias, torch_default_kernel
from ..nn.layers import ConvNormAct, SeparableConv2d


def _fuse_fn(name: str) -> Callable[[list[jax.Array]], jax.Array]:
    if name == "concat":
        return lambda xs: jnp.concatenate(xs, axis=-1)
    if name == "sum":
        return lambda xs: sum(xs[1:], xs[0])
    if name == "avg":
        return lambda xs: sum(xs[1:], xs[0]) / len(xs)
    if name == "max":
        return lambda xs: jax.tree_util.tree_reduce(jnp.maximum, xs)
    raise ValueError(f"unknown fuse {name}")


def resize_nearest(x: jax.Array, scale: float) -> jax.Array:
    """nn.Upsample(scale_factor, mode="nearest") on NHWC."""
    B, H, W, C = x.shape
    nh, nw = int(H * scale), int(W * scale)
    return jax.image.resize(x, (B, nh, nw, C), method="nearest")


class _Lateral(nn.Module):
    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if x.shape[-1] == self.out_channels:
            return x
        return nn.Conv(
            self.out_channels, (1, 1),
            kernel_init=torch_default_kernel, bias_init=torch_default_bias(x.shape[-1]),
            dtype=self.dtype, name="conv",
        )(x)


class FPN(nn.Module):
    in_channels_list: tuple[int, ...]
    out_channels: int = 256
    fuse: str = "sum"
    block: str = "conv_norm_act"  # conv_norm_act | separable
    top_down: bool = True
    dtype: Any = None

    def _block(self, name: str) -> nn.Module:
        if self.block == "separable":
            return SeparableConv2d(self.out_channels, dtype=self.dtype, name=name)
        return ConvNormAct(self.out_channels, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, xs: list[jax.Array], train: bool = False) -> list[jax.Array]:
        assert len(xs) == len(self.in_channels_list)
        fuse = _fuse_fn(self.fuse)
        outputs = [
            _Lateral(self.out_channels, dtype=self.dtype, name=f"lateral_{i}")(x)
            for i, x in enumerate(xs)
        ]
        n = len(outputs)
        if self.top_down:
            for i in range(n - 1):
                up = resize_nearest(outputs[-1 - i], 2.0)
                outputs[-2 - i] = fuse([outputs[-2 - i], up])
                outputs[-2 - i] = self._block(f"out_conv_{i}")(outputs[-2 - i], train=train)
        else:
            for i in range(n - 1):
                down = resize_nearest(outputs[i], 0.5)
                outputs[i + 1] = fuse([outputs[i + 1], down])
                outputs[i + 1] = self._block(f"out_conv_{i}")(outputs[i + 1], train=train)
        return outputs


class PAN(nn.Module):
    in_channels_list: tuple[int, ...]
    out_channels: int = 256
    fuse: str = "sum"
    block: str = "conv_norm_act"
    dtype: Any = None

    @nn.compact
    def __call__(self, xs: list[jax.Array], train: bool = False) -> list[jax.Array]:
        xs = FPN(
            self.in_channels_list, self.out_channels, self.fuse, self.block,
            top_down=True, dtype=self.dtype, name="top_down",
        )(xs, train=train)
        xs = FPN(
            (self.out_channels,) * len(self.in_channels_list), self.out_channels,
            self.fuse, self.block, top_down=False, dtype=self.dtype, name="bottom_up",
        )(xs, train=train)
        return xs


class WeightedFeatureFusion(nn.Module):
    """ReLU-ed learnable scalar weights, normalized, then conv (ref necks.py:197-215)."""

    num_inputs: int = 2
    block: str = "separable"
    eps: float = 1e-4
    dtype: Any = None

    @nn.compact
    def __call__(self, xs: list[jax.Array], train: bool = False) -> jax.Array:
        assert len(xs) == self.num_inputs
        w = self.param("weights", nn.initializers.ones, (self.num_inputs,))
        w = jax.nn.relu(w)
        out = sum(x * w[i].astype(x.dtype) for i, x in enumerate(xs))
        out = out / (w.sum() + self.eps).astype(out.dtype)
        channels = xs[0].shape[-1]
        if self.block == "separable":
            return SeparableConv2d(channels, dtype=self.dtype, name="conv")(out, train=train)
        return ConvNormAct(channels, dtype=self.dtype, name="conv")(out, train=train)


class BiFPNLayer(nn.Module):
    """Top-down pass + bottom-up 3-input fusion + top-level 2-input fusion
    (ref necks.py:159-194)."""

    num_levels: int
    block: str = "separable"
    eps: float = 1e-4
    dtype: Any = None

    @nn.compact
    def __call__(self, xs: list[jax.Array], train: bool = False) -> list[jax.Array]:
        n = self.num_levels
        assert len(xs) == n
        tds = list(xs)
        for i in range(n - 1):
            tds[-2 - i] = WeightedFeatureFusion(
                2, self.block, self.eps, dtype=self.dtype, name=f"td_fuse_{i}"
            )([xs[-2 - i], resize_nearest(tds[-1 - i], 2.0)], train=train)

        outs = list(tds)
        for i in range(n - 2):
            outs[i + 1] = WeightedFeatureFusion(
                3, self.block, self.eps, dtype=self.dtype, name=f"out_fuse_{i}"
            )([xs[i + 1], tds[i + 1], resize_nearest(tds[i], 0.5)], train=train)

        outs[-1] = WeightedFeatureFusion(
            2, self.block, self.eps, dtype=self.dtype, name="last_out_fuse"
        )([xs[-1], resize_nearest(tds[-2], 0.5)], train=train)
        return outs


class BiFPN(nn.Module):
    in_channels_list: tuple[int, ...]
    out_channels: int = 64
    num_layers: int = 1
    block: str = "separable"
    eps: float = 1e-4
    dtype: Any = None

    @nn.compact
    def __call__(self, xs: list[jax.Array], train: bool = False) -> list[jax.Array]:
        assert len(xs) == len(self.in_channels_list)
        outputs = []
        for i, x in enumerate(xs):
            outputs.append(
                nn.Conv(
                    self.out_channels, (1, 1),
                    kernel_init=torch_default_kernel,
                    bias_init=torch_default_bias(x.shape[-1]),
                    dtype=self.dtype, name=f"lateral_{i}",
                )(x)
            )
        for i in range(self.num_layers):
            outputs = BiFPNLayer(
                len(xs), self.block, self.eps, dtype=self.dtype, name=f"layer_{i}"
            )(outputs, train=train)
        return outputs
