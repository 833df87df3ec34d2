"""Transformer building blocks: MHA, MLP, ViTBlock, MHAPooling.

Capability parity with reference vit.py:18-108, re-laid-out for TPU:
separate q/k/v/out projections (checkpoint-compatible with both the Flax
layout and the torch qkv-chunk layout), (B, T, N, H) attention, exact-erf
GELU, pre-LN blocks with optional LayerScale and StochasticDepth.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention
from .layers import LayerScale, Linear, StochasticDepth, _gelu_exact

Dtype = Any


class MHA(nn.Module):
    """Multi-head attention with separate q/k/v/out projections (ref vit.py:18-48)."""

    d_model: int
    n_heads: int
    bias: bool = True
    dropout: float = 0.0
    dtype: Dtype | None = None

    def _split(self, x: jax.Array) -> jax.Array:
        return x.reshape(*x.shape[:-1], self.n_heads, -1)

    @nn.compact
    def __call__(
        self,
        q: jax.Array,
        k: jax.Array | None = None,
        v: jax.Array | None = None,
        *,
        attn_bias: jax.Array | None = None,
        train: bool = False,
    ) -> jax.Array:
        k = q if k is None else k
        v = k if v is None else v
        from .initializers import torch_default_bias, torch_default_kernel

        dense = lambda name: nn.Dense(
            self.d_model, use_bias=self.bias, dtype=self.dtype,
            kernel_init=torch_default_kernel,
            bias_init=torch_default_bias(q.shape[-1]), name=name,
        )
        qh = self._split(dense("q_proj")(q))
        kh = self._split(dense("k_proj")(k))
        vh = self._split(dense("v_proj")(v))
        drop_rng = None
        if self.dropout > 0 and train:
            drop_rng = self.make_rng("dropout")
        out = dot_product_attention(
            qh, kh, vh, bias=attn_bias,
            dropout_rate=self.dropout if train else 0.0, dropout_rng=drop_rng,
        )
        out = out.reshape(*out.shape[:-2], self.d_model)
        return dense("out_proj")(out)


class MLP(nn.Module):
    """linear1 → GELU → linear2 → dropout (ref vit.py:51-57)."""

    hidden_dim: int
    dropout: float = 0.0
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_dim = x.shape[-1]
        x = Linear(self.hidden_dim, dtype=self.dtype, name="linear1")(x)
        x = _gelu_exact(x)
        x = Linear(in_dim, dtype=self.dtype, name="linear2")(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class ViTBlock(nn.Module):
    """Pre-LN transformer block with optional LayerScale + StochasticDepth and
    a pluggable attention module (ref vit.py:60-92)."""

    d_model: int
    n_heads: int
    bias: bool = True
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    layer_scale_init: float | None = None
    stochastic_depth: float = 0.0
    norm_eps: float = 1e-6
    attention: Callable[..., nn.Module] | None = None
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        attn_cls = self.attention
        if attn_cls is None:
            attn_cls = lambda name: MHA(
                self.d_model, self.n_heads, self.bias, self.dropout,
                dtype=self.dtype, name=name,
            )
        y = nn.LayerNorm(self.norm_eps, dtype=self.dtype, name="mha_norm")(x)
        y = attn_cls(name="mha")(y, train=train)
        if self.layer_scale_init is not None:
            y = LayerScale(self.layer_scale_init, name="mha_scale")(y)
        y = StochasticDepth(self.stochastic_depth, name="mha_droppath")(y, train=train)
        x = x + y

        y = nn.LayerNorm(self.norm_eps, dtype=self.dtype, name="mlp_norm")(x)
        y = MLP(int(self.d_model * self.mlp_ratio), self.dropout, dtype=self.dtype, name="mlp")(y, train=train)
        if self.layer_scale_init is not None:
            y = LayerScale(self.layer_scale_init, name="mlp_scale")(y)
        y = StochasticDepth(self.stochastic_depth, name="mlp_droppath")(y, train=train)
        return x + y


class MHAPooling(nn.Module):
    """SigLIP MAP head: learned probe attends over tokens (ref vit.py:95-108)."""

    d_model: int
    n_heads: int
    bias: bool = True
    mlp_ratio: float = 4.0
    norm_eps: float = 1e-6
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        probe = self.param("probe", nn.initializers.zeros, (1, 1, self.d_model))
        probe = jnp.broadcast_to(probe, (x.shape[0], 1, self.d_model)).astype(x.dtype)
        out = MHA(self.d_model, self.n_heads, self.bias, dtype=self.dtype, name="mha")(
            probe, x, train=train
        )[:, 0]
        y = nn.LayerNorm(self.norm_eps, dtype=self.dtype, name="norm")(out)
        out = out + MLP(int(self.d_model * self.mlp_ratio), dtype=self.dtype, name="mlp")(y, train=train)
        return out
