"""CaiT — class-attention image transformer (reference backbones/cait.py).

* TalkingHeadAttention: learnable 1×1 mixing across heads before and after
  softmax (ref cait.py:32-51) — no flash path by construction; on TPU the
  head-mix is a small matmul over the heads axis that XLA fuses with the
  softmax chain.
* ClassAttention: query is the cls token only (ref cait.py:16-28).
* Body: sa_depth self-attention blocks over patches, then ca_depth (=2)
  class-attention blocks updating only the cls token (ref cait.py:136-143).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.attention import ViTBlock
from ..nn.initializers import torch_default_bias, torch_default_kernel
from .base import register_model


class TalkingHeadAttention(nn.Module):
    d_model: int
    n_heads: int
    bias: bool = True
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dense = lambda name: nn.Dense(
            self.d_model, use_bias=self.bias, dtype=self.dtype,
            kernel_init=torch_default_kernel, bias_init=torch_default_bias(x.shape[-1]),
            name=name,
        )
        head_dim = self.d_model // self.n_heads
        scale = head_dim**-0.5
        qp = dense("q_proj")(x)
        kp = dense("k_proj")(x)
        vp = dense("v_proj")(x)
        mix = lambda name: self.param(name, torch_default_kernel, (self.n_heads, self.n_heads))
        mix_b = lambda name: self.param(name, torch_default_bias(self.n_heads), (self.n_heads,))
        ml, mlb = mix("proj_l_kernel"), mix_b("proj_l_bias")
        mw, mwb = mix("proj_w_kernel"), mix_b("proj_w_bias")

        from ..ops.cait_attention import talking_head_attention, use_talking_head_kernel

        T = x.shape[-2]
        if not (self.dropout > 0 and train) and use_talking_head_kernel(T, T, self.n_heads):
            # fused Pallas kernel: all heads' (T, S) score matrices + both
            # head-mixes stay in VMEM (ops/cait_attention.py)
            out = talking_head_attention(qp, kp, vp, ml, mlb, mw, mwb)
            return dense("out_proj")(out)

        q = qp.reshape(*x.shape[:-1], self.n_heads, head_dim)
        k = kp.reshape(*x.shape[:-1], self.n_heads, head_dim)
        v = vp.reshape(*x.shape[:-1], self.n_heads, head_dim)
        # (B, H, Q, K) logits; head-mixing projections are (H, H) matmuls
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k * scale)
        logits = jnp.einsum("bhqk,gh->bgqk", logits, ml) + mlb[None, :, None, None]
        probs = jax.nn.softmax(logits, axis=-1)
        probs = jnp.einsum("bhqk,gh->bgqk", probs, mw) + mwb[None, :, None, None]
        if self.dropout > 0 and train:
            keep = jax.random.bernoulli(self.make_rng("dropout"), 1.0 - self.dropout, probs.shape)
            probs = probs * keep / (1.0 - self.dropout)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(*x.shape[:-1], self.d_model)
        return dense("out_proj")(out)


class ClassAttention(nn.Module):
    """Attention pooling: query = cls token (first token) only (ref cait.py:16-28)."""

    d_model: int
    n_heads: int
    bias: bool = True
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dense = lambda name: nn.Dense(
            self.d_model, use_bias=self.bias, dtype=self.dtype,
            kernel_init=torch_default_kernel, bias_init=torch_default_bias(x.shape[-1]),
            name=name,
        )
        head_dim = self.d_model // self.n_heads
        B = x.shape[0]
        q = dense("q_proj")(x[:, :1]).reshape(B, 1, self.n_heads, head_dim)
        k = dense("k_proj")(x).reshape(B, -1, self.n_heads, head_dim)
        v = dense("v_proj")(x).reshape(B, -1, self.n_heads, head_dim)
        out = jax.nn.dot_product_attention(q, k, v)
        return dense("out_proj")(out.reshape(B, 1, self.d_model))


class CaiT(nn.Module):
    d_model: int
    sa_depth: int
    ca_depth: int
    n_heads: int
    patch_size: int
    img_size: int
    bias: bool = True
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    layer_scale_init: float | None = 1e-6
    stochastic_depth: float = 0.0
    norm_eps: float = 1e-6
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        p = self.patch_size
        x = nn.Conv(
            self.d_model, (p, p), strides=(p, p), padding="VALID",
            kernel_init=torch_default_kernel, bias_init=torch_default_bias(3 * p * p),
            dtype=self.dtype, name="patch_embed",
        )(x)
        B = x.shape[0]
        patches = x.reshape(B, -1, self.d_model)
        n_tokens = (self.img_size // self.patch_size) ** 2
        pe = self.param("pe", nn.initializers.normal(0.02), (1, n_tokens, self.d_model))
        patches = patches + pe.astype(patches.dtype)

        common = dict(
            bias=self.bias, mlp_ratio=self.mlp_ratio, dropout=self.dropout,
            layer_scale_init=self.layer_scale_init,
            stochastic_depth=self.stochastic_depth, norm_eps=self.norm_eps,
            dtype=self.dtype,
        )
        for i in range(self.sa_depth):
            patches = ViTBlock(
                self.d_model, self.n_heads,
                attention=lambda name: TalkingHeadAttention(
                    self.d_model, self.n_heads, self.bias, self.dropout,
                    dtype=self.dtype, name=name,
                ),
                name=f"sa_block_{i}", **common,
            )(patches, train=train)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.d_model))
        cls = jnp.broadcast_to(cls, (B, 1, self.d_model)).astype(patches.dtype)
        for i in range(self.ca_depth):
            cls = CaiTCABlock(
                self.d_model, self.n_heads, name=f"ca_block_{i}", **common
            )(patches, cls, train=train)

        return nn.LayerNorm(self.norm_eps, dtype=self.dtype, name="norm")(cls[:, 0])

    def init_variables(self, rng=0, img_size: int | None = None, dtype=None):
        """Initialize parameters with a dummy NHWC batch (Backbone contract)."""
        import jax as _jax
        import jax.numpy as _jnp

        if isinstance(rng, int):
            rng = _jax.random.PRNGKey(rng)
        size = img_size or self.img_size
        dummy = _jnp.zeros((1, size, size, 3), dtype or _jnp.float32)
        return self.init({"params": rng}, dummy, train=False)

    @property
    def last_out_channels(self) -> int:
        return self.d_model


class CaiTCABlock(nn.Module):
    """Class-attention block: mha over cat(cls, patches) updates the cls token
    only; the MLP runs on the cls token only (ref cait.py:54-77)."""

    d_model: int
    n_heads: int
    bias: bool = True
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    layer_scale_init: float | None = 1e-6
    stochastic_depth: float = 0.0
    norm_eps: float = 1e-6
    dtype: Any = None

    @nn.compact
    def __call__(self, patches: jax.Array, cls: jax.Array, train: bool = False) -> jax.Array:
        from ..nn.layers import LayerScale, StochasticDepth

        tokens = jnp.concatenate([cls, patches], axis=1)
        y = nn.LayerNorm(self.norm_eps, dtype=self.dtype, name="mha_norm")(tokens)
        y = ClassAttention(
            self.d_model, self.n_heads, self.bias, self.dropout, dtype=self.dtype, name="mha"
        )(y, train=train)
        if self.layer_scale_init is not None:
            y = LayerScale(self.layer_scale_init, name="mha_scale")(y)
        y = StochasticDepth(self.stochastic_depth, name="mha_droppath")(y, train=train)
        cls = cls + y

        y = nn.LayerNorm(self.norm_eps, dtype=self.dtype, name="mlp_norm")(cls)
        from ..nn.attention import MLP

        y = MLP(int(self.d_model * self.mlp_ratio), self.dropout, dtype=self.dtype, name="mlp")(y, train=train)
        if self.layer_scale_init is not None:
            y = LayerScale(self.layer_scale_init, name="mlp_scale")(y)
        y = StochasticDepth(self.stochastic_depth, name="mlp_droppath")(y, train=train)
        return cls + y


_CAIT_DMODEL = {"xxs": 192, "xs": 288, "s": 384, "m": 768}


def cait_from_config(variant: str, img_size: int = 224, **kwargs: Any) -> CaiT:
    name, sa_depth = variant.split("_")
    d_model = _CAIT_DMODEL[name]
    return CaiT(
        d_model=d_model, sa_depth=int(sa_depth), ca_depth=2,
        n_heads=d_model // 48, patch_size=16, img_size=img_size, **kwargs,
    )


for _v in ("xxs_24", "xxs_36", "xs_24", "s_24", "s_36", "m_36", "m_48"):
    register_model(f"cait_{_v}")(
        lambda variant=_v, img_size=224, **kw: cait_from_config(variant, img_size, **kw)
    )
