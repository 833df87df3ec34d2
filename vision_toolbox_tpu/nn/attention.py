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

# Apply-time fusion of the self-attention q/k/v projections into one (D, 3D)
# matmul. Param trees are identical either way (separate q/k/v names); this
# only changes the computation.
#
# MEASURED NEGATIVE on v5e (round 3, same-process A/B/A, bs128@224 train):
#   deit3_s_16: fused 50.0 ms/step vs separate 47.4 (-5%)
#   vit_b_16:   fused 126.2 ms/step vs separate 117.2 (-7%)
# The three (25216, D) x (D, D) matmuls already saturate the MXU, so the
# single (D, 3D) matmul wins nothing, while the per-step kernel concat and
# the (B, T, 3D) -> 3x(B, T, D) split add pure layout traffic (the packed
# short-attention kernel's operands stop being free reshapes of their
# producing matmuls). Kept behind this flag as an honest negative.
FUSE_SELF_ATTENTION_QKV = False


class _Proj(nn.Module):
    """Param-only projection: declares <name>/{kernel,bias} exactly like
    ``nn.Dense`` (same init, same RNG stream) but returns the raw params so
    the caller can fuse several projections into one matmul."""

    in_dim: int
    out_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self) -> tuple[jax.Array, jax.Array | None]:
        from .initializers import torch_default_bias, torch_default_kernel

        kernel = self.param("kernel", torch_default_kernel, (self.in_dim, self.out_dim))
        bias = (
            self.param("bias", torch_default_bias(self.in_dim), (self.out_dim,))
            if self.use_bias
            else None
        )
        return kernel, bias


class MHA(nn.Module):
    """Multi-head attention with separate q/k/v/out projections (ref vit.py:18-48).

    The param tree keeps the reference's separate q_proj/k_proj/v_proj names
    (the checkpoint interface for both the Flax layout and the torch
    qkv-chunk layout), but for self-attention ``__call__`` concatenates the
    kernels at apply time into one (D, 3D) matmul — one MXU pass over the
    activations instead of three skinny ones."""

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
        from flax.linen import dtypes

        from .initializers import torch_default_bias, torch_default_kernel

        self_attention = k is None and v is None and FUSE_SELF_ATTENTION_QKV
        k = q if k is None else k
        v = k if v is None else v

        if self_attention:
            qw, qb = _Proj(q.shape[-1], self.d_model, self.bias, name="q_proj")()
            kw, kb = _Proj(k.shape[-1], self.d_model, self.bias, name="k_proj")()
            vw, vb = _Proj(v.shape[-1], self.d_model, self.bias, name="v_proj")()
            w = jnp.concatenate([qw, kw, vw], axis=1)  # (D, 3D)
            b = jnp.concatenate([qb, kb, vb]) if self.bias else None
            x, w, b = dtypes.promote_dtype(q, w, b, dtype=self.dtype)
            qkv = x @ w + b if b is not None else x @ w
            qp, kp, vp = jnp.split(qkv, 3, axis=-1)
        else:
            # plain Dense projections (same scope names, params, and RNG
            # stream as _Proj) — also the interception point for the int8
            # serving path (utils/int8_serving.py)
            dense = lambda name, fan_in: nn.Dense(
                self.d_model, use_bias=self.bias, dtype=self.dtype,
                kernel_init=torch_default_kernel,
                bias_init=torch_default_bias(fan_in), name=name,
            )
            qp = dense("q_proj", q.shape[-1])(q)
            kp = dense("k_proj", k.shape[-1])(k)
            vp = dense("v_proj", v.shape[-1])(v)
        qh, kh, vh = self._split(qp), self._split(kp), self._split(vp)
        drop_rng = None
        if self.dropout > 0 and train:
            drop_rng = self.make_rng("dropout")
        out = dot_product_attention(
            qh, kh, vh, bias=attn_bias,
            dropout_rate=self.dropout if train else 0.0, dropout_rng=drop_rng,
        )
        out = out.reshape(*out.shape[:-2], self.d_model)
        from .initializers import torch_default_bias, torch_default_kernel

        return nn.Dense(
            self.d_model, use_bias=self.bias, dtype=self.dtype,
            kernel_init=torch_default_kernel,
            bias_init=torch_default_bias(self.d_model), name="out_proj",
        )(out)


class _LNParams(nn.Module):
    """Param-only LayerNorm: declares <name>/{scale,bias} exactly like
    ``nn.LayerNorm`` (same names, inits, RNG stream) for fused kernels."""

    dim: int

    @nn.compact
    def __call__(self) -> tuple[jax.Array, jax.Array]:
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


class _MLPParams(nn.Module):
    """Param-only twin of ``MLP``: same <name>/linear{1,2}/{kernel,bias}
    tree (Linear owns its params directly, so _Proj matches its layout)."""

    d_model: int
    hidden: int

    @nn.compact
    def __call__(self):
        w1, b1 = _Proj(self.d_model, self.hidden, name="linear1")()
        w2, b2 = _Proj(self.hidden, self.d_model, name="linear2")()
        return w1, b1, w2, b2


class _LSParams(nn.Module):
    """Param-only twin of ``LayerScale``."""

    dim: int
    init: float

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param("gamma", nn.initializers.constant(self.init), (self.dim,))


class _MHAParams(nn.Module):
    """Param-only twin of ``MHA``'s four projections (same scope names,
    shapes, inits, RNG stream) for the fused attention-block kernel."""

    d_model: int

    @nn.compact
    def __call__(self):
        wq, bq = _Proj(self.d_model, self.d_model, name="q_proj")()
        wk, bk = _Proj(self.d_model, self.d_model, name="k_proj")()
        wv, bv = _Proj(self.d_model, self.d_model, name="v_proj")()
        wo, bo = _Proj(self.d_model, self.d_model, name="out_proj")()
        return wq, bq, wk, bk, wv, bv, wo, bo


def fused_mlp_halfblock(
    x3d: jax.Array,
    d_model: int,
    hidden: int,
    *,
    norm_name: str,
    mlp_name: str | None = None,
    proj_names: tuple[str, str] | None = None,
    ls_init: float | None = None,
    ls_name: str | None = None,
    sd_rate: float = 0.0,
    sd_name: str | None = None,
    residual: jax.Array | None = None,
    eps: float,
    dtype,
    train: bool,
    group: int = 1,
):
    """Shared fused-MLP dispatch prologue for every model that routes its
    LN→MLP→GELU→(LS)→(drop-path)→residual half through ops/block_mlp.py
    (ViT/DeiT, Swin, ConvNeXt v1, Mixer channel mixing). Declares the
    param-only TWIN modules (same names, shapes, inits, and rng streams as
    the unfused flax modules — checkpoints are the interface), promotes
    dtypes, and calls the kernel. MUST run inside the parent module's
    compact ``__call__`` so the twins attach to its scope."""
    from flax.linen import dtypes

    from ..ops.block_mlp import fused_mlp_block

    lns, lnb = _LNParams(d_model, name=norm_name)()
    if mlp_name is not None:
        w1, b1, w2, b2 = _MLPParams(d_model, hidden, name=mlp_name)()
    else:
        w1, b1 = _Proj(d_model, hidden, name=proj_names[0])()
        w2, b2 = _Proj(hidden, d_model, name=proj_names[1])()
    ls = _LSParams(d_model, ls_init, name=ls_name)() if ls_init is not None else None
    dp = (
        StochasticDepth(sd_rate, name=sd_name).sample_scale(x3d.shape[0], train)
        if sd_name is not None
        else None
    )
    xb, res, lns, lnb, w1, b1, w2, b2 = dtypes.promote_dtype(
        x3d, x3d if residual is None else residual,
        lns, lnb, w1, b1, w2, b2, dtype=dtype,
    )
    if ls is not None:
        ls = ls.astype(xb.dtype)
    out = fused_mlp_block(
        xb, lns, lnb, w1, b1, w2, b2, ls, dp,
        residual=None if residual is None else res, eps=eps, group=group,
    )
    return out.astype(x3d.dtype)


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
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        *,
        attn_bias: jax.Array | None = None,
        force_unfused: bool = False,
    ) -> jax.Array:
        """``attn_bias`` broadcasts against (B, N, T, S) — used by the
        sequence-parallel pad-token mask (models/vit.py). ``force_unfused``
        keeps the whole block on XLA einsums/matmuls (GSPMD can partition
        those natively; an opaque pallas_call it can only replicate), set
        when the activations carry a sharding constraint."""
        from ..ops.block_attention import fused_attention_block, use_fused_attention

        if (
            self.attention is None
            and attn_bias is None
            and not force_unfused
            and x.ndim == 3
            and use_fused_attention(self.d_model, self.n_heads, x.shape[1], self.dropout, self.bias)
        ):
            # Fused LN→QKV→attention→out-proj→LayerScale→drop-path→residual
            # Pallas program (ops/block_attention.py); params identical to
            # the unfused branch below.
            from flax.linen import dtypes

            lns, lnb = _LNParams(self.d_model, name="mha_norm")()
            wq, bq, wk, bk, wv, bv, wo, bo = _MHAParams(self.d_model, name="mha")()
            ls = (
                _LSParams(self.d_model, self.layer_scale_init, name="mha_scale")()
                if self.layer_scale_init is not None
                else None
            )
            dp = StochasticDepth(self.stochastic_depth, name="mha_droppath").sample_scale(
                x.shape[0], train
            )
            xb, lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo = dtypes.promote_dtype(
                x, lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo, dtype=self.dtype
            )
            if ls is not None:
                ls = ls.astype(xb.dtype)
            x = fused_attention_block(
                xb, lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo,
                self.n_heads, ls, dp, eps=self.norm_eps,
            ).astype(x.dtype)
        else:
            attn_cls = self.attention
            if attn_cls is None:
                attn_cls = lambda name: MHA(
                    self.d_model, self.n_heads, self.bias, self.dropout,
                    dtype=self.dtype, name=name,
                )
            y = nn.LayerNorm(self.norm_eps, dtype=self.dtype, name="mha_norm")(x)
            # custom attention modules (e.g. CaiT class attention) may not
            # accept attn_bias — only thread it through when present
            akw = {} if attn_bias is None else {"attn_bias": attn_bias}
            y = attn_cls(name="mha")(y, train=train, **akw)
            if self.layer_scale_init is not None:
                y = LayerScale(self.layer_scale_init, name="mha_scale")(y)
            y = StochasticDepth(self.stochastic_depth, name="mha_droppath")(y, train=train)
            x = x + y

        hidden = int(self.d_model * self.mlp_ratio)
        from ..ops.block_mlp import fused_mlp_block, use_fused_mlp

        if (x.ndim == 3 and not force_unfused
                and use_fused_mlp(self.d_model, hidden, x.shape[1], self.dropout,
                                  has_ls=self.layer_scale_init is not None)):
            # Fused LN→W1→GELU→W2→LayerScale→drop-path→residual Pallas
            # program (ops/block_mlp.py); param tree identical to the
            # unfused branch below.
            return fused_mlp_halfblock(
                x, self.d_model, hidden,
                norm_name="mlp_norm", mlp_name="mlp",
                ls_init=self.layer_scale_init, ls_name="mlp_scale",
                sd_rate=self.stochastic_depth, sd_name="mlp_droppath",
                eps=self.norm_eps, dtype=self.dtype, train=train,
            )

        y = nn.LayerNorm(self.norm_eps, dtype=self.dtype, name="mlp_norm")(x)
        y = MLP(hidden, self.dropout, dtype=self.dtype, name="mlp")(y, train=train)
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
