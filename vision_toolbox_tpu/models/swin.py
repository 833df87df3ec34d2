"""Swin Transformer + AutoFormerV2-S3 variants (reference backbones/swin.py).

TPU-native design notes:
  * NHWC throughout (the reference is already NHWC internally).
  * Window partition = reshape/transpose, kept as (B, nW, w², ...) so the
    relative-PE bias + shift mask broadcast correctly for any batch size
    (the reference relies on torch SDPA mask broadcasting, swin.py:75-81).
  * The shift mask and relative-PE gather index are *static* numpy
    constants folded into the jaxpr at trace time — no device gathers of
    index tables at runtime beyond one bias lookup.
  * Cyclic shift = jnp.roll (lowers to two slices + concat, fused by XLA).
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.attention import MLP
from ..nn.initializers import torch_default_bias, torch_default_kernel, trunc_normal
from ..nn.layers import LayerScale, StochasticDepth
from .base import Backbone, register_model


def _relative_pe_index(window_size: int) -> np.ndarray:
    """(w², w²) gather index into the (2w-1)² relative-PE table (ref swin.py:67-69)."""
    w = window_size
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"), -1).reshape(-1, 2)
    diff = coords[:, None, :] - coords[None, :, :]
    return (diff[..., 0] + w - 1) * (2 * w - 1) + diff[..., 1] + w - 1


def _shift_attn_mask(input_size: int, window_size: int, shift: int) -> np.ndarray:
    """(nW, w², w²) additive mask: -100 between tokens from different image
    regions after the cyclic shift (ref swin.py:50-57)."""
    s = input_size
    img_mask = np.zeros((s, s), np.float32)
    slices = (slice(0, -window_size), slice(-window_size, -shift), slice(-shift, None))
    cnt = 0
    for hs in slices:
        for ws in slices:
            img_mask[hs, ws] = cnt
            cnt += 1
    nh = s // window_size
    windows = (
        img_mask.reshape(nh, window_size, nh, window_size)
        .transpose(0, 2, 1, 3)
        .reshape(nh * nh, window_size * window_size)
    )
    diff = windows[:, None, :] - windows[:, :, None]
    return (diff != 0).astype(np.float32) * -100.0


def window_partition(x: jax.Array, window_size: int) -> jax.Array:
    """(B, H, W, C) → (B, nW, w², C) (ref swin.py:16-21)."""
    B, H, W, C = x.shape
    if H % window_size or W % window_size:
        raise ValueError(
            f"feature map {H}x{W} not divisible by window {window_size}; "
            f"pick img_size so every stage grid divides its window size "
            f"(e.g. 224 for the default configs)"
        )
    nH, nW = H // window_size, W // window_size
    x = x.reshape(B, nH, window_size, nW, window_size, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, nH * nW, window_size * window_size, C)


def window_unpartition(x: jax.Array, window_size: int, nH: int, nW: int) -> jax.Array:
    B, _, _, C = x.shape
    x = x.reshape(B, nH, nW, window_size, window_size, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, nH * window_size, nW * window_size, C)


class WindowAttention(nn.Module):
    """Windowed MHA with relative position bias and optional cyclic shift
    (ref swin.py:32-86)."""

    input_size: int
    d_model: int
    n_heads: int
    window_size: int = 7
    shift: bool = False
    bias: bool = True
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        B, H, W, C = x.shape
        w = self.window_size
        shift = w // 2 if self.shift else 0

        table = self.param(
            "relative_pe_table", trunc_normal(0.02), (1, self.n_heads, (2 * w - 1) ** 2)
        )
        index = _relative_pe_index(w)  # static
        # (1, 1, n_heads, w², w²)
        attn_bias = table[:, None, :, :][..., index].astype(x.dtype)

        from ..ops.swin_relayout import (
            shifted_window_partition, shifted_window_unpartition, use_swin_relayout,
        )

        fused_relayout = use_swin_relayout(shift)
        interp = jax.default_backend() != "tpu"
        shift_mask = None
        if shift > 0:
            shift_mask = jnp.asarray(_shift_attn_mask(self.input_size, w, shift), x.dtype)
            attn_bias = attn_bias + shift_mask[None, :, None, :, :]  # (1, nW, 1, w², w²)
            if not fused_relayout:
                x = jnp.roll(x, (-shift, -shift), axis=(1, 2))

        if fused_relayout:
            # roll + partition in ONE pass (ops/swin_relayout.py)
            windows = shifted_window_partition(x, w, shift, interp)
        else:
            windows = window_partition(x, w)  # (B, nW, w², C)
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=self.bias, dtype=self.dtype,
            kernel_init=torch_default_kernel, bias_init=torch_default_bias(C),
            name=name,
        )
        head_dim = self.d_model // self.n_heads
        qp = dense(self.d_model, "q_proj")(windows)  # (B, nW, w², D) packed
        kp = dense(self.d_model, "k_proj")(windows)
        vp = dense(self.d_model, "v_proj")(windows)

        from ..ops.swin_attention import swin_window_attention, use_swin_kernel

        n_pairs = windows.shape[0] * windows.shape[1] * self.n_heads
        if use_swin_kernel(w * w, w * w, n_pairs, self.dropout, train):
            # fused Pallas path: whole (w², w²) score matrix in VMEM; the
            # learnable PE bias and the constant shift mask stay separate so
            # dPE is a tiny in-kernel reduction (ops/swin_attention.py)
            pe = table[..., index].astype(qp.dtype)  # (1, n_heads, w², w²)
            mask_k = None if shift_mask is None else shift_mask.astype(qp.dtype)
            out = swin_window_attention(qp, kp, vp, pe, mask_k, self.n_heads)
        else:
            shp = windows.shape[:-1] + (self.n_heads, head_dim)
            q = qp.reshape(shp)
            k = kp.reshape(shp)
            v = vp.reshape(shp)
            logits = jnp.einsum("bnqhd,bnkhd->bnhqk", q * (head_dim**-0.5), k)
            logits = logits + attn_bias
            probs = jax.nn.softmax(logits, axis=-1)
            if self.dropout > 0 and train:
                keep = jax.random.bernoulli(self.make_rng("dropout"), 1.0 - self.dropout, probs.shape)
                probs = probs * keep / (1.0 - self.dropout)
            out = jnp.einsum("bnhqk,bnkhd->bnqhd", probs, v)
            out = out.reshape(*windows.shape[:-1], self.d_model)
        out = dense(self.d_model, "out_proj")(out)

        if fused_relayout:
            return shifted_window_unpartition(out, w, shift, H, W, interp)
        out = window_unpartition(out, w, H // w, W // w)
        if shift > 0:
            out = jnp.roll(out, (shift, shift), axis=(1, 2))
        return out


class SwinBlock(nn.Module):
    """Pre-LN block on (B, H, W, C) with WindowAttention (ref swin.py:89-110)."""

    input_size: int
    d_model: int
    n_heads: int
    window_size: int = 7
    shift: bool = False
    mlp_ratio: float = 4.0
    bias: bool = True
    dropout: float = 0.0
    layer_scale_init: float | None = None
    stochastic_depth: float = 0.0
    norm_eps: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = nn.LayerNorm(self.norm_eps, dtype=self.dtype, name="mha_norm")(x)
        y = WindowAttention(
            self.input_size, self.d_model, self.n_heads, self.window_size,
            self.shift, self.bias, self.dropout, dtype=self.dtype, name="mha",
        )(y, train=train)
        if self.layer_scale_init is not None:
            y = LayerScale(self.layer_scale_init, name="mha_scale")(y)
        y = StochasticDepth(self.stochastic_depth, name="mha_droppath")(y, train=train)
        x = x + y

        hidden = int(self.d_model * self.mlp_ratio)
        from ..nn.attention import fused_mlp_halfblock
        from ..ops.block_mlp import use_fused_mlp

        B, H, W, C = x.shape
        if use_fused_mlp(self.d_model, hidden, H * W, self.dropout,
                         has_ls=self.layer_scale_init is not None):
            # fused LN→MLP→GELU→(LS)→drop-path→residual Pallas half-block on
            # the flattened (B, H·W, C) map — the MLP hidden stream is Swin's
            # single biggest byte class (scripts/analyze_swin_bytes.py).
            out = fused_mlp_halfblock(
                x.reshape(B, H * W, C), self.d_model, hidden,
                norm_name="mlp_norm", mlp_name="mlp",
                ls_init=self.layer_scale_init, ls_name="mlp_scale",
                sd_rate=self.stochastic_depth, sd_name="mlp_droppath",
                eps=self.norm_eps, dtype=self.dtype, train=train,
                group=max(1, 256 // (H * W)),
            )
            return out.reshape(B, H, W, C)

        y = nn.LayerNorm(self.norm_eps, dtype=self.dtype, name="mlp_norm")(x)
        y = MLP(hidden, self.dropout, dtype=self.dtype, name="mlp")(y, train=train)
        if self.layer_scale_init is not None:
            y = LayerScale(self.layer_scale_init, name="mlp_scale")(y)
        y = StochasticDepth(self.stochastic_depth, name="mlp_droppath")(y, train=train)
        return x + y


class PatchMerging(nn.Module):
    """2×2 neighborhood concat → LN → linear 4C→2C (ref swin.py:113-124)."""

    norm_eps: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, H // 2, W // 2, 4 * C)
        x = nn.LayerNorm(self.norm_eps, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(
            2 * C, use_bias=False, kernel_init=torch_default_kernel,
            dtype=self.dtype, name="reduction",
        )(x)
        return x


class SwinTransformer(Backbone):
    img_size: int
    d_model: int
    n_heads: int
    depths: tuple[int, ...]
    window_sizes: tuple[int, ...]
    patch_size: int = 4
    mlp_ratio: float = 4.0
    bias: bool = True
    dropout: float = 0.0
    layer_scale_init: float | None = None
    stochastic_depth: float = 0.0
    norm_eps: float = 1e-5
    dtype: Any = None

    @property
    def out_channels_list(self) -> tuple[int, ...]:
        return tuple(self.d_model * 2**i for i in range(len(self.depths)))

    @property
    def stride(self) -> int:
        return self.patch_size * 2 ** (len(self.depths) - 1)

    def setup(self):
        p = self.patch_size
        self.patch_embed = nn.Conv(
            self.d_model, (p, p), strides=(p, p), padding="VALID",
            kernel_init=torch_default_kernel, bias_init=torch_default_bias(3 * p * p),
            dtype=self.dtype, name="patch_embed",
        )
        self.patch_norm = nn.LayerNorm(self.norm_eps, dtype=self.dtype, name="patch_norm")
        self.pos_drop = nn.Dropout(self.dropout)

        input_size = self.img_size // p
        d_model, n_heads = self.d_model, self.n_heads
        downsamples, stages = [], []
        for i, (depth, window_size) in enumerate(zip(self.depths, self.window_sizes)):
            if i > 0:
                downsamples.append(
                    PatchMerging(self.norm_eps, dtype=self.dtype, name=f"downsample_{i}")
                )
                input_size //= 2
                d_model *= 2
                n_heads *= 2
            blocks = []
            for j in range(depth):
                shift = bool(j % 2) and input_size > window_size
                blocks.append(
                    SwinBlock(
                        input_size, d_model, n_heads, window_size, shift,
                        self.mlp_ratio, self.bias, self.dropout, self.layer_scale_init,
                        self.stochastic_depth, self.norm_eps, dtype=self.dtype,
                        name=f"stage_{i}_block_{j}",
                    )
                )
            stages.append(blocks)
        self.downsamples = downsamples
        self.stage_blocks = stages
        self.final_norm = nn.LayerNorm(self.norm_eps, dtype=self.dtype, name="norm")

    def get_feature_maps(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        x = self.pos_drop(self.patch_norm(self.patch_embed(x)), deterministic=not train)
        outputs = []
        for i, blocks in enumerate(self.stage_blocks):
            if i > 0:
                x = self.downsamples[i - 1](x)
            for block in blocks:
                x = block(x, train=train)
            outputs.append(x)
        return outputs

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        out = self.get_feature_maps(x, train=train)[-1]
        return self.final_norm(out).mean(axis=(1, 2))

    @property
    def last_out_channels(self) -> int:
        return self.out_channels_list[-1]


def resize_window_tables(
    params: dict, depths, old_windows, new_windows
) -> dict:
    """Transfer Swin params between window sizes by bicubic interpolation of
    each block's relative-PE table over its (2w−1)×(2w−1) offset grid.

    The reference cannot do this at all (its ``resize_pe`` raises
    NotImplementedError, swin.py:186-187); resolution changes at a FIXED
    window already work here without any transform because position info is
    relative (tests/test_swin_resize.py). Returns a new param tree usable by
    a SwinTransformer built with ``window_sizes=new_windows``.
    """
    import jax.numpy as jnp

    def _copy(d):  # fresh dicts, shared leaves (no array copies)
        return {k: _copy(v) if isinstance(v, dict) else v for k, v in d.items()}

    out = _copy(params)
    for s, (depth, ow, nw) in enumerate(zip(depths, old_windows, new_windows)):
        if ow == nw:
            continue
        for b in range(depth):
            blk = out[f"stage_{s}_block_{b}"]["mha"]
            tbl = jnp.asarray(blk["relative_pe_table"])  # (1, H, (2ow−1)²)
            heads = tbl.shape[1]
            grid = tbl.reshape(heads, 2 * ow - 1, 2 * ow - 1)
            resized = jax.image.resize(
                grid, (heads, 2 * nw - 1, 2 * nw - 1), method="bicubic"
            )
            blk["relative_pe_table"] = resized.reshape(1, heads, (2 * nw - 1) ** 2)
    return out


# ref swin.py:191-200 (Swin §3.3 + AutoFormerV2 configs)
_SWIN_VARIANTS = {
    "T": (96, 3, (2, 2, 6, 2), (7, 7, 7, 7)),
    "S": (96, 3, (2, 2, 18, 2), (7, 7, 7, 7)),
    "B": (128, 4, (2, 2, 18, 2), (7, 7, 7, 7)),
    "L": (192, 6, (2, 2, 18, 2), (7, 7, 7, 7)),
    "S3-T": (96, 3, (2, 2, 6, 2), (7, 7, 14, 7)),
    "S3-S": (96, 3, (2, 2, 18, 2), (14, 14, 14, 14)),
    "S3-B": (96, 3, (2, 2, 30, 2), (7, 7, 14, 7)),
}


def swin_from_config(variant: str, img_size: int = 224, **kwargs: Any) -> SwinTransformer:
    d_model, n_heads, depths, window_sizes = _SWIN_VARIANTS[variant]
    kwargs.setdefault("d_model", d_model)
    kwargs.setdefault("n_heads", n_heads)
    kwargs.setdefault("depths", depths)
    kwargs.setdefault("window_sizes", window_sizes)
    return SwinTransformer(img_size=img_size, **kwargs)


for _v in _SWIN_VARIANTS:
    register_model(f"swin_{_v.lower()}")(
        lambda variant=_v, img_size=224, **kw: swin_from_config(variant, img_size, **kw)
    )
