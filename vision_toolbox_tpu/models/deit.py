"""DeiT and DeiT3 (reference backbones/deit.py).

DeiT adds a distillation token; the PE is added to patch tokens *before* the
cls/dist tokens are concatenated, and pooling is the mean of the (cls, dist)
pair after the final norm (ref deit.py:37-41). DeiT3 is a plain ViT with
LayerScale init 1e-6 (ref deit.py:118-139).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .base import register_model
from .vit import VIT_VARIANTS, ViT


class DeiT(ViT):
    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        out = self._embed(x)  # (B, N, C), PE already added
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.d_model))
        dist = self.param("dist_token", nn.initializers.zeros, (1, 1, self.d_model))
        B = out.shape[0]
        tokens = jnp.concatenate(
            [
                jnp.broadcast_to(cls, (B, 1, self.d_model)).astype(out.dtype),
                jnp.broadcast_to(dist, (B, 1, self.d_model)).astype(out.dtype),
                out,
            ],
            axis=1,
        )
        tokens = self._blocks(tokens, train)
        norm = nn.LayerNorm(self.norm_eps, dtype=self.dtype, name="norm")
        return norm(tokens[:, :2]).mean(axis=1)


def deit_from_config(variant: str, img_size: int = 224, **kwargs: Any) -> DeiT:
    name, patch_size = variant.split("_")
    d_model, depth, n_heads = VIT_VARIANTS[name]
    return DeiT(
        d_model=d_model, depth=depth, n_heads=n_heads,
        patch_size=int(patch_size), img_size=img_size, **kwargs,
    )


def deit3_from_config(variant: str, img_size: int = 224, **kwargs: Any) -> ViT:
    name, patch_size = variant.split("_")
    d_model, depth, n_heads = VIT_VARIANTS[name]
    kwargs.setdefault("layer_scale_init", 1e-6)
    return ViT(
        d_model=d_model, depth=depth, n_heads=n_heads,
        patch_size=int(patch_size), img_size=img_size, **kwargs,
    )


for _v in ("Ti_16", "S_16", "B_16", "L_16", "H_14"):
    register_model(f"deit_{_v.lower()}")(
        lambda variant=_v, img_size=224, **kw: deit_from_config(variant, img_size, **kw)
    )
    register_model(f"deit3_{_v.lower()}")(
        lambda variant=_v, img_size=224, **kw: deit3_from_config(variant, img_size, **kw)
    )
