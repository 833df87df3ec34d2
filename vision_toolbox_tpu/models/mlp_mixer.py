"""MLP-Mixer (reference backbones/mlp_mixer.py).

token-mixing MLP over transposed tokens + channel-mixing MLP
(ref mlp_mixer.py:16-36); variants S/B/L/H (Table 1 of the paper,
ref mlp_mixer.py:69). Flax ``.npz`` checkpoints load natively.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.attention import MLP
from ..nn.initializers import torch_default_bias, torch_default_kernel
from .base import register_model


class MixerBlock(nn.Module):
    n_tokens: int
    d_model: int
    mlp_ratio: tuple[float, float] = (0.5, 4.0)
    dropout: float = 0.0
    norm_eps: float = 1e-6
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        tokens_dim = int(self.d_model * self.mlp_ratio[0])
        channels_dim = int(self.d_model * self.mlp_ratio[1])
        y = nn.LayerNorm(self.norm_eps, dtype=self.dtype, name="norm1")(x)
        y = jnp.swapaxes(y, -1, -2)  # (B, C, N)
        y = MLP(tokens_dim, self.dropout, dtype=self.dtype, name="token_mixing")(y, train=train)
        x = x + jnp.swapaxes(y, -1, -2)

        from ..nn.attention import fused_mlp_halfblock
        from ..ops.block_mlp import use_fused_mlp

        # channel-mixing half IS the transformer MLP half-block (LN axis ==
        # MLP input axis); token mixing is not (LN over D, MLP over N)
        if use_fused_mlp(self.d_model, channels_dim, x.shape[1], self.dropout):
            return fused_mlp_halfblock(
                x, self.d_model, channels_dim,
                norm_name="norm2", mlp_name="channel_mixing",
                eps=self.norm_eps, dtype=self.dtype, train=train,
            )

        y = nn.LayerNorm(self.norm_eps, dtype=self.dtype, name="norm2")(x)
        x = x + MLP(channels_dim, self.dropout, dtype=self.dtype, name="channel_mixing")(y, train=train)
        return x


class MLPMixer(nn.Module):
    n_layers: int
    d_model: int
    patch_size: int
    img_size: int
    mlp_ratio: tuple[float, float] = (0.5, 4.0)
    dropout: float = 0.0
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
        x = x.reshape(x.shape[0], -1, self.d_model)
        n_tokens = (self.img_size // self.patch_size) ** 2
        for i in range(self.n_layers):
            x = MixerBlock(
                n_tokens, self.d_model, self.mlp_ratio, self.dropout, self.norm_eps,
                dtype=self.dtype, name=f"block_{i}",
            )(x, train=train)
        x = nn.LayerNorm(self.norm_eps, dtype=self.dtype, name="norm")(x)
        return x.mean(axis=1)

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


_MIXER_VARIANTS = {"S": (8, 512), "B": (12, 768), "L": (24, 1024), "H": (32, 1280)}


def mlp_mixer_from_config(variant: str, patch_size: int, img_size: int = 224, **kwargs: Any) -> MLPMixer:
    n_layers, d_model = _MIXER_VARIANTS[variant]
    return MLPMixer(
        n_layers=n_layers, d_model=d_model, patch_size=patch_size, img_size=img_size, **kwargs
    )


for _v, _p in (("S", 8), ("S", 16), ("S", 32), ("B", 16), ("B", 32), ("L", 16)):
    register_model(f"mixer_{_v.lower()}_{_p}")(
        lambda variant=_v, patch_size=_p, img_size=224, **kw: mlp_mixer_from_config(
            variant, patch_size, img_size, **kw
        )
    )
