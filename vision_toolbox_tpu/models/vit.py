"""ViT with AugReg / SigLIP support (reference backbones/vit.py:111-263).

TPU-native notes:
  * patch embedding is a strided conv → one MXU matmul per patch grid
  * pooling types cls_token / gap / mha (SigLIP MAP head) (ref vit.py:150-157)
  * ``resize_pe`` is a *functional* param transform (bicubic interpolation of
    the position-embedding grid, ref vit.py:159-166)
  * Flax ``.npz`` checkpoints (AugReg vision_transformer + big_vision SigLIP
    layouts, ref vit.py:215-263) load natively — no torch needed; see
    utils/flax_ckpt.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.attention import MHAPooling, ViTBlock
from ..nn.initializers import torch_default_bias, torch_default_kernel
from .base import register_model


class ViT(nn.Module):
    d_model: int
    depth: int
    n_heads: int
    patch_size: int
    img_size: int
    cls_token: bool = True
    pool_type: str = "cls_token"  # cls_token | gap | mha
    bias: bool = True
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    layer_scale_init: float | None = None
    stochastic_depth: float = 0.0
    norm_eps: float = 1e-6
    dtype: Any = None
    # Sequence parallelism hook: a NamedSharding for the (B, T, D) token
    # activations (e.g. NamedSharding(mesh, P("data", "seq"))). Re-asserted
    # after the embed and before every block so GSPMD partitions the
    # positionwise work (LN/MLP/projections) over the token axis and inserts
    # k/v all-gathers only around the attention contractions. When T does not
    # divide the seq axis (cls/dist tokens make T odd), ``_blocks`` pads the
    # sequence with masked zero tokens — the default cls-token ViT shards
    # too. Beyond-parity (the reference is DP-only); exercised by
    # scripts/bench_scaling.py spN and the dryrun_multichip sp leg.
    token_sharding: Any = None

    def _token_axis_size(self) -> int:
        """Mesh extent of the token (dim-1) axis of ``token_sharding``."""
        if self.token_sharding is None:
            return 1
        spec = self.token_sharding.spec
        if len(spec) < 2 or spec[1] is None:
            return 1
        axes = spec[1] if isinstance(spec[1], tuple) else (spec[1],)
        size = 1
        for a in axes:
            size *= self.token_sharding.mesh.shape[a]
        return size

    def _constrain(self, x: jax.Array) -> jax.Array:
        if self.token_sharding is None:
            return x
        try:
            self.token_sharding.shard_shape(x.shape)
        except Exception:
            # T always divides (``_blocks`` pads), so only the batch dim can
            # fail — the batch-1 init dummy skips silently.
            if x.shape[0] > 1:
                import warnings

                warnings.warn(
                    f"token_sharding {self.token_sharding.spec} does not divide "
                    f"activations {x.shape} — constraint skipped (batch not a "
                    f"multiple of the data axis?)", stacklevel=2,
                )
            return x
        return jax.lax.with_sharding_constraint(x, self.token_sharding)

    def _embed(self, x: jax.Array) -> jax.Array:
        """Patch-embed NHWC image → (B, H*W, C) tokens + learned PE."""
        p = self.patch_size
        fan_in = 3 * p * p
        x = nn.Conv(
            self.d_model, (p, p), strides=(p, p), padding="VALID",
            kernel_init=torch_default_kernel, bias_init=torch_default_bias(fan_in),
            dtype=self.dtype, name="patch_embed",
        )(x)
        x = x.reshape(x.shape[0], -1, self.d_model)
        n_tokens = (self.img_size // self.patch_size) ** 2
        pe = self.param("pe", nn.initializers.normal(0.02), (1, n_tokens, self.d_model))
        return x + pe.astype(x.dtype)

    def _blocks(self, x: jax.Array, train: bool) -> jax.Array:
        # Sequence parallelism with cls/dist tokens: T (e.g. 197) rarely
        # divides the seq axis, so pad with zero tokens + a -1e9 key mask.
        # Real queries give pad keys softmax weight exp(s - 1e9) == 0.0 in
        # float — numerics are exactly the unpadded model's (pinned by
        # tests/test_pipeline.py::test_token_sharding_cls_token); pad rows
        # compute garbage that stays finite and is sliced off before pooling.
        # (With attention/MLP dropout > 0 the padded shape draws a different
        # rng stream — sp is a scale-out feature, dropout defaults to 0.)
        T = x.shape[1]
        pad = -T % self._token_axis_size()
        attn_bias = None
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            attn_bias = jnp.where(
                jnp.arange(T + pad) < T, 0.0, -1e9
            )[None, None, None, :]
        # GSPMD partitions einsums/matmuls natively but can only replicate an
        # opaque pallas_call — keep blocks on XLA when activations are sharded.
        unfused = self.token_sharding is not None
        for i in range(self.depth):
            x = self._constrain(x)
            x = ViTBlock(
                self.d_model, self.n_heads, self.bias, self.mlp_ratio, self.dropout,
                self.layer_scale_init, self.stochastic_depth, self.norm_eps,
                dtype=self.dtype, name=f"block_{i}",
            )(x, train=train, attn_bias=attn_bias, force_unfused=unfused)
        return x[:, :T] if pad else x

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        out = self._embed(x)
        if self.cls_token:
            cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.d_model))
            cls = jnp.broadcast_to(cls, (out.shape[0], 1, self.d_model)).astype(out.dtype)
            out = jnp.concatenate([cls, out], axis=1)
        out = self._blocks(out, train)

        norm = nn.LayerNorm(self.norm_eps, dtype=self.dtype, name="norm")
        if self.pool_type == "cls_token":
            return norm(out[:, 0])
        elif self.pool_type == "gap":
            return norm(out).mean(axis=1)
        elif self.pool_type == "mha":
            pooler = MHAPooling(
                self.d_model, self.n_heads, self.bias, self.mlp_ratio, self.norm_eps,
                dtype=self.dtype, name="pooler",
            )
            return pooler(norm(out), train=train)
        raise ValueError(f"unsupported pool_type {self.pool_type}")

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


# ref vit.py:172-179
VIT_VARIANTS = {
    "Ti": (192, 12, 3),
    "S": (384, 12, 6),
    "M": (512, 12, 8),
    "B": (768, 12, 12),
    "L": (1024, 24, 16),
    "H": (1280, 32, 16),
}


def vit_from_config(variant: str, img_size: int = 224, *, weights: str | None = None, **kwargs: Any) -> ViT:
    """``variant`` like "B_16". ``weights='siglip'`` switches to MAP pooling
    without a cls token (ref vit.py:182-184)."""
    name, patch_size = variant.split("_")
    d_model, depth, n_heads = VIT_VARIANTS[name]
    if weights == "siglip":
        kwargs.setdefault("cls_token", False)
        kwargs.setdefault("pool_type", "mha")
    return ViT(
        d_model=d_model, depth=depth, n_heads=n_heads,
        patch_size=int(patch_size), img_size=img_size, **kwargs,
    )


def resize_pe(
    pe: jax.Array, new_img_size: int, patch_size: int, method: str = "bicubic"
) -> jax.Array:
    """Functional position-embedding resize (ref vit.py:159-166).

    ``pe``: (1, N, C) square token grid → interpolated to the new grid.
    """
    n_tokens = pe.shape[1]
    old = int(round(n_tokens**0.5))
    new = new_img_size // patch_size
    grid = pe.reshape(1, old, old, -1)
    grid = jax.image.resize(grid, (1, new, new, grid.shape[-1]), method=method)
    return grid.reshape(1, new * new, -1)


for _v in ("Ti_16", "S_32", "S_16", "M_16", "B_32", "B_16", "L_16", "H_14"):
    register_model(f"vit_{_v.lower()}")(
        lambda variant=_v, img_size=224, **kw: vit_from_config(variant, img_size, **kw)
    )
