"""Max pooling with a tap-compare backward (TPU).

XLA differentiates ``reduce_window(max)`` via SelectAndScatter, which is
slow on TPU — measured (round 3, v5e bs256, fwd+bwd standalone): the
3×3/s2 pools of VoVNet-57 cost 14.4 / 5.4 / 3.6 ms at the three stage
shapes, ~4.6× their HBM byte floor, and pooling shows up in every ResNet /
VoVNet / Darknet stem or stage.

This implementation keeps the forward EXACTLY as reduce_window (bitwise
identical) and replaces only the backward: for each of the k² taps, the
strided window view of the input is compared to the pooled output and the
cotangent flows where they match — k² strided slices, compares, and
scatter-adds, all elementwise/pad ops XLA fuses, no SelectAndScatter.

Semantics note: at EXACT ties inside one window the gradient flows to all
maximal taps (torch/XLA route to the first). Ties are measure-zero for
conv activations; the dispatch stays off on CPU where tests compare
gradients against torch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pool_fwd(x, k: int, s: int, p: int):
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    y = jax.lax.reduce_window(
        x, init, jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, s, s, 1),
        padding=((0, 0), (p, p), (p, p), (0, 0)),
    )
    return y, (x, y)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def max_pool2d_tapgrad(x: jax.Array, k: int, s: int, p: int) -> jax.Array:
    """torch.nn.MaxPool2d(k, s, p) forward ≡ reduce_window; tap-compare vjp."""
    return _pool_fwd(x, k, s, p)[0]


def _pool_bwd(k: int, s: int, p: int, res, g):
    x, y = res
    B, H, W, C = x.shape
    Ho, Wo = y.shape[1], y.shape[2]
    neg = (
        jnp.array(-jnp.inf, x.dtype)
        if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.iinfo(x.dtype).min
    )
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), constant_values=neg)
    dxp = jnp.zeros(xp.shape, jnp.float32)
    gf = g.astype(jnp.float32)
    for dy in range(k):
        for dx in range(k):
            hi_h, hi_w = dy + (Ho - 1) * s + 1, dx + (Wo - 1) * s + 1
            xv = jax.lax.slice(xp, (0, dy, dx, 0), (B, hi_h, hi_w, C), (1, s, s, 1))
            contrib = jnp.where(xv == y, gf, 0.0)
            dxp = dxp.at[:, dy:hi_h:s, dx:hi_w:s, :].add(contrib)
    return (dxp[:, p : p + H, p : p + W, :].astype(x.dtype),)


max_pool2d_tapgrad.defvjp(_pool_fwd, _pool_bwd)
