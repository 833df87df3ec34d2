"""Weight-int8 + dynamic-activation-int8 serving path (round-3 verdict #9).

v5e's MXU runs int8 matmuls at ~1.8× bf16 on square shapes
(scripts/measure_fp8_ceiling.py); conv backbones measured only ~1.13×
model-level (shapes are utilization-bound, STATUS round-2 #4), but the ViT
family's serving cost IS large dense matmuls — the one place int8 should
pay on this chip.

Mechanism: a pre-pass quantizes every 2-D ``kernel`` in the params tree
(per-output-channel absmax scales, symmetric int8); at apply time a flax
method interceptor redirects each ``Linear``/``nn.Dense`` call to an int8
matmul — activations are quantized dynamically per row (absmax), the MXU
accumulates in int32, and the result is rescaled in f32 before the bias
add. No model or checkpoint changes; the original fp params stay the
interface. Training is untouched.

    qtree = quantize_params(variables["params"])
    logits = quantized_apply(model, qtree, variables, x)   # jit/export this
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import Linear


def _walk(tree: dict, path: tuple = ()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _walk(v, path + (k,))
        else:
            yield path + (k,), v


def quantize_params(params: dict, min_size: int = 4096) -> dict[str, Any]:
    """Per-output-channel symmetric int8 for every 2-D kernel with
    ``size >= min_size``. Returns {"/".join(module_path): (w8, scale, bias)};
    bias is None when the module has none."""
    flat = dict(_walk(params))
    qtree: dict[str, Any] = {}
    for path, w in flat.items():
        if path[-1] != "kernel" or w.ndim != 2 or w.size < min_size:
            continue
        w = jnp.asarray(w, jnp.float32)
        scale = jnp.max(jnp.abs(w), axis=0) / 127.0  # (out,)
        scale = jnp.maximum(scale, 1e-12)
        w8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        bias = flat.get(path[:-1] + ("bias",))
        key = "/".join(path[:-1])
        qtree[key] = (w8, scale, None if bias is None else jnp.asarray(bias, jnp.float32))
    return qtree


def _int8_matmul(x: jax.Array, w8: jax.Array, wscale: jax.Array) -> jax.Array:
    """x: (..., in) float; w8: (in, out) int8; per-row dynamic activation
    quantization; int32 MXU accumulation; f32 rescale."""
    xf = x.astype(jnp.float32)
    xs = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    xs = jnp.maximum(xs, 1e-12)
    x8 = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x8, w8, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return acc.astype(jnp.float32) * xs * wscale


def _make_interceptor(qtree: dict[str, Any]):
    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if context.method_name != "__call__" or not isinstance(mod, (Linear, nn.Dense)):
            return next_fun(*args, **kwargs)
        entry = qtree.get("/".join(mod.path))
        if entry is None:
            return next_fun(*args, **kwargs)
        w8, wscale, bias = entry
        y = _int8_matmul(args[0], w8, wscale)
        if bias is not None:
            y = y + bias
        return y.astype(args[0].dtype if mod.dtype is None else mod.dtype)

    return interceptor


def quantized_apply(model, qtree: dict[str, Any], variables: dict, x: jax.Array, **kwargs):
    """model.apply with every quantized Linear/Dense routed through the int8
    matmul. jit-able: qtree and variables are ordinary pytree arguments."""
    with nn.intercept_methods(_make_interceptor(qtree)):
        return model.apply(variables, x, train=False, **kwargs)
