"""Parameter initializers matching the reference's PyTorch init semantics.

The reference relies on two init families:
  * ``nn.init.kaiming_normal_(w, 0.2, "fan_out", act)`` for ReLU/LeakyReLU convs
    (reference components.py:45-46).
  * PyTorch's *default* ``kaiming_uniform_(a=sqrt(5))`` for every other
    Conv2d/Linear, with bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

We reproduce both so training dynamics start from the same distribution.
All initializers follow the flax convention ``init(key, shape, dtype)`` and
expect NHWC conv kernels of shape (kh, kw, in_c/groups, out_c) or dense
kernels of shape (in_f, out_f).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _fans(shape: tuple[int, ...]) -> tuple[float, float]:
    """(fan_in, fan_out) for dense (in, out) or conv (kh, kw, in, out) kernels."""
    if len(shape) == 2:
        fan_in, fan_out = shape[0], shape[1]
    else:
        receptive = 1
        for s in shape[:-2]:
            receptive *= s
        fan_in = shape[-2] * receptive
        fan_out = shape[-1] * receptive
    return float(fan_in), float(fan_out)


def _leaky_gain(negative_slope: float) -> float:
    return math.sqrt(2.0 / (1.0 + negative_slope**2))


def kaiming_normal(nonlinearity: str = "relu", a: float = 0.2, mode: str = "fan_out"):
    """torch.nn.init.kaiming_normal_ equivalent.

    Matches reference components.py:46: the ``a`` parameter is only used when
    ``nonlinearity == 'leaky_relu'``; plain ReLU uses gain sqrt(2).
    """
    if nonlinearity == "relu":
        gain = math.sqrt(2.0)
    elif nonlinearity == "leaky_relu":
        gain = _leaky_gain(a)
    else:
        raise ValueError(f"unsupported nonlinearity {nonlinearity}")

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _fans(shape)
        fan = fan_out if mode == "fan_out" else fan_in
        std = gain / math.sqrt(fan)
        return jax.random.normal(key, shape, dtype) * jnp.asarray(std, dtype)

    return init


def torch_default_kernel(key, shape, dtype=jnp.float32):
    """PyTorch default Conv2d/Linear weight init: kaiming_uniform_(a=sqrt(5)).

    bound = gain * sqrt(3 / fan_in) with gain = sqrt(2/(1+5)) = 1/sqrt(3),
    i.e. bound = 1/sqrt(fan_in).
    """
    fan_in, _ = _fans(shape)
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_default_bias(fan_in: int):
    """PyTorch default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def trunc_normal(std: float = 0.02):
    """torch.nn.init.trunc_normal_ equivalent (truncated at ±2σ)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * jnp.asarray(std, dtype)

    return init
