"""TPU-optimized BatchNorm.

flax linen's BatchNorm promotes the whole normalization chain to float32 when
params are fp32, which on a bandwidth-bound conv net doubles the HBM traffic
of the largest tensors (measured: ~68% of CSPDarknet-53 train-step op bytes
were f32 elementwise chains at [256,176,176,C]).

This implementation keeps the *statistics* in float32 (a per-channel vector —
numerically where it matters) but folds them into per-channel scale/shift
``A = gamma * rsqrt(var + eps)``, ``B = beta - mean * A`` and applies
``x * A + B`` in the compute dtype (bf16), exactly like inference-folded BN.
Running-stat updates match torch semantics (flax momentum convention:
ra = m*ra + (1-m)*batch; biased batch variance like torch).

Cross-replica semantics: under GSPMD (jit + batch-sharded inputs) the f32
mean reductions are global automatically. ``axis_name`` adds explicit pmeans
for pmap/shard_map users.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class BatchNorm(nn.Module):
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: str | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool | None = None) -> jax.Array:
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(features, jnp.float32))

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            mean2 = jnp.mean(jnp.square(xf), axis=reduce_axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                # torch updates running_var with the UNBIASED batch variance
                # (normalization itself uses the biased one)
                n = 1
                for ax in reduce_axes:
                    n *= x.shape[ax]
                var_unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var_unbiased

        # fold stats into per-channel scale/shift, apply in compute dtype
        a = scale * jax.lax.rsqrt(var + self.epsilon)
        b = bias - mean * a
        return x * a.astype(x.dtype) + b.astype(x.dtype)
