"""Model profiling (reference extras.py:132-168 equivalent):
params (M), GFLOPs via XLA cost analysis (fvcore ×2 convention → XLA reports
total FLOPs directly), and fwd/bwd wall times with a host-readback fence.
"""

from __future__ import annotations

import time
from typing import Any, Callable

import jax
import jax.numpy as jnp


def count_params(params: Any) -> float:
    """Parameter count in millions."""
    return sum(x.size for x in jax.tree_util.tree_leaves(params)) / 1e6


def device_memory_mb(device=None) -> dict:
    """Device HBM usage in MB (reference extras.py:164 reports
    torch.cuda.memory_reserved; PJRT exposes allocator stats per device).
    Returns {} on backends without memory_stats (e.g. CPU)."""
    d = device or jax.local_devices()[0]
    stats = d.memory_stats() if hasattr(d, "memory_stats") else None
    if not stats:
        return {}
    out = {}
    for src, dst in (
        ("bytes_in_use", "mem_in_use_mb"),
        ("peak_bytes_in_use", "mem_peak_mb"),
        ("bytes_limit", "mem_limit_mb"),
    ):
        if src in stats:
            out[dst] = stats[src] / 2**20
    return out


def flops(fn: Callable, *args) -> float:
    """GFLOPs of a jitted function via XLA cost analysis (the reference uses
    fvcore MAC count ×2, extras.py:142; XLA counts FLOPs directly)."""
    lowered = jax.jit(fn).lower(*args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", 0.0)) / 1e9


def profile_model(
    model,
    variables: dict,
    input_shape: tuple[int, ...] = (1, 224, 224, 3),
    n: int = 10,
    dtype=jnp.float32,
) -> dict:
    """(params M, fwd GFLOPs, fwd ms, fwd+bwd ms) like extras.profile."""
    x = jnp.zeros(input_shape, dtype)

    def fwd(v, x):
        return model.apply(v, x)

    def fwd_bwd(v, x):
        def loss(v):
            return jnp.sum(model.apply(v, x))

        return jax.grad(loss)(v)

    fwd_j = jax.jit(fwd)
    bwd_j = jax.jit(fwd_bwd)
    gflops = flops(fwd, variables, x)

    # warmup (compile)
    float(jnp.sum(fwd_j(variables, x)))
    jax.block_until_ready(bwd_j(variables, x))

    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd_j(variables, x)
    float(jnp.sum(out))  # readback fence
    fwd_ms = (time.perf_counter() - t0) / n * 1e3

    t0 = time.perf_counter()
    for _ in range(n):
        g = bwd_j(variables, x)
    float(jnp.sum(jax.tree_util.tree_leaves(g["params"])[0]))
    fwd_bwd_ms = (time.perf_counter() - t0) / n * 1e3

    return {
        "params_m": count_params(variables.get("params", variables)),
        "gflops": gflops,
        "fwd_ms": fwd_ms,
        "fwd_bwd_ms": fwd_bwd_ms,
        # peak measured after the fwd+bwd loop — the training-shaped footprint
        **device_memory_mb(),
    }
