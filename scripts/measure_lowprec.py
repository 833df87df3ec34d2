"""Kernel-level low-precision ceiling test on the real chip (v5e).

Times representative MXU shapes (a large square matmul and the hot
CSPDarknet-53 backward-sized convs) in bf16 vs int8 vs fp8 to establish
whether a reduced-precision backward could beat the bf16 step at all —
the last perf lever named in STATUS.md after bs512/remat/optimizer-precision
all measured as losses. Results recorded in DESIGN.md.
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=30, warmup=5):
    fn = jax.jit(fn)
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.asarray(out, jnp.float32).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.asarray(out, jnp.float32).reshape(-1)[0])
    return (time.perf_counter() - t0) / n


def main():
    k = jax.random.PRNGKey(0)
    M = 8192

    print(f"backend={jax.default_backend()}  square matmul {M}x{M}x{M}")
    flops = 2 * M * M * M
    a32 = jax.random.normal(k, (M, M), jnp.float32)
    b32 = jax.random.normal(k, (M, M), jnp.float32)

    for name, dtype, pref in [
        ("f32", jnp.float32, jnp.float32),
        ("bf16", jnp.bfloat16, jnp.float32),
        ("int8", jnp.int8, jnp.int32),
        ("fp8_e4m3", jnp.float8_e4m3fn, jnp.float32),
        ("fp8_e5m2", jnp.float8_e5m2, jnp.float32),
    ]:
        try:
            a = a32.astype(dtype)
            b = b32.astype(dtype)
            dt = timeit(
                partial(jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=pref),
                a, b,
            )
            print(f"  {name:9s} {dt*1e3:7.2f} ms  {flops/dt/1e12:7.1f} TOP/s")
        except Exception as e:  # noqa: BLE001
            print(f"  {name:9s} FAILED: {type(e).__name__}: {str(e)[:120]}")

    # hot conv shape: CSPDarknet stage_3/4-sized 3x3 at bs256@176
    B, H, W, C = 256, 11, 11, 512
    x32 = jax.random.normal(k, (B, H, W, C), jnp.float32)
    w32 = jax.random.normal(k, (3, 3, C, C), jnp.float32) * 0.01
    conv_flops = 2 * B * H * W * 9 * C * C

    print(f"3x3 conv {B}x{H}x{W}x{C} -> {C}")
    for name, dtype, pref in [
        ("bf16", jnp.bfloat16, jnp.float32),
        ("int8", jnp.int8, jnp.int32),
        ("fp8_e4m3", jnp.float8_e4m3fn, jnp.float32),
    ]:
        try:
            x = x32.astype(dtype)
            w = w32.astype(dtype)
            dt = timeit(
                partial(
                    jax.lax.conv_general_dilated,
                    window_strides=(1, 1),
                    padding=[(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=pref,
                ),
                x, w,
            )
            print(f"  {name:9s} {dt*1e3:7.3f} ms  {conv_flops/dt/1e12:7.1f} TOP/s")
        except Exception as e:  # noqa: BLE001
            print(f"  {name:9s} FAILED: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
