"""fp8 ceiling for the CSPDarknet-53 step on v5e (numerics aside).

(a) Full-model forward bs256@176: bf16 vs all convs cast to fp8_e4m3
    (trace-time patch of lax.conv_general_dilated — forward convs only).
(b) The three conv forms of one training step (fwd, dInput, dWeight) on the
    hot stage shapes, bf16 vs fp8 operands.

This answers whether a reduced-precision conv path could beat the bf16 step
before investing in scaling/accuracy machinery (STATUS round-3 candidate 3).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    out = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(out, jnp.float32).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    out = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(out, jnp.float32).reshape(-1)[0])
    return (time.perf_counter() - t0) / n


def model_forward():
    from vision_toolbox_tpu import create_backbone

    model = create_backbone("cspdarknet53", dtype=jnp.bfloat16)
    variables = model.init_variables(0, 176)
    x = jax.random.uniform(jax.random.PRNGKey(1), (256, 176, 176, 3), jnp.bfloat16)

    fwd = jax.jit(lambda v, x: model.apply(v, x))
    dt = timeit(fwd, variables, x)
    print(f"forward bf16:        {dt*1e3:7.2f} ms  ({256/dt:,.0f} img/s)")

    orig = jax.lax.conv_general_dilated

    def fp8_conv(lhs, rhs, *a, **kw):
        if lhs.dtype == jnp.bfloat16 and hasattr(rhs, "shape") and rhs.ndim == 4:
            kw["preferred_element_type"] = jnp.float32
            out = orig(lhs.astype(jnp.float8_e4m3fn), rhs.astype(jnp.float8_e4m3fn), *a, **kw)
            return out.astype(jnp.bfloat16)
        return orig(lhs, rhs, *a, **kw)

    jax.lax.conv_general_dilated = fp8_conv
    try:
        fwd8 = jax.jit(lambda v, x: model.apply(v, x))
        dt8 = timeit(fwd8, variables, x)
    finally:
        jax.lax.conv_general_dilated = orig
    print(f"forward fp8 convs:   {dt8*1e3:7.2f} ms  ({256/dt8:,.0f} img/s)  [{dt/dt8:.2f}x]")


def conv_forms():
    """fwd / dInput / dWeight convs on CSPDarknet hot shapes at bs256@176."""
    shapes = [
        # (H, W, Cin, Cout, k, name)  — 3x3 block convs of stages 3..5
        (22, 22, 128, 256, 3, "stage3 3x3"),
        (11, 11, 256, 512, 3, "stage4 3x3"),
        (6, 6, 512, 1024, 3, "stage5 3x3"),
        (11, 11, 512, 256, 1, "stage4 1x1"),
    ]
    B = 256
    k0 = jax.random.PRNGKey(0)
    for H, W, Cin, Cout, k, name in shapes:
        x32 = jax.random.normal(k0, (B, H, W, Cin), jnp.float32)
        w32 = jax.random.normal(k0, (k, k, Cin, Cout), jnp.float32) * 0.02
        pad = [(k // 2, k // 2)] * 2

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )

        g32 = jax.random.normal(k0, (B, H, W, Cout), jnp.float32)
        wT32 = jnp.transpose(w32[::-1, ::-1], (0, 1, 3, 2))  # dInput kernel

        # dWeight as a conv contracting the batch dim: lhs x with Cin as the
        # "batch", g as the kernel with B as the input-feature dim.
        def dw_conv(x, g):
            return jax.lax.conv_general_dilated(
                x, g, (1, 1), pad,
                # batch=Cin, contract input-feature=B: dw[cin,kh,kw,cout]
                dimension_numbers=("CHWN", "IHWO", "NHWC"),
                preferred_element_type=jnp.float32,
            )

        row = [name]
        for prec, dt_ in [("bf16", jnp.bfloat16), ("fp8", jnp.float8_e4m3fn)]:
            x = x32.astype(dt_)
            w = w32.astype(dt_)
            g = g32.astype(dt_)
            wT = wT32.astype(dt_)
            t_f = timeit(jax.jit(conv), x, w)
            t_di = timeit(jax.jit(conv), g, wT)
            try:
                t_dw = timeit(jax.jit(dw_conv), x, g)
                row.append(f"{prec} f={t_f*1e3:5.2f} dI={t_di*1e3:5.2f} dW={t_dw*1e3:5.2f} ms")
            except Exception:  # noqa: BLE001
                row.append(f"{prec} f={t_f*1e3:5.2f} dI={t_di*1e3:5.2f} dW=n/a ms")
        print("  " + "  ".join(row))


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}")
    model_forward()
    print("fwd+dI+dW conv forms (bs256):")
    conv_forms()
