#!/usr/bin/env python
"""Batched serving benchmark through the jax.export deployment artifact
(round-3 verdict item #4) — replaces the bs1 latency table, which on this
tunnel measured only the ~1.2 ms host-dispatch floor.

Per model: export the bf16 inference function (utils/export.py — the
deployment path the repo claims, matching the reference's TorchScript
serving story, classifier.py:80-81), rehydrate it, and measure a
throughput/latency curve at bs 1/8/32/128 on the real chip.

Amortization method: per batch size, ONE jitted call chain of `steps`
sequential model invocations (each feeding a scalar perturbation of the
input, every output folded into one accumulator so none is DCEd) with a single readback at
the end; ms/batch = wall / steps. This amortizes both the ~24 ms tunnel
roundtrip and the ~2 ms per-dispatch floor, so small-batch numbers reflect
device time rather than host latency. Reported separately: `dispatch_ms`,
the naive one-call-one-readback latency a low-rate server would see.

    python scripts/bench_serving.py --models cspdarknet53,vit_b_16,swin_t,efficientnet_b0
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_model(name: str, batch_sizes, img: int, steps: int, reps: int,
                int8: bool = False):
    from vision_toolbox_tpu import create_backbone
    from vision_toolbox_tpu.utils.export import export_model, load_exported

    model = create_backbone(name, dtype=jnp.bfloat16, **(
        {"img_size": img} if name.startswith(("vit", "deit", "cait", "swin", "mixer")) else {}
    ))
    variables = model.init_variables(0, img)
    rows = []
    for bs in batch_sizes:
        blob = export_model(model, variables, (bs, img, img, 3), jnp.bfloat16)
        fn = load_exported(blob)

        # chain `steps` calls in ONE jitted fori_loop: one device program, no
        # host round-trips between invocations, and the model graph compiles
        # ONCE (a Python-unrolled chain of 20 model copies took >15 min to
        # compile). The accumulator consumes every call's output — an unused
        # intermediate would be dead-code-eliminated and the "chain" would
        # silently measure one call (observed: cspdarknet53 "65k img/s").
        # weights ride as jit ARGUMENTS (fn.call + fn.variables): closing
        # over them would inline every parameter byte into the chain's
        # compile payload (vit_b measured HTTP 413 on the remote-compile
        # service with weights-baked artifacts)
        @jax.jit
        def chain(v, x):
            def body(i, acc):
                out = fn.call(v, x + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-6))
                return acc + jnp.sum(out.astype(jnp.float32))
            return jax.lax.fori_loop(0, steps, body, jnp.float32(0))

        x = jax.random.uniform(jax.random.PRNGKey(0), (bs, img, img, 3), jnp.bfloat16)
        float(chain(fn.variables, x))  # warm + fence (tunnel readback)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(fn.variables, x))
            best = min(best, (time.perf_counter() - t0) / steps)

        # naive single-call latency (includes dispatch + readback)
        one = fn(x)
        float(jnp.sum(one.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(5):
            one = fn(x)
            float(jnp.sum(one.astype(jnp.float32)))
        dispatch = (time.perf_counter() - t0) / 5

        # on-prem-projected one-call latency (verdict r4 weak-8: first-class
        # column, not a note): device ms/batch + H2D input + D2H logits over
        # a local PCIe gen3 x16 link (~12 GB/s effective) + ~0.2 ms local
        # dispatch. The measured `dispatch_ms` through this tunnel carries a
        # ~25-30 ms WAN roundtrip that no on-prem deployment would see.
        pcie_gbs = 12e9
        in_bytes = bs * img * img * 3 * 2  # bf16 input
        out_bytes = int(np.prod(one.shape)) * one.dtype.itemsize
        onprem = best * 1e3 + (in_bytes + out_bytes) / pcie_gbs * 1e3 + 0.2
        row = {
            "batch": bs,
            "ms_per_batch": round(best * 1e3, 3),
            "img_per_s": round(bs / best, 1),
            "dispatch_ms": round(dispatch * 1e3, 2),
            "onprem_latency_ms": round(onprem, 2),
            "artifact_kb": len(blob) // 1024,
        }
        if int8:
            # int8 re-test at the matmul-bound batch points (round-3 verdict
            # item #4) — interceptor path, not the export artifact
            from vision_toolbox_tpu.utils.int8_serving import (
                quantize_params, quantized_apply,
            )

            qtree = quantize_params(variables["params"])

            # weights as jit ARGUMENTS (same HTTP-413 trap as the bf16 chain:
            # closing over them bakes every byte into the compile payload)
            @jax.jit
            def chain8(qtree, variables, x):
                def body(i, acc):
                    out = quantized_apply(
                        model, qtree, variables,
                        x + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-6),
                    )
                    return acc + jnp.sum(out.astype(jnp.float32))
                return jax.lax.fori_loop(0, steps, body, jnp.float32(0))

            float(chain8(qtree, variables, x))
            best8 = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(chain8(qtree, variables, x))
                best8 = min(best8, (time.perf_counter() - t0) / steps)
            row["int8_ms_per_batch"] = round(best8 * 1e3, 3)
            row["int8_vs_bf16"] = round(best / best8, 3)
        rows.append(row)
        extra = f"  int8 {row['int8_ms_per_batch']} ms ({row['int8_vs_bf16']:.2f}x)" if int8 else ""
        print(f"  {name} bs{bs:4d}: {best * 1e3:8.3f} ms/batch  "
              f"{bs / best:9.1f} img/s  onprem~{onprem:6.2f} ms  "
              f"(naive 1-call via tunnel {dispatch * 1e3:6.2f} ms){extra}",
              flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="cspdarknet53,vit_b_16,swin_t,efficientnet_b0")
    ap.add_argument("--batches", default="1,8,32,128")
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--int8", action="store_true",
                    help="also measure the int8 interceptor path per batch")
    ap.add_argument("--out", default="artifacts/serving.json")
    args = ap.parse_args()

    batch_sizes = [int(b) for b in args.batches.split(",")]
    results = {}
    for name in args.models.split(","):
        print(f"{name} @{args.img} (export -> rehydrate -> chain x{args.steps}):",
              flush=True)
        results[name] = bench_model(name, batch_sizes, args.img, args.steps,
                                    args.reps, int8=args.int8)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({
        "img": args.img, "steps": args.steps,
        "method": "jax.export artifact; one jitted chain of `steps` calls, "
                  "each output folded into a returned accumulator (no DCE), "
                  "single readback; ms/batch = wall/steps",
        "models": results,
    }, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
