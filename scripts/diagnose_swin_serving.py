#!/usr/bin/env python
"""Diagnose the swin_t bs128 serving cliff (round-4 verdict item 4).

BENCHMARKS.md's export-path serving table shows swin_t throughput PEAKS at
bs32 (8.79 ms) and DEGRADES at bs128 (42.31 ms — worse than 4x the bs32
time), with "superlinear window relayouts" asserted but never diagnosed.
This script separates the candidate causes in ONE process:

  * export artifact vs in-framework jit at each bs — is the cliff
    export-specific, or does the model itself degrade?
  * compiled cost analysis (bytes, flops) per bs — does the per-image byte
    count grow superlinearly (relayout/padding blowup), or stay flat
    (pointing at scheduling/HBM-spill instead)?
  * memory_analysis temp allocation per bs — HBM spill shows up as
    superlinear temp bytes.
  * materialized >=8 MB HLO buffer bucketing per bs (analyze_swin_bytes
    method) — names the shapes that grow faster than batch.

A/B/A bracket: bs sequence ends with a repeat of the first point so tunnel
drift is visible (CLAUDE.md measurement rule).

    python scripts/diagnose_swin_serving.py --batches 32,64,96,128
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DT = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1, "u8": 1, "s8": 1}


def bucket_materialized(hlo: str, min_bytes: int):
    inst = re.compile(r"^\s*(?:ROOT )?%?\S+ = (\w+)\[([\d,]+)\]\S* ([\w-]+)\(")
    comp = re.compile(r"^(?:ENTRY )?%?([\w.\-]+)[^=]*\{\s*$")
    by_shape = defaultdict(lambda: [0, 0, set()])
    in_fused = False
    for line in hlo.splitlines():
        m = comp.match(line)
        if m:
            in_fused = m.group(1).startswith(("fused_", "region_"))
            continue
        if in_fused:
            continue
        m = inst.match(line)
        if not m:
            continue
        dt, dims_s, op = m.groups()
        if dt not in DT or op in ("parameter", "constant", "bitcast", "get-tuple-element"):
            continue
        n = 1
        for d in dims_s.split(","):
            if d:
                n *= int(d)
        b = n * DT[dt]
        if b < min_bytes:
            continue
        key = f"{dt}[{dims_s}]"
        by_shape[key][0] += 1
        by_shape[key][1] += b
        by_shape[key][2].add(op)
    return by_shape


def chain_time(fn_call, variables, x, steps, reps):
    @jax.jit
    def chain(v, x):
        def body(i, acc):
            out = fn_call(v, x + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-6))
            return acc + jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, steps, body, jnp.float32(0))

    float(chain(variables, x))  # warm + fence
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chain(variables, x))
        best = min(best, (time.perf_counter() - t0) / steps)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="swin_t")
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--batches", default="32,64,96,128")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="artifacts/swin_serving_diag.json")
    args = ap.parse_args()

    from vision_toolbox_tpu import create_backbone
    from vision_toolbox_tpu.utils.export import export_model, load_exported

    model = create_backbone(args.model, dtype=jnp.bfloat16, img_size=args.img)
    variables = model.init_variables(0, args.img)

    batches = [int(b) for b in args.batches.split(",")]
    batches = batches + [batches[0]]  # A/B/A drift bracket
    rows = []
    for bi, bs in enumerate(batches):
        x = jax.random.uniform(jax.random.PRNGKey(0), (bs, args.img, args.img, 3),
                               jnp.bfloat16)

        # in-framework jit
        fwd = lambda v, xx: model.apply(v, xx, train=False)
        fw_ms = chain_time(fwd, variables, x, args.steps, args.reps)

        # export artifact
        blob = export_model(model, variables, (bs, args.img, args.img, 3), jnp.bfloat16)
        fn = load_exported(blob)
        ex_ms = chain_time(fn.call, fn.variables, x, args.steps, args.reps)

        # compile-time accounting of the single-call in-framework forward
        lowered = jax.jit(fwd).lower(variables, x)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        mem = compiled.memory_analysis()
        temp = getattr(mem, "temp_size_in_bytes", None)
        row = {
            "batch": bs,
            "framework_ms": round(fw_ms, 3),
            "export_ms": round(ex_ms, 3),
            "framework_img_s": round(bs / fw_ms * 1e3, 1),
            "export_img_s": round(bs / ex_ms * 1e3, 1),
            "bytes_per_img_mb": round(ca.get("bytes accessed", 0) / bs / 2**20, 1),
            "flops_per_img_g": round(ca.get("flops", 0) / bs / 1e9, 2),
            "temp_alloc_mb": round(temp / 2**20, 1) if temp else None,
            "rebracket": bi == len(batches) - 1,
        }
        rows.append(row)
        print(f"bs{bs:4d}: framework {fw_ms:8.3f} ms ({row['framework_img_s']:8.1f} img/s)  "
              f"export {ex_ms:8.3f} ms ({row['export_img_s']:8.1f} img/s)  "
              f"{row['bytes_per_img_mb']} MB/img  temp {row['temp_alloc_mb']} MB",
              flush=True)

        # name the shapes that grow faster than batch (vs the first bs)
        if bi in (0, len(batches) - 2):
            bucket = bucket_materialized(compiled.as_text(), 4 * 2**20)
            top = sorted(bucket.items(), key=lambda kv: -kv[1][1])[:12]
            print(f"  top materialized shapes at bs{bs}:")
            for key, (cnt, b, ops) in top:
                print(f"    {b/2**20:8.1f} MB  {cnt:3d}x {key:32s} {','.join(sorted(ops))}")

    Path(args.out).parent.mkdir(exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
