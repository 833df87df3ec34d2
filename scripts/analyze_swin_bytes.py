#!/usr/bin/env python
"""Where do swin_t's 107.6 GB/step live? Compile the production train step on
the TPU backend and bucket every HLO instruction's output shape by logical
bytes (plus cost-analysis totals), focusing on score-shaped (…, w², w²)
tensors — evidence for the byte-elimination pass (round-3 verdict #2)."""

from __future__ import annotations

import argparse
import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

DT = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1, "u8": 1, "s8": 1}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="swin_t")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--infer", action="store_true")
    args = ap.parse_args()

    from vision_toolbox_tpu import create_backbone
    from vision_toolbox_tpu.train import (
        ImageClassifier, TrainState, make_train_step, sgd_with_param_groups,
    )

    model = ImageClassifier(
        backbone=create_backbone(args.model, dtype=jnp.bfloat16),
        num_classes=1000, dtype=jnp.bfloat16,
    )
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, args.img, args.img, 3)), train=False)
    x = jnp.zeros((args.batch, args.img, args.img, 3), jnp.bfloat16)
    y = jnp.zeros((args.batch,), jnp.int32)

    if args.infer:
        lowered = jax.jit(lambda v, x: model.apply(v, x, train=False)).lower(v, x)
    else:
        tx = sgd_with_param_groups(v["params"], 0.1, momentum=0.9, weight_decay=2e-5)
        state = TrainState.create(model.apply, jax.tree_util.tree_map(jnp.copy, v), tx)
        step = jax.jit(make_train_step(1000, mixup_alpha=0, cutmix_alpha=0,
                                       compute_dtype=jnp.bfloat16))
        lowered = step.lower(state, x, y, jax.random.PRNGKey(1))
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    print(f"{args.model} {'infer' if args.infer else 'train'} bs{args.batch}: "
          f"flops={ca.get('flops', 0)/1e12:.2f}T bytes={ca.get('bytes accessed', 0)/2**30:.1f}GiB")

    hlo = compiled.as_text()
    # Count ONLY instructions at the top level of non-fused computations —
    # those outputs are materialized in HBM; instructions inside
    # %fused_computation bodies live in registers/VMEM.
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
        if b < 16 * 2**20:  # only buffers >= 16 MB matter at ~100 GB/step
            continue
        key = f"{dt}[{dims_s}]"
        by_shape[key][0] += 1
        by_shape[key][1] += b
        by_shape[key][2].add(op)
    rows = sorted(by_shape.items(), key=lambda kv: -kv[1][1])[:30]
    print("\ntop MATERIALIZED shapes (count x bytes, opcodes):")
    tot = sum(v[1] for v in by_shape.values())
    for key, (cnt, b, ops) in rows:
        print(f"  {b/2**30:7.2f} GiB  {cnt:4d}x {key:34s} {','.join(sorted(ops))}")
    print(f"  (all materialized >=16MB buffers sum {tot/2**30:.1f} GiB of writes; "
          f"reads add more — cost analysis above is the ground truth)")


if __name__ == "__main__":
    main()
