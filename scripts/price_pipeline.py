#!/usr/bin/env python
"""Price the GPipe bubble in wall-clock on a real slice (analytic model).

The virtual CPU mesh serializes all devices onto one core, so pipeline
wall-clock cannot be measured here (BENCHMARKS.md "GPipe bubble-skip");
and only one real chip is reachable. This script prices it instead, from
three MEASURED inputs:

  * the single-chip production train-step time of the same model
    (BENCHMARKS.md per-model table, chip-measured),
  * the per-step collective bytes GSPMD actually inserted for each config
    (artifacts/scaling_vit.json, parsed from compiled HLO — these are
    backend-independent),
  * the device-count-normalized GPipe schedule: M + S - 1 scan slots of
    which M do useful work per stage (parallel/pipeline.py).

and one EXPLICIT hardware parameter: one-way ICI bandwidth per link
(--ici-gbs, default 45 GB/s ~ v5e per the public scaling-book figure; the
model is linear in it, so re-pricing for another slice is one flag).

Model (no-overlap upper bound; XLA overlaps grad all-reduce with the tail
of the backward, so real totals sit between `compute` and `total`):

  dp over n chips:    wall = T1(b_chip) + t_allreduce(grad_bytes, n)
  dp x pp (S stages): wall = (M + S - 1)/M * T1(b_replica)/S  [bubble-
                      stretched compute] + t_allreduce(grad_bytes/S, dp)
                      + relay bytes / ICI
  all-reduce (ring):  2 * (n-1)/n * bytes / ICI

Plays the role the reference delegates to Lightning/NCCL benchmarking
(/root/reference/configs/base.yaml:17-22 is its whole distributed story).

    python scripts/price_pipeline.py          # vit_b_16 defaults
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def t_allreduce_ms(bytes_, n, ici_gbs):
    if n <= 1:
        return 0.0
    return 2 * (n - 1) / n * bytes_ / (ici_gbs * 1e9) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step-ms", type=float, default=100.9,
                    help="measured single-chip train-step ms (vit_b_16 bs128@224)")
    ap.add_argument("--step-bs", type=int, default=128)
    ap.add_argument("--grad-mb", type=float, default=346.4,
                    help="f32 grad tree MB (vit_b_16: 86.6M params)")
    ap.add_argument("--chips", type=int, default=8)
    ap.add_argument("--ici-gbs", type=float, default=45.0,
                    help="one-way ICI GB/s per link (v5e ~45; v4 ~?: flag it)")
    ap.add_argument("--seq", type=int, default=197)
    ap.add_argument("--d-model", type=int, default=768)
    ap.add_argument("--out", default="artifacts/pipeline_pricing.json")
    args = ap.parse_args()

    n = args.chips
    per_img_ms = args.step_ms / args.step_bs  # linear-in-batch (bs>=32 measured)
    global_bs = args.step_bs * n

    rows = []

    # dp over all chips
    comp = args.step_ms
    comm = t_allreduce_ms(args.grad_mb * 1e6, n, args.ici_gbs)
    rows.append({
        "config": f"dp{n}", "microbatches": None, "bubble_pct": 0.0,
        "compute_ms": round(comp, 2), "comm_ms": round(comm, 2),
        "total_ms": round(comp + comm, 2),
        "img_s": round(global_bs / (comp + comm) * 1e3, 0),
    })

    # dp x pp splits
    for S in (2, 4):
        dp = n // S
        b_replica = global_bs // dp
        for M in (4, 8, 16, 32):
            ubatch = b_replica // M
            if ubatch < 8:
                continue
            # bubble-stretched compute: perfect split would be T1(b_replica)/S
            base = per_img_ms * b_replica / S
            comp = (M + S - 1) / M * base
            bubble = (S - 1) / (M + S - 1)
            # relays: each of the S-1 stage boundaries is its OWN ICI link
            # running concurrently — the binding term is the busiest link:
            # M microbatches x fwd+bwd activation each
            relay_bytes = M * 2 * (ubatch * args.seq * args.d_model * 2)
            # grads: each stage all-reduces its 1/S of the tree over dp chips
            comm = (t_allreduce_ms(args.grad_mb * 1e6 / S, dp, args.ici_gbs)
                    + relay_bytes / (args.ici_gbs * 1e9) * 1e3)
            rows.append({
                "config": f"dp{dp}pp{S}", "microbatches": M,
                "bubble_pct": round(100 * bubble, 1),
                "compute_ms": round(comp, 2), "comm_ms": round(comm, 2),
                "total_ms": round(comp + comm, 2),
                "img_s": round(global_bs / (comp + comm) * 1e3, 0),
            })

    print(f"{'config':>10s} {'M':>4s} {'bubble':>7s} {'compute':>9s} "
          f"{'comm':>7s} {'total':>8s} {'img/s':>8s}")
    for r in rows:
        m = "-" if r["microbatches"] is None else str(r["microbatches"])
        print(f"{r['config']:>10s} {m:>4s} {r['bubble_pct']:>6.1f}% "
              f"{r['compute_ms']:>7.2f}ms {r['comm_ms']:>5.2f}ms "
              f"{r['total_ms']:>6.2f}ms {r['img_s']:>8,.0f}")

    out = {
        "model": "vit_b_16 (measured 100.9 ms bs128@224 single-chip train)",
        "ici_gbs_assumed": args.ici_gbs,
        "chips": n, "global_batch": global_bs,
        "note": ("no-overlap upper bound on comm; linear-in-batch compute "
                 "scaling assumed (holds bs>=32 on v5e, BENCHMARKS.md)"),
        "rows": rows,
    }
    Path(args.out).parent.mkdir(exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
