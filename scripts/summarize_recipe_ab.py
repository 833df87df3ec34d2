#!/usr/bin/env python
"""Summarize the 100-epoch full-vs-small recipe A/B (VERDICT r4 item 1).

Reads the two arms' metrics.jsonl, prints the comparison table + writes
artifacts/recipe_ab_100.json. The reference's central training claim is that
its full recipe (TrivialAugment + RandomErasing + CutMix⊕MixUp + label
smoothing + FixRes 176, /root/reference/README.md:81-97, data.py:44-52)
out-trains the bare "small" recipe at the 100-epoch horizon; this A/B
validates the re-implemented device-side augmentation numerics end-to-end.

    python scripts/summarize_recipe_ab.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def load(path):
    rows = [json.loads(l) for l in open(path)]
    eps = [r for r in rows if "epoch_time_s" in r]
    return eps


def arm_stats(eps):
    accs = [(r["epoch"], r.get("val/acc", 0.0)) for r in eps if "val/acc" in r]
    best_ep, best = max(accs, key=lambda t: t[1])
    return {
        "epochs": len(eps),
        "final_val_acc": accs[-1][1],
        "best_val_acc": best,
        "best_epoch": best_ep,
        "final_val_acc5": eps[-1].get("val/acc5"),
        "final_val_loss": eps[-1].get("val/loss"),
        # last-10-epoch mean: robust to single-epoch noise at the horizon
        "tail10_mean_val_acc": sum(a for _, a in accs[-10:]) / max(1, len(accs[-10:])),
    }


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", default="artifacts/synth_hard_100_full_metrics.jsonl")
    ap.add_argument("--small", default="artifacts/synth_hard_100_small_metrics.jsonl")
    ap.add_argument("--out", default="artifacts/recipe_ab_100.json")
    args = ap.parse_args()
    full_p = Path(args.full)
    small_p = Path(args.small)
    for p in (full_p, small_p):
        if not p.exists():
            sys.exit(f"{p} missing — run scripts/run_recipe_ab.sh first")
    full, small = arm_stats(load(full_p)), arm_stats(load(small_p))
    delta_best = full["best_val_acc"] - small["best_val_acc"]
    delta_tail = full["tail10_mean_val_acc"] - small["tail10_mean_val_acc"]
    out = {"full": full, "small": small,
           "delta_best_val_acc": round(delta_best, 4),
           "delta_tail10_val_acc": round(delta_tail, 4),
           "conclusion": (
               "full recipe overtakes small at the 100-epoch horizon"
               if delta_best > 0 else
               "full recipe does NOT overtake small — investigate aug numerics"
           )}
    print(f"{'':14s}{'epochs':>8s}{'best':>9s}{'@ep':>5s}{'final':>9s}{'tail10':>9s}")
    for name, s in (("full", full), ("small", small)):
        print(f"{name:14s}{s['epochs']:8d}{s['best_val_acc']:9.4f}"
              f"{s['best_epoch']:5d}{s['final_val_acc']:9.4f}"
              f"{s['tail10_mean_val_acc']:9.4f}")
    print(f"delta (full - small): best {delta_best:+.4f}, tail10 {delta_tail:+.4f}")
    print(out["conclusion"])
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
