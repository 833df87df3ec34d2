#!/usr/bin/env python
"""Attribute the full-recipe aug overhead IN-MODEL (round-4 verdict item 8).

bench.py's full-recipe step pays ~5.9 ms over the bare step (64.5 vs 58.6 ms
at bs256@176); TA accounts ~4 ms, the residual ~2 ms was never attributed.
This script runs the PRODUCTION cspdarknet53 train step with each aug stage
toggled independently, all arms in ONE process with a bare re-bracket at the
end (CLAUDE.md: standalone op timings mislead; deltas must be in-model A/B/A).

Arms: bare / +mix / +TA / +RE / full / bare2.

    python scripts/measure_aug_ablation.py
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

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--img", type=int, default=176)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="artifacts/aug_ablation.json")
    args = ap.parse_args()

    from vision_toolbox_tpu import create_backbone
    from vision_toolbox_tpu.train import (
        ImageClassifier, TrainState, make_train_step, sgd_with_param_groups,
    )

    model = ImageClassifier(
        backbone=create_backbone("cspdarknet53", dtype=jnp.bfloat16),
        num_classes=1000, dtype=jnp.bfloat16,
    )
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, args.img, args.img, 3)), train=False)
    # uint8 input: the production path (native loader ships uint8)
    x = jax.random.randint(jax.random.PRNGKey(1),
                           (args.batch, args.img, args.img, 3), 0, 255, jnp.uint8)
    y = jax.random.randint(jax.random.PRNGKey(2), (args.batch,), 0, 1000)
    rng = jax.random.PRNGKey(3)

    arms = [
        ("bare", dict(mixup_alpha=0.0, cutmix_alpha=0.0, trivial_augment=False,
                      random_erasing_p=0.0)),
        ("+mix", dict(mixup_alpha=0.2, cutmix_alpha=1.0, trivial_augment=False,
                      random_erasing_p=0.0)),
        ("+TA", dict(mixup_alpha=0.0, cutmix_alpha=0.0, trivial_augment=True,
                     random_erasing_p=0.0)),
        ("+RE", dict(mixup_alpha=0.0, cutmix_alpha=0.0, trivial_augment=False,
                     random_erasing_p=0.1)),
        ("full", dict(mixup_alpha=0.2, cutmix_alpha=1.0, trivial_augment=True,
                      random_erasing_p=0.1)),
        ("bare2", dict(mixup_alpha=0.0, cutmix_alpha=0.0, trivial_augment=False,
                       random_erasing_p=0.0)),
    ]
    results = {}
    for name, kw in arms:
        tx = sgd_with_param_groups(v["params"], 0.1, momentum=0.9, weight_decay=2e-5)
        state = TrainState.create(model.apply, jax.tree_util.tree_map(jnp.copy, v), tx)
        step = jax.jit(make_train_step(1000, compute_dtype=jnp.bfloat16, **kw),
                       donate_argnums=(0,))
        for _ in range(3):
            state, m = step(state, x, y, rng)
        float(m["loss"])
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, m = step(state, x, y, rng)
            float(m["loss"])
            best = min(best, (time.perf_counter() - t0) / args.steps)
        results[name] = round(best * 1e3, 3)
        print(f"  {name:6s}: {best*1e3:7.3f} ms/step  "
              f"({args.batch/best:,.0f} img/s)", flush=True)

    bare = min(results["bare"], results["bare2"])
    print("\nattribution (delta over bare, in-model):")
    for name in ("+mix", "+TA", "+RE", "full"):
        print(f"  {name:6s}: +{results[name]-bare:6.3f} ms")
    print(f"  sum of singles: +{sum(results[n]-bare for n in ('+mix','+TA','+RE')):6.3f} ms"
          f"  vs full: +{results['full']-bare:6.3f} ms "
          f"(difference = fusion interactions)")
    Path(args.out).parent.mkdir(exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"batch": args.batch, "img": args.img, **results,
                   "bare_best": bare}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
