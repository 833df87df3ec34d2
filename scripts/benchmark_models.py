#!/usr/bin/env python
"""Per-model throughput sweep on one TPU chip → markdown table.

    python scripts/benchmark_models.py [--out BENCHMARKS.md]

Times the production train step (bf16, label-smoothed CE, SGD) and the
inference forward for a representative model set. Timing is fenced with a
host readback (see CLAUDE.md: block_until_ready is unreliable on the tunnel).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# (name, kwargs, img, train_batch, infer_batch)
MODELS = [
    ("cspdarknet53", {}, 176, 256, 256),
    ("darknet53", {}, 176, 256, 256),
    ("vovnet57", {}, 176, 256, 256),
    ("resnet50", {}, 176, 256, 256),
    ("convnext_t", {}, 224, 128, 256),
    ("swin_t", {"img_size": 224}, 224, 128, 256),
    ("vit_b_16", {"img_size": 224}, 224, 128, 256),
    # bs32 train: bs64's fp32 params+momentum + XLA-path saves OOM HBM
    # (round-4 sweep poisoned every later row; STATUS.md)
    ("vit_l_16", {"img_size": 224}, 224, 32, 128),
    # first ViT-H numbers (round-4 verdict item 5): hidden-split MLP chain
    # dispatches; attention has no in-budget aligned plan and runs on XLA
    ("vit_h_14", {"img_size": 224}, 224, 8, 32),
    ("deit3_s_16", {"img_size": 224}, 224, 128, 256),
    ("cait_xxs_24", {"img_size": 224}, 224, 128, 256),
    ("efficientnet_b0", {}, 224, 256, 256),
]


def bench_model(name, kwargs, img, train_bs, infer_bs, steps=10):
    from vision_toolbox_tpu import create_backbone
    from vision_toolbox_tpu.train import (
        ImageClassifier, TrainState, make_train_step, sgd_with_param_groups,
    )

    model = ImageClassifier(
        backbone=create_backbone(name, dtype=jnp.bfloat16, **kwargs),
        num_classes=1000, dtype=jnp.bfloat16,
    )
    v = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, img, img, 3)), train=False)
    tx = sgd_with_param_groups(v["params"], 0.1, momentum=0.9, weight_decay=2e-5)
    # the step donates its state; give it its own buffers so `v` stays alive
    # for the inference benchmark below
    state = TrainState.create(model.apply, jax.tree_util.tree_map(jnp.copy, v), tx)
    step = jax.jit(make_train_step(1000, compute_dtype=jnp.bfloat16), donate_argnums=(0,))
    x = jax.random.uniform(jax.random.PRNGKey(1), (train_bs, img, img, 3), jnp.bfloat16)
    y = jax.random.randint(jax.random.PRNGKey(2), (train_bs,), 0, 1000)
    rng = jax.random.PRNGKey(3)

    for _ in range(2):
        state, m = step(state, x, y, rng)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, x, y, rng)
    float(m["loss"])
    train_ips = train_bs * steps / (time.perf_counter() - t0)

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    xi = jax.random.uniform(jax.random.PRNGKey(4), (infer_bs, img, img, 3), jnp.bfloat16)
    out = fwd(v, xi)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fwd(v, xi)
    float(jnp.sum(out.astype(jnp.float32)))
    infer_ips = infer_bs * steps / (time.perf_counter() - t0)

    n_params = sum(p.size for p in jax.tree_util.tree_leaves(v["params"])) / 1e6
    return n_params, train_ips, infer_ips


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=None)
    parser.add_argument("--models", default=None,
                        help="comma-separated subset (rerun rows in a fresh "
                             "process — an OOM poisons the client for every "
                             "later model in the same run)")
    args = parser.parse_args()
    selected = None
    if args.models:
        selected = {s.strip() for s in args.models.split(",") if s.strip()}
        known = {name for name, *_ in MODELS}
        unknown = selected - known
        if unknown:
            parser.error(f"unknown --models entries {sorted(unknown)}; "
                         f"choose from {sorted(known)}")
        if args.out:
            # a subset run writes a partial table — never silently clobber a
            # complete one
            print(f"NOTE: --models subset run; marking {args.out} as partial")

    lines = [
        "# BENCHMARKS — 1× TPU v5e, bf16, synthetic data",
        *([f"", f"**PARTIAL: --models subset run ({args.models})** — do not "
           f"overwrite a complete table with this file."] if selected else []),
        "",
        "Production train step (device-side CutMix/MixUp, label-smoothed CE,",
        "SGD) and inference forward; host-readback fenced timing.",
        "",
        "| Model | Params (M) | Input | Train img/s | Infer img/s |",
        "|---|---|---|---|---|",
    ]
    for name, kwargs, img, tb, ib in MODELS:
        if selected is not None and name not in selected:
            continue
        try:
            params, train_ips, infer_ips = bench_model(name, kwargs, img, tb, ib)
            row = f"| {name} | {params:.1f} | {img}²·bs{tb} | {train_ips:,.0f} | {infer_ips:,.0f} |"
        except Exception as e:  # noqa: BLE001
            row = f"| {name} | — | {img}² | failed: {str(e)[:40]} | |"
        print(row, flush=True)
        lines.append(row)
    if args.out:
        Path(args.out).write_text("\n".join(lines) + "\n")
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
