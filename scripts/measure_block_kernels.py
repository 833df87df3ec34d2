#!/usr/bin/env python
"""In-model A/B/A for the transformer block megakernels (ops/block_mlp.py +
ops/block_attention.py) — the round-3 verdict's #1 perf item.

    python scripts/measure_block_kernels.py [--models vit_b_16,deit3_s_16]

Measures the PRODUCTION train step and batched inference with the fused
block kernels off/on/off in ONE process (CLAUDE.md measurement rule: the
tunnel's dispatch floor and transient wedges make standalone/off-bracket
numbers meaningless). Also runs attn-only / mlp-only arms to attribute the
delta per kernel.
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

import vision_toolbox_tpu.ops.block_attention as ba
import vision_toolbox_tpu.ops.block_mlp as bm

MODELS = {
    "vit_b_16": ({"img_size": 224}, 224, 128),
    # ViT-L exercises the hidden-split MLP chain (2 sequential kernel calls;
    # bm._ALLOW_HIDDEN_SPLIT is forced on below so the on-arm dispatches).
    # Flip the module default if this measures positive.
    # bs32: bs64's off-arm OOMs HBM (fp32 params+momentum 2.4 GB + XLA-path
    # MLP saves ~5 GB); 32×16 = 512 pairs still amortize the kernel grid.
    "vit_l_16": ({"img_size": 224}, 224, 32),
    "deit3_s_16": ({"img_size": 224}, 224, 128),
    "deit_b_16": ({"img_size": 224}, 224, 128),
    # MLP half-block only (windowed attention / dwconv stay on XLA)
    "swin_t": ({"img_size": 224}, 224, 128),
    # channel-mixing half only (token mixing's LN axis != MLP axis)
    "mixer_b_16": ({"img_size": 224}, 224, 128),
    "convnext_t": ({}, 224, 128),
    "cait_xxs_24": ({"img_size": 224}, 224, 128),
    # ViT-H: MLP hidden-split chain dispatches (4 slices); attention has no
    # in-budget 128-lane plan at the default 12 MiB program budget (ns=2
    # estimates 12.9 MiB) — pass --attn-budget-mib 14 to test whether the
    # slightly-over ns=2 plan compiles under Mosaic's 20 MiB and wins.
    "vit_h_14": ({"img_size": 224}, 224, 8),
}


def measure(name, kwargs, img, bs, steps=10, reps=3):
    from vision_toolbox_tpu import create_backbone
    from vision_toolbox_tpu.train import (
        ImageClassifier, TrainState, make_train_step, sgd_with_param_groups,
    )

    model = ImageClassifier(
        backbone=create_backbone(name, dtype=jnp.bfloat16, **kwargs),
        num_classes=1000, dtype=jnp.bfloat16,
    )
    v = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, img, img, 3)), train=False)
    x = jax.random.uniform(jax.random.PRNGKey(1), (bs, img, img, 3), jnp.bfloat16)
    y = jax.random.randint(jax.random.PRNGKey(2), (bs,), 0, 1000)
    rng = jax.random.PRNGKey(3)

    def run_train():
        tx = sgd_with_param_groups(v["params"], 0.1, momentum=0.9, weight_decay=2e-5)
        state = TrainState.create(model.apply, jax.tree_util.tree_map(jnp.copy, v), tx)
        step = jax.jit(make_train_step(1000, compute_dtype=jnp.bfloat16), donate_argnums=(0,))
        for _ in range(2):
            state, m = step(state, x, y, rng)
        float(m["loss"])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(steps):
                state, m = step(state, x, y, rng)
            float(m["loss"])
            best = min(best, (time.perf_counter() - t0) / steps)
        return best * 1e3, float(m["loss"])

    def run_infer():
        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
        out = fwd(v, x)
        float(jnp.sum(out.astype(jnp.float32)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(steps):
                out = fwd(v, x)
            float(jnp.sum(out.astype(jnp.float32)))
            best = min(best, (time.perf_counter() - t0) / steps)
        return best * 1e3

    results = {}
    arms = [
        ("off", True, True), ("attn", False, True), ("mlp", True, False),
        ("both", False, False), ("off2", True, True),
    ]
    for arm, dis_attn, dis_mlp in arms:
        ba._DISABLE = dis_attn
        bm._DISABLE = dis_mlp
        tr, loss = run_train()
        inf = run_infer()
        results[arm] = (tr, inf, loss)
        print(f"  {name} [{arm:5s}] train {tr:7.2f} ms/step  infer {inf:7.2f} ms  loss {loss:.4f}", flush=True)
    ba._DISABLE = bm._DISABLE = False
    off = min(results["off"][0], results["off2"][0])
    both = results["both"][0]
    print(f"  {name}: train off {off:.2f} -> both {both:.2f} ms  ({(off / both - 1) * 100:+.1f}%)  "
          f"infer {min(results['off'][1], results['off2'][1]):.2f} -> {results['both'][1]:.2f} ms", flush=True)
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--models", default="vit_b_16,deit3_s_16")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--attn-budget-mib", type=float, default=None,
                   help="override ops/block_attention._PROGRAM_BUDGET (MiB) "
                        "for the ViT-H ns=2 beyond-budget experiment")
    args = p.parse_args()
    if args.attn_budget_mib is not None:
        ba._PROGRAM_BUDGET = int(args.attn_budget_mib * 1024 * 1024)
    # admit the hidden-split MLP chain and the head-split attention chain so
    # the on-arms dispatch for ViT-L/H (no effect on single-call models; the
    # _DISABLE toggles drive the A/B)
    bm._ALLOW_HIDDEN_SPLIT = True
    ba._ALLOW_HEAD_SPLIT = True
    for name in args.models.split(","):
        kwargs, img, bs = MODELS[name]
        print(f"{name} (bs{bs}@{img}):", flush=True)
        measure(name, kwargs, img, bs, steps=args.steps)


if __name__ == "__main__":
    main()
