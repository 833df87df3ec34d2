#!/usr/bin/env python
"""Roofline accounting for every BENCHMARKS.md model (round-3 verdict #2).

For each benchmarked (model, input, batch) row, lowers + compiles the SAME
production train step and inference forward used by benchmark_models.py, and
reports, from the compiled XLA cost analysis (post-fusion):

  * FLOPs/step and HBM bytes/step,
  * measured ms/step (host-readback fenced, steps chained to amortize the
    ~24 ms tunnel roundtrip — see CLAUDE.md),
  * achieved TFLOP/s and GB/s as a % of the v5e roofs, and which roof binds.

The reference's only perf tooling is fvcore FLOP counting
(/root/reference/extras.py:132-168); this extends the DESIGN.md §perf
method (CSPDarknet: 46 GB/step -> ~96% of HBM roofline) to the whole table.

    python scripts/roofline.py [--out artifacts/roofline.json]
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

jax.config.update("jax_compilation_cache_dir", str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# v5e single-chip roofs: 197 TFLOP/s bf16 MXU, ~819 GB/s HBM.
PEAK_TFLOPS = 197.0
PEAK_GBS = 819.0

# (name, kwargs, img, train_batch) — mirrors scripts/benchmark_models.py
MODELS = [
    ("cspdarknet53", {}, 176, 256),
    ("darknet53", {}, 176, 256),
    ("vovnet57", {}, 176, 256),
    ("resnet50", {}, 176, 256),
    ("convnext_t", {}, 224, 128),
    ("swin_t", {"img_size": 224}, 224, 128),
    ("vit_b_16", {"img_size": 224}, 224, 128),
    ("vit_l_16", {"img_size": 224}, 224, 32),
    ("vit_h_14", {"img_size": 224}, 224, 8),
    ("deit3_s_16", {"img_size": 224}, 224, 128),
    ("efficientnet_b0", {}, 224, 256),
]


def _cost(compiled) -> tuple[float, float]:
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", 0.0)), float(cost.get("bytes accessed", 0.0))


def analyze(name, kwargs, img, train_bs, steps=10):
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
    state = TrainState.create(model.apply, jax.tree_util.tree_map(jnp.copy, v), tx)
    step_fn = make_train_step(1000, compute_dtype=jnp.bfloat16)
    x = jax.random.uniform(jax.random.PRNGKey(1), (train_bs, img, img, 3), jnp.bfloat16)
    y = jax.random.randint(jax.random.PRNGKey(2), (train_bs,), 0, 1000)
    rng = jax.random.PRNGKey(3)

    step = jax.jit(step_fn, donate_argnums=(0,))
    compiled = step.lower(state, x, y, rng).compile()
    t_flops, t_bytes = _cost(compiled)

    for _ in range(2):
        state, m = step(state, x, y, rng)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, x, y, rng)
    float(m["loss"])
    train_ms = (time.perf_counter() - t0) / steps * 1e3

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    xi = jax.random.uniform(jax.random.PRNGKey(4), (train_bs, img, img, 3), jnp.bfloat16)
    f_flops, f_bytes = _cost(fwd.lower(v, xi).compile())
    out = fwd(v, xi)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fwd(v, xi)
    float(jnp.sum(out.astype(jnp.float32)))
    infer_ms = (time.perf_counter() - t0) / steps * 1e3

    def roof(flops, bytes_, ms):
        tflops = flops / ms * 1e3 / 1e12
        gbs = bytes_ / ms * 1e3 / 1e9
        pc, pb = tflops / PEAK_TFLOPS, gbs / PEAK_GBS
        # roofline time floor from the dominant resource
        floor_ms = max(flops / (PEAK_TFLOPS * 1e12), bytes_ / (PEAK_GBS * 1e9)) * 1e3
        return {
            "tflops": round(tflops, 1), "gbs": round(gbs, 1),
            "pct_compute_roof": round(100 * pc, 1),
            "pct_hbm_roof": round(100 * pb, 1),
            "bound": "compute" if flops / (PEAK_TFLOPS * 1e12) > bytes_ / (PEAK_GBS * 1e9) else "hbm",
            "pct_of_binding_roof": round(100 * floor_ms / ms, 1),
            "ms": round(ms, 2),
        }

    return {
        "model": name, "img": img, "batch": train_bs,
        "train": {"flops_T": round(t_flops / 1e12, 2), "bytes_GB": round(t_bytes / 1e9, 1),
                  **roof(t_flops, t_bytes, train_ms),
                  "img_s": round(train_bs / train_ms * 1e3)},
        "infer": {"flops_T": round(f_flops / 1e12, 2), "bytes_GB": round(f_bytes / 1e9, 1),
                  **roof(f_flops, f_bytes, infer_ms),
                  "img_s": round(train_bs / infer_ms * 1e3)},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/roofline.json")
    ap.add_argument("--models", nargs="*", default=None)
    args = ap.parse_args()

    rows = []
    for name, kwargs, img, tb in MODELS:
        if args.models and name not in args.models:
            continue
        r = analyze(name, kwargs, img, tb)
        rows.append(r)
        t = r["train"]
        print(
            f"{name:16s} train {t['ms']:7.2f} ms  {t['flops_T']:6.2f} TF  "
            f"{t['bytes_GB']:5.1f} GB  {t['tflops']:5.1f} TF/s ({t['pct_compute_roof']:4.1f}%)  "
            f"{t['gbs']:5.1f} GB/s ({t['pct_hbm_roof']:4.1f}%)  bound={t['bound']} "
            f"({t['pct_of_binding_roof']}% of roof)",
            flush=True,
        )
    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(rows, indent=1))
        print("wrote", args.out)


if __name__ == "__main__":
    main()
