#!/usr/bin/env python
"""In-model A/B/A for the fused shifted-window relayout (ops/swin_relayout.py)
on swin_t's production train step + batched inference. Flips the kernel's
_ENABLED flag per arm in ONE process (CLAUDE.md measurement rule; block-MLP
kernels stay at their production dispatch in every arm). A win here means
the dispatch default should be turned on in ops/swin_relayout.py.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import vision_toolbox_tpu.ops.swin_relayout as sr


def run(bs=128, img=224, steps=10, reps=3):
    from vision_toolbox_tpu import create_backbone
    from vision_toolbox_tpu.train import (
        ImageClassifier, TrainState, make_train_step, sgd_with_param_groups,
    )

    model = ImageClassifier(
        backbone=create_backbone("swin_t", img_size=img, dtype=jnp.bfloat16),
        num_classes=1000, dtype=jnp.bfloat16,
    )
    v = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, img, img, 3)), train=False)
    x = jax.random.uniform(jax.random.PRNGKey(1), (bs, img, img, 3), jnp.bfloat16)
    y = jax.random.randint(jax.random.PRNGKey(2), (bs,), 0, 1000)
    rng = jax.random.PRNGKey(3)

    def train_ms():
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
        return best * 1e3

    def infer_ms():
        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
        float(jnp.sum(fwd(v, x).astype(jnp.float32)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(steps):
                out = fwd(v, x)
            float(jnp.sum(out.astype(jnp.float32)))
            best = min(best, (time.perf_counter() - t0) / steps)
        return best * 1e3

    results = {}
    for arm, enabled in (("off", False), ("on", True), ("off2", False)):
        sr._ENABLED = enabled
        tr, inf = train_ms(), infer_ms()
        results[arm] = (tr, inf)
        print(f"  swin_t [relayout {arm:4s}] train {tr:7.2f} ms/step  infer {inf:7.2f} ms", flush=True)
    sr._ENABLED = False
    off = min(results["off"][0], results["off2"][0])
    on = results["on"][0]
    print(f"swin_t train: relayout off {off:.2f} -> on {on:.2f} ms ({(off / on - 1) * 100:+.1f}%); "
          f"infer {min(results['off'][1], results['off2'][1]):.2f} -> {results['on'][1]:.2f} ms")


if __name__ == "__main__":
    run()
