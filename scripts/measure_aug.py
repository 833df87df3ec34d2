"""Measure the device-side augmentation cost on the real TPU chip:
(a) trivial_augment_wide alone, (b) random_erasing alone, (c) the full
recipe train step (TA + RE + CutMix/MixUp) vs the default step.

Timing rule (CLAUDE.md): chain steps, end with one host readback as the fence.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def time_op(fn, *args, n=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    fence(out if not isinstance(out, tuple) else out[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fence(out if not isinstance(out, tuple) else out[0])
    return (time.perf_counter() - t0) / n


def main():
    batch, img = 256, 176
    images = jax.random.uniform(jax.random.PRNGKey(0), (batch, img, img, 3), jnp.float32)
    rng = jax.random.PRNGKey(1)

    from vision_toolbox_tpu.ops.augment import random_erasing
    from vision_toolbox_tpu.ops.trivial_augment import trivial_augment_wide

    ta = jax.jit(trivial_augment_wide)
    dt = time_op(ta, rng, images)
    print(f"trivial_augment_wide bs{batch}@{img}: {dt*1e3:.2f} ms ({batch/dt:.0f} img/s)")

    re_ = jax.jit(lambda r, x: random_erasing(r, x, 0.1))
    dt = time_op(re_, rng, images)
    print(f"random_erasing bs{batch}@{img}: {dt*1e3:.2f} ms")

    # full recipe vs default train step
    from vision_toolbox_tpu import create_backbone
    from vision_toolbox_tpu.train import (
        ImageClassifier,
        TrainState,
        make_train_step,
        sgd_with_param_groups,
        warmup_cosine_schedule,
    )

    num_classes = 1000
    model = ImageClassifier(
        backbone=create_backbone("cspdarknet53", dtype=jnp.bfloat16),
        num_classes=num_classes,
        dtype=jnp.bfloat16,
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, img, img, 3)), train=False)
    schedule = warmup_cosine_schedule(0.5 * batch / 1024, 100, 5004)
    labels = jax.random.randint(jax.random.PRNGKey(2), (batch,), 0, num_classes)

    for name, kwargs in [
        ("default (no TA/RE)", {}),
        ("full recipe (TA+RE)", {"trivial_augment": True, "random_erasing_p": 0.1}),
    ]:
        # fresh copy per config: the step donates its state, and `variables`
        # must survive for the next config
        fresh = jax.tree_util.tree_map(jnp.array, variables)
        tx = sgd_with_param_groups(fresh["params"], schedule, momentum=0.9, weight_decay=2e-5)
        state = TrainState.create(model.apply, fresh, tx)
        step = jax.jit(
            make_train_step(num_classes, compute_dtype=jnp.bfloat16, **kwargs),
            donate_argnums=(0,),
        )
        imgs = images.astype(jnp.bfloat16) if not kwargs else images
        for _ in range(3):
            state, metrics = step(state, imgs, labels, rng)
        float(metrics["loss"])
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = step(state, imgs, labels, rng)
        float(metrics["loss"])
        dt = (time.perf_counter() - t0) / n
        print(f"train step {name}: {dt*1e3:.2f} ms ({batch/dt:.0f} img/s)")


if __name__ == "__main__":
    main()
