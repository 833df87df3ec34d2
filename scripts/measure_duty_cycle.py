#!/usr/bin/env python
"""End-to-end input duty cycle: loader OVERLAPPED with the real train step.

The missing half of the input story (round-4 verdict item 2a): decode rates
and chip rates were measured separately; this script runs them TOGETHER in
one process — loader thread(s) + prefetch_to_device + the production
cspdarknet train step on the real chip — and reports:

  * synth img/s   — step rate with on-device synthetic data (no input cost)
  * jpeg  img/s   — native C++ JPEG decode loader feeding the same step
  * raw   img/s   — pre-decoded raw-crop shard loader (data/raw_shards.py)
  * duty          — fed rate / synth rate per loader

A duty near 1.0 means the loader hides behind the step (prefetch overlap
works); the JPEG duty on this 1-core host is the documented environment
limit, the raw-shard duty is the framework answer. Plays the role of the
reference's num_workers=8 loader tuning (/root/reference/data.py:63-86) for
a TPU host.

    python scripts/measure_duty_cycle.py --steps 40 --batch 256

Writes artifacts/duty_cycle.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def build_corpus(root: Path, n: int, classes: int = 10, side: int = 500) -> None:
    """Real JPEG files on disk (IO + decode both in the measurement)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    for i in range(n):
        d = root / f"class_{i % classes:03d}"
        d.mkdir(parents=True, exist_ok=True)
        small = rng.integers(0, 256, (12, 16, 3), np.uint8)
        img = Image.fromarray(small).resize((side, int(side * 0.75)), Image.BILINEAR)
        img.save(d / f"img_{i:05d}.jpg", quality=87)


def make_step(batch: int, crop: int, num_classes: int):
    import jax
    import jax.numpy as jnp

    from vision_toolbox_tpu import create_backbone
    from vision_toolbox_tpu.train import (
        ImageClassifier,
        TrainState,
        make_train_step,
        sgd_with_param_groups,
        warmup_cosine_schedule,
    )

    model = ImageClassifier(
        backbone=create_backbone("cspdarknet53", dtype=jnp.bfloat16),
        num_classes=num_classes, dtype=jnp.bfloat16,
    )
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, crop, crop, 3)), train=False)
    tx = sgd_with_param_groups(
        variables["params"], warmup_cosine_schedule(0.5, 100, 100),
        momentum=0.9, weight_decay=2e-5,
    )
    state = TrainState.create(model.apply, variables, tx)
    step = jax.jit(make_train_step(num_classes))
    return state, step


def run_fed(state, step, loader, steps: int, batch: int) -> float:
    """Loader -> prefetch_to_device -> train step; host-readback fenced."""
    import itertools
    import jax

    from vision_toolbox_tpu.data.loader import prefetch_to_device

    def forever():
        while True:
            yield from loader

    it = prefetch_to_device(itertools.islice(forever(), steps + 5), size=2)
    rng = jax.random.PRNGKey(0)
    # warmup (compile + pool spin-up)
    for _ in range(3):
        images, labels = next(it)
        state, metrics = step(state, images, labels, rng)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        images, labels = next(it)
        state, metrics = step(state, images, labels, rng)
    float(metrics["loss"])  # fence: tunnel block_until_ready returns early
    return steps * batch / (time.perf_counter() - t0)


def run_synth(state, step, steps: int, batch: int, crop: int) -> float:
    import jax
    import jax.numpy as jnp

    images = jnp.zeros((batch, crop, crop, 3), jnp.uint8)
    labels = jnp.zeros((batch,), jnp.int32)
    rng = jax.random.PRNGKey(0)
    for _ in range(3):
        state, metrics = step(state, images, labels, rng)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, images, labels, rng)
    float(metrics["loss"])
    return steps * batch / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--crop", type=int, default=176)
    ap.add_argument("--n-images", type=int, default=4096)
    ap.add_argument("--threads", type=int, default=os.cpu_count() or 1)
    ap.add_argument("--corpus", default="/tmp/vtt_duty_corpus")
    ap.add_argument("--out", default="artifacts/duty_cycle.json")
    args = ap.parse_args()

    from vision_toolbox_tpu.data.datasets import ImageFolder
    from vision_toolbox_tpu.data.native import NativeJPEGLoader, native_available
    from vision_toolbox_tpu.data.raw_shards import RawShardDataset, RawShardLoader

    corpus = Path(args.corpus)
    if not (corpus / "class_000").exists():
        print(f"building {args.n_images}-JPEG corpus at {corpus} ...")
        build_corpus(corpus, args.n_images)

    raw_dir = corpus.parent / (corpus.name + "_raw")
    if not (raw_dir / "meta.json").exists():
        print(f"pre-decoding to raw shards at {raw_dir} ...")
        from make_raw_shards import main as make_raw

        make_raw(["--src", str(corpus), "--out", str(raw_dir),
                  "--store", "200", "--per-shard", "4096",
                  "--threads", str(args.threads)])

    state, step = make_step(args.batch, args.crop, 10)
    results = {"batch": args.batch, "crop": args.crop, "steps": args.steps,
               "host_cores": os.cpu_count()}

    synth = run_synth(state, step, args.steps, args.batch, args.crop)
    results["synth_img_s"] = round(synth, 1)
    print(f"synth: {synth:,.0f} img/s (no input cost)")

    # the H2D link itself: ceiling any host-fed loader shares (through the
    # dev tunnel this is the binding term; a PCIe host moves it to ~GB/s)
    import jax
    import jax.numpy as jnp

    batch_np = np.zeros((args.batch, args.crop, args.crop, 3), np.uint8)
    d = jax.device_put(batch_np)
    float(jnp.sum(d[0, 0, 0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(8):
        d = jax.device_put(batch_np)
        float(jnp.sum(d[0, 0, 0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / 8
    h2d_rate = args.batch / dt
    results["h2d_mb_s"] = round(batch_np.nbytes / dt / 1e6, 1)
    results["h2d_img_s"] = round(h2d_rate, 1)
    print(f"h2d link: {results['h2d_mb_s']} MB/s = {h2d_rate:,.0f} img/s ceiling "
          f"for any host-fed loader at this batch geometry")

    ds_raw = RawShardDataset(str(raw_dir), preload=True)
    raw_loader = RawShardLoader(ds_raw, args.batch, args.crop, training=True)
    # spin one epoch first: epoch-0 batches pay first-touch page costs on the
    # freshly copied arrays (measured 4k vs 20k img/s standalone)
    for _ in raw_loader:
        pass
    raw = run_fed(state, step, raw_loader, args.steps, args.batch)
    results["raw_img_s"] = round(raw, 1)
    results["raw_duty"] = round(raw / synth, 3)
    print(f"raw shards: {raw:,.0f} img/s  duty {raw / synth:.1%}")

    # device-resident mode: store in HBM, per-step H2D = a (B,) index vector
    from vision_toolbox_tpu.data.raw_shards import DeviceIndexLoader
    from vision_toolbox_tpu.train.step import (
        make_device_data_train_step,
        shard_device_data_train_step,
    )
    from vision_toolbox_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(("data",))
    store_imgs = np.concatenate([np.asarray(s.images) for s in ds_raw.shards])
    store_labels = ds_raw._labels_flat.astype(np.int32)
    d_imgs = jax.device_put(store_imgs)
    d_labels = jax.device_put(store_labels)
    dev_step = shard_device_data_train_step(
        make_device_data_train_step(10, args.crop), mesh
    )
    idx_loader = DeviceIndexLoader(len(store_imgs), store_labels, args.batch)
    state2, _ = make_step(args.batch, args.crop, 10)[0], None
    rng = jax.random.PRNGKey(0)
    it = iter(idx_loader)

    def next_idx():
        nonlocal it
        try:
            return next(it)[0]
        except StopIteration:
            it = iter(idx_loader)
            return next(it)[0]

    for _ in range(3):
        state2, m = dev_step(state2, d_imgs, d_labels, jnp.asarray(next_idx()), rng)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state2, m = dev_step(state2, d_imgs, d_labels, jnp.asarray(next_idx()), rng)
    float(m["loss"])
    dev = args.steps * args.batch / (time.perf_counter() - t0)
    results["device_resident_img_s"] = round(dev, 1)
    results["device_resident_duty"] = round(dev / synth, 3)
    print(f"device-resident: {dev:,.0f} img/s  duty {dev / synth:.1%} "
          f"(store {store_imgs.nbytes / 1e9:.2f} GB in HBM, on-device RRC)")

    if native_available():
        folder = ImageFolder(str(corpus))
        jpeg_loader = NativeJPEGLoader(folder, args.batch, args.crop,
                                       num_threads=args.threads)
        jpeg = run_fed(state, step, jpeg_loader, args.steps, args.batch)
        results["jpeg_img_s"] = round(jpeg, 1)
        results["jpeg_duty"] = round(jpeg / synth, 3)
        print(f"native jpeg: {jpeg:,.0f} img/s  duty {jpeg / synth:.1%}")
    else:
        print("native decoder unavailable — jpeg leg skipped")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
