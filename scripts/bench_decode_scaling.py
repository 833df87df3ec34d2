#!/usr/bin/env python
"""Host-decode thread-scaling bench + duty-cycle model (verdict item #6b).

Drives the native C++ decoder (native/decoder.cpp thread pool) over an
in-memory JPEG working set with a sweep of thread counts, then composes a
feed model against a target chip consumption rate:

  duty(n) = decode_rate(n) / chip_rate       (fraction of the chip kept busy)
  cores_needed = chip_rate / per_thread_rate (threads at ~linear scaling)

On this 1-core VM the sweep shows the flat line it must (documented
environment limit — DESIGN.md input-pipeline section); on a multi-core host
the same command demonstrates the thread-pool scaling that the "~5 cores
feed one v5e" projection rests on:

    python scripts/bench_decode_scaling.py --threads 1,2,4,8,16 \
        --chip-rate 3974

Also sweeps the composed WebDataset path (num_streams reader threads ×
decoder pool) when --wds is given, since tar streaming + decode contend for
the same cores. Plays the role of the reference's torchvision-loader
num_workers tuning (/root/reference/data.py:63-86) for the TPU host.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def build_jpegs(n: int, seed: int = 0) -> tuple[list[bytes], np.ndarray]:
    """ImageNet-like 500x375 q87 JPEGs, in memory (isolates decode from IO)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    jpegs, sizes = [], []
    for _ in range(n):
        small = rng.integers(0, 256, (12, 16, 3), np.uint8)
        img = Image.fromarray(small).resize((500, 375), Image.BILINEAR)
        buf = io.BytesIO()
        img.save(buf, format="JPEG", quality=87)
        jpegs.append(buf.getvalue())
        sizes.append((500, 375))
    return jpegs, np.asarray(sizes, np.int32)


def bench_decode(jpegs, sizes, crop: int, n_threads: int, secs: float) -> float:
    import random

    from vision_toolbox_tpu.data.native import decode_batch, sample_rrc_box

    rng = random.Random(0)
    n = len(jpegs)
    boxes = np.asarray([sample_rrc_box(rng, 500, 375) for _ in range(n)], np.int32)
    flips = np.zeros(n, np.uint8)
    decode_batch(jpegs, boxes, sizes, flips, crop, n_threads)  # warm the pool
    done, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < secs:
        decode_batch(jpegs, boxes, sizes, flips, crop, n_threads)
        done += n
    return done / (time.perf_counter() - t0)


def bench_wds(jpegs, crop: int, num_streams: int, secs: float, tmp: Path,
              batch_size: int = 64) -> float:
    """Composed path: tar shards -> num_streams reader/decoder threads ->
    batch assembler (the production WDS ingestion, data/wds_loader.py)."""
    import functools
    import tarfile

    from vision_toolbox_tpu.data.transforms import train_transform
    from vision_toolbox_tpu.data.wds_loader import WebDatasetLoader

    shard_dir = tmp / "shards"
    if not (shard_dir / "done").exists():
        shard_dir.mkdir(parents=True, exist_ok=True)
        per = max(1, len(jpegs) // 8)
        for s in range(8):
            with tarfile.open(shard_dir / f"shard-{s:04d}.tar", "w") as tf:
                for i, data in enumerate(jpegs[s * per:(s + 1) * per]):
                    for ext, payload in ((".jpg", data), (".cls", str(i % 10).encode())):
                        info = tarfile.TarInfo(f"{s}{i:05d}{ext}")
                        info.size = len(payload)
                        tf.addfile(info, io.BytesIO(payload))
        (shard_dir / "done").touch()
    loader = WebDatasetLoader(
        sorted(str(p) for p in shard_dir.glob("shard-*.tar")),
        batch_size=batch_size,
        transform=functools.partial(train_transform, crop_size=crop),
        num_streams=num_streams, seed=0, per_host=False,
    )
    done, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < secs:
        for images, labels in loader:
            done += images.shape[0]
            if time.perf_counter() - t0 >= secs:
                break
    return done / (time.perf_counter() - t0)


def bench_raw(crop: int, secs: float, tmp: Path, store: int = 200,
              n_images: int = 12000, batch_size: int = 256) -> float:
    """Escape-hatch path: pre-decoded raw-crop shards (data/raw_shards.py) —
    loader-only feed rate on this host (memmap copy + crop + flip)."""
    from vision_toolbox_tpu.data.raw_shards import (
        RawShardDataset,
        RawShardLoader,
        write_shard,
    )

    raw_dir = tmp / "raw"
    if not (raw_dir / "done").exists():
        raw_dir.mkdir(parents=True, exist_ok=True)
        rng = np.random.default_rng(0)
        per = 4000
        for s in range(-(-n_images // per)):
            n = min(per, n_images - s * per)
            write_shard(str(raw_dir / f"shard_{s:04d}.vtraw"),
                        rng.integers(0, 256, (n, store, store, 3), np.uint8),
                        rng.integers(0, 100, n))
        (raw_dir / "done").touch()
    loader = RawShardLoader(RawShardDataset(str(raw_dir), preload=True),
                            batch_size, crop, training=True,
                            process_index=0, process_count=1)
    for _ in loader:  # first pass pays first-touch page costs
        pass
    done, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < secs:
        for images, labels in loader:
            done += images.shape[0]
            if time.perf_counter() - t0 >= secs:
                break
    return done / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", default="1,2,4,8")
    ap.add_argument("--images", type=int, default=256, help="working-set size")
    ap.add_argument("--crop", type=int, default=176)
    ap.add_argument("--secs", type=float, default=5.0, help="per-point duration")
    ap.add_argument("--chip-rate", type=float, default=3974.0,
                    help="img/s one chip consumes (BENCH_r03 full-recipe rate)")
    ap.add_argument("--wds", action="store_true", help="also sweep the WDS path")
    ap.add_argument("--raw", action="store_true",
                    help="also measure the raw-crop shard loader feed rate")
    ap.add_argument("--out", default="artifacts/decode_scaling.json")
    args = ap.parse_args()

    ncores = os.cpu_count() or 1
    jpegs, sizes = build_jpegs(args.images)
    print(f"host: {ncores} core(s); working set {args.images} JPEGs "
          f"(mean {np.mean([len(b) for b in jpegs]) / 1024:.0f} KiB), crop {args.crop}")

    rows = []
    for nt in (int(t) for t in args.threads.split(",")):
        rate = bench_decode(jpegs, sizes, args.crop, nt, args.secs)
        duty = rate / args.chip_rate
        rows.append({"threads": nt, "img_per_s": round(rate, 1),
                     "duty_vs_chip": round(duty, 3)})
        print(f"  decode pool {nt:2d} thread(s): {rate:7.0f} img/s  "
              f"duty {duty * 100:5.1f}% of one chip", flush=True)

    # img/s/thread from the SMALLEST sweep point (exact if it is 1 thread,
    # a linearity assumption otherwise — don't require --threads to start at 1)
    base = min(rows, key=lambda r: r["threads"])
    per_thread = base["img_per_s"] / base["threads"]
    need = args.chip_rate / per_thread
    # scaling efficiency across the sweep (1.0 = linear); on a 1-core host
    # this necessarily reads ~1/threads — the harness exists for real hosts
    best = max(rows, key=lambda r: r["img_per_s"])
    eff = best["img_per_s"] / (per_thread * best["threads"])
    print(f"model: {per_thread:.0f} img/s/thread -> ~{need:.1f} threads to feed "
          f"one chip at {args.chip_rate:.0f} img/s; pool efficiency at "
          f"{best['threads']} threads: {eff * 100:.0f}%")

    wds_rows = []
    if args.wds:
        tmp = Path("/tmp/vtt_decode_bench")
        for ns in (1, 2, 4):
            rate = bench_wds(jpegs, args.crop, ns, args.secs, tmp)
            wds_rows.append({"num_streams": ns, "img_per_s": round(rate, 1)})
            print(f"  wds {ns} stream(s): {rate:7.0f} img/s", flush=True)

    raw_row = None
    if args.raw:
        rate = bench_raw(args.crop, args.secs, Path("/tmp/vtt_decode_bench"))
        raw_row = {"img_per_s": round(rate, 1),
                   "duty_vs_chip": round(rate / args.chip_rate, 3)}
        print(f"  raw shards (1 core): {rate:7.0f} img/s  "
              f"duty {raw_row['duty_vs_chip'] * 100:5.1f}% of one chip", flush=True)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({
        "host_cores": ncores, "crop": args.crop, "chip_rate": args.chip_rate,
        "per_thread_img_s": per_thread, "threads_to_feed_chip": round(need, 1),
        "decode": rows, "wds": wds_rows, "raw": raw_row,
    }, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
