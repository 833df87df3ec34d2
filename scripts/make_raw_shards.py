#!/usr/bin/env python
"""Pre-decode an ImageFolder tree into raw-crop shards (.vtraw).

The offline half of the input-pipeline escape hatch (data/raw_shards.py):
every JPEG is decoded once — with the native C++ decoder when built, PIL
otherwise — squash-resized to (store, store) uint8, and written into
contiguous shards in a shuffled order (so a sequential read is already
well-mixed). Training then reads at memcpy speed.

    python scripts/make_raw_shards.py --src /data/train --out /data/train_raw \
        --store 200 --per-shard 5000
    python scripts/make_raw_shards.py --src /data/val --out /data/val_raw \
        --store 224   # val: store at the eval crop, reader center-crops

Replaces the role of the reference's scripts/wds.py:10-32 (shard packing)
for the decode-bound regime.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vision_toolbox_tpu.data.datasets import ImageFolder  # noqa: E402
from vision_toolbox_tpu.data.raw_shards import write_shard  # noqa: E402


def _decode_batch_native(paths: list[str], store: int, threads: int) -> np.ndarray:
    from vision_toolbox_tpu.data.native import decode_batch, jpeg_size

    jpegs, boxes, sizes = [], [], []
    for p in paths:
        with open(p, "rb") as f:
            data = f.read()
        W, H = jpeg_size(data)
        jpegs.append(data)
        boxes.append((0, 0, W, H))  # full frame -> squash resize
        sizes.append((W, H))
    flips = np.zeros((len(jpegs),), np.uint8)
    return decode_batch(jpegs, np.asarray(boxes), np.asarray(sizes), flips, store, threads)


def _decode_batch_pil(paths: list[str], store: int) -> np.ndarray:
    from PIL import Image

    out = np.empty((len(paths), store, store, 3), np.uint8)
    for j, p in enumerate(paths):
        with Image.open(p) as im:
            out[j] = np.asarray(im.convert("RGB").resize((store, store), Image.BILINEAR))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="ImageFolder root (class subdirs)")
    ap.add_argument("--out", required=True, help="output dir for .vtraw shards")
    ap.add_argument("--store", type=int, default=200,
                    help="stored square size; > train crop retains window diversity")
    ap.add_argument("--per-shard", type=int, default=5000)
    ap.add_argument("--threads", type=int, default=os.cpu_count() or 1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--pil", action="store_true", help="force the PIL decode path")
    args = ap.parse_args(argv)

    ds = ImageFolder(args.src)
    order = list(range(len(ds.samples)))
    random.Random(args.seed).shuffle(order)
    os.makedirs(args.out, exist_ok=True)

    use_native = not args.pil
    if use_native:
        from vision_toolbox_tpu.data.native import native_available

        use_native = native_available()
        if not use_native:
            print("native decoder unavailable — falling back to PIL", file=sys.stderr)

    shard_paths = []
    for si, start in enumerate(range(0, len(order), args.per_shard)):
        idxs = order[start : start + args.per_shard]
        paths = [ds.samples[i][0] for i in idxs]
        labels = np.asarray([ds.samples[i][1] for i in idxs], np.int32)
        jpeg_paths = [p for p in paths if p.lower().endswith((".jpg", ".jpeg"))]
        if use_native and len(jpeg_paths) == len(paths):
            images = _decode_batch_native(paths, args.store, args.threads)
        else:
            images = _decode_batch_pil(paths, args.store)
        name = f"shard-{si:05d}.vtraw"
        write_shard(os.path.join(args.out, name), images, labels)
        shard_paths.append(name)
        print(f"{name}: {len(idxs)} images @ {args.store}px")

    meta = {
        "classes": ds.classes,
        "store": args.store,
        "n": len(order),
        "shards": shard_paths,
        "src": os.path.abspath(args.src),
    }
    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(f"wrote {len(shard_paths)} shards, {len(order)} images -> {args.out}")


if __name__ == "__main__":
    main()
