#!/usr/bin/env python
"""ImageFolder → WebDataset-style .tar shards (reference scripts/wds.py:10-32
equivalent, stdlib tarfile — no webdataset dependency).

Sample layout per shard member pair: {key}.jpg (raw bytes) + {key}.cls
(class index as ascii). ~1 GB shards, optional global shuffle.

    python scripts/wds.py --data-dir train --save-dir shards --shuffle
"""

from __future__ import annotations

import argparse
import io
import os
import random
import tarfile


IMG_EXTENSIONS = (".jpg", ".jpeg", ".png")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--save-dir", required=True)
    parser.add_argument("--shard-size-gb", type=float, default=1.0)
    parser.add_argument("--shuffle", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    classes = sorted(
        d for d in os.listdir(args.data_dir) if os.path.isdir(os.path.join(args.data_dir, d))
    )
    samples = []
    for idx, cls in enumerate(classes):
        cdir = os.path.join(args.data_dir, cls)
        for fname in sorted(os.listdir(cdir)):
            if fname.lower().endswith(IMG_EXTENSIONS):
                samples.append((os.path.join(cdir, fname), idx))
    if args.shuffle:
        random.Random(args.seed).shuffle(samples)

    os.makedirs(args.save_dir, exist_ok=True)
    limit = int(args.shard_size_gb * 1e9)
    shard_idx, written, tf = 0, 0, None

    def open_shard(i):
        return tarfile.open(os.path.join(args.save_dir, f"{i:05d}.tar"), "w")

    tf = open_shard(shard_idx)
    for key, (path, cls) in enumerate(samples):
        with open(path, "rb") as f:
            img_bytes = f.read()
        cls_bytes = str(cls).encode()
        for suffix, data in ((".jpg", img_bytes), (".cls", cls_bytes)):
            info = tarfile.TarInfo(f"{key:08d}{suffix}")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
        written += len(img_bytes) + len(cls_bytes)
        if written >= limit:
            tf.close()
            shard_idx += 1
            written = 0
            tf = open_shard(shard_idx)
    tf.close()
    print(f"wrote {len(samples)} samples into {shard_idx + 1} shards at {args.save_dir}")


if __name__ == "__main__":
    main()
