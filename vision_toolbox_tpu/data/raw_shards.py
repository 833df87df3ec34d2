"""Pre-decoded raw-crop shard format — the input-pipeline escape hatch.

The reference feeds training from JPEG decode in DataLoader workers
(data.py:63-86, num_workers=8). On a host with few cores JPEG decode cannot
keep a TPU chip fed (measured: 1,026 img/s/core native decode vs ~4k img/s
chip rate, artifacts/decode_scaling.json). This module trades disk bytes for
host CPU: images are decoded ONCE offline into fixed-size uint8 HWC crops
stored contiguously in shard files, and the training-time "decode" is a
memmap copy — per image a ~100 KB memcpy plus a random-crop slice, hundreds
of MB/s on a single core.

Format (one ``.vtraw`` file per shard)::

    magic   b"VTRAW001"                     (8 bytes)
    n       u32 little-endian               image count
    h, w, c u16 little-endian each          stored image geometry
    labels  i32[n]                          little-endian
    data    u8[n, h, w, c]                  C-contiguous

A ``meta.json`` beside the shards records classes / geometry / counts.

What is given up relative to online RandomResizedCrop: the stored image is a
fixed squash-resize of the full frame to (store,store), so per-epoch scale
diversity is reduced to random (crop,crop)-window + hflip on the host plus
the device-side TrivialAugment warp (shear/translate) — the same trade FFCV
makes. Store at ``store > crop`` (e.g. 200 for a 176 train crop) to retain
translation diversity.

Multi-host: the loader splits the global index range per JAX process
(process_index/process_count), mirroring ``shard_for_host`` semantics.
"""

from __future__ import annotations

import json
import os
import random
import struct
from typing import Iterator

import numpy as np

MAGIC = b"VTRAW001"
_HEADER = struct.Struct("<8sIHHH")  # magic, n, h, w, c


def write_shard(path: str, images: np.ndarray, labels: np.ndarray) -> None:
    """``images``: uint8 (n, h, w, c) C-contiguous; ``labels``: int (n,)."""
    images = np.ascontiguousarray(images, np.uint8)
    labels = np.ascontiguousarray(labels, np.int32)
    n, h, w, c = images.shape
    assert labels.shape == (n,), (labels.shape, n)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_HEADER.pack(MAGIC, n, h, w, c))
        f.write(labels.tobytes())
        f.write(images.tobytes())
    os.replace(tmp, path)  # atomic: no torn shards on preemption


class RawShard:
    """One memmapped shard: ``.labels`` i32 (n,), ``.images`` uint8 view."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            head = f.read(_HEADER.size)
        magic, n, h, w, c = _HEADER.unpack(head)
        if magic != MAGIC:
            raise ValueError(f"{path}: not a VTRAW001 shard (magic {magic!r})")
        self.n, self.h, self.w, self.c = n, h, w, c
        off = _HEADER.size
        self.labels = np.memmap(path, np.int32, "r", offset=off, shape=(n,))
        off += 4 * n
        self.images = np.memmap(path, np.uint8, "r", offset=off, shape=(n, h, w, c))

    def __len__(self) -> int:
        return self.n


class RawShardDataset:
    """Directory of ``.vtraw`` shards, indexable as one flat dataset."""

    def __init__(self, root: str):
        self.root = root
        paths = sorted(
            os.path.join(root, f) for f in os.listdir(root) if f.endswith(".vtraw")
        )
        if not paths:
            raise FileNotFoundError(f"no .vtraw shards under {root}")
        self.shards = [RawShard(p) for p in paths]
        g = self.shards[0]
        for s in self.shards:
            if (s.h, s.w, s.c) != (g.h, g.w, g.c):
                raise ValueError(f"{s.path}: geometry {(s.h, s.w, s.c)} != {(g.h, g.w, g.c)}")
        self.h, self.w, self.c = g.h, g.w, g.c
        self._starts = np.cumsum([0] + [len(s) for s in self.shards])
        meta_path = os.path.join(root, "meta.json")
        self.meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {}

    def __len__(self) -> int:
        return int(self._starts[-1])

    def locate(self, i: int) -> tuple[RawShard, int]:
        s = int(np.searchsorted(self._starts, i, "right")) - 1
        return self.shards[s], i - int(self._starts[s])


class RawShardLoader:
    """Batches pre-decoded shards: memmap copy + random (crop,crop) window +
    hflip per image on the host. Yields (uint8 NHWC batch, int32 labels) —
    the same contract as NativeJPEGLoader (normalization stays on device).

    ``training=False`` uses the deterministic center window and no flip.
    """

    def __init__(self, dataset: RawShardDataset, batch_size: int, crop_size: int,
                 training: bool = True, drop_last: bool | None = None, seed: int = 0,
                 process_index: int | None = None, process_count: int | None = None):
        if crop_size > dataset.h or crop_size > dataset.w:
            raise ValueError(
                f"crop {crop_size} exceeds stored size {(dataset.h, dataset.w)}"
            )
        self.dataset = dataset
        self.batch_size = batch_size
        self.crop_size = crop_size
        self.training = training
        self.drop_last = training if drop_last is None else drop_last
        self.seed = seed
        self.epoch = 0
        if process_index is None:
            try:
                import jax

                process_index, process_count = jax.process_index(), jax.process_count()
            except Exception:
                process_index, process_count = 0, 1
        # disjoint contiguous 1/N of the global index per host
        n = len(dataset)
        per = n // (process_count or 1)
        self._lo, self._hi = process_index * per, (process_index + 1) * per
        if process_index == (process_count or 1) - 1:
            self._hi = n

    def __len__(self) -> int:
        n = self._hi - self._lo
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        rng = random.Random((self.seed, self.epoch).__hash__())
        self.epoch += 1
        order = np.arange(self._lo, self._hi)
        if self.training:
            np.random.default_rng(rng.getrandbits(64)).shuffle(order)
        S = self.crop_size
        H, W = self.dataset.h, self.dataset.w
        cy, cx = (H - S) // 2, (W - S) // 2
        for start in range(0, len(order), self.batch_size):
            idxs = order[start : start + self.batch_size]
            if self.drop_last and len(idxs) < self.batch_size:
                break
            out = np.empty((len(idxs), S, S, self.dataset.c), np.uint8)
            labels = np.empty((len(idxs),), np.int32)
            if self.training:
                ys = np.frombuffer(
                    np.random.default_rng(rng.getrandbits(64)).bytes(2 * len(idxs)),
                    np.uint8,
                ).astype(np.int64)
                # uniform window corners + flip bits from one cheap draw
                y0 = ys[: len(idxs)] % (H - S + 1)
                x0 = ys[len(idxs) :] % (W - S + 1)
                flips = np.frombuffer(
                    np.random.default_rng(rng.getrandbits(64)).bytes(len(idxs)), np.uint8
                ) & 1
            for j, i in enumerate(idxs):
                shard, k = self.dataset.locate(int(i))
                labels[j] = shard.labels[k]
                if self.training:
                    win = shard.images[k, y0[j] : y0[j] + S, x0[j] : x0[j] + S]
                    out[j] = win[:, ::-1] if flips[j] else win
                else:
                    out[j] = shard.images[k, cy : cy + S, cx : cx + S]
            yield out, labels
