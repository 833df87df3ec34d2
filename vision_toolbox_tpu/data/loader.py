"""Threaded batching loader with device prefetch.

Replaces the reference's torch DataLoader(num_workers=8, pin_memory) +
per-rank batch split (data.py:63-86). Decode + per-sample host transforms run
in a thread pool (PIL releases the GIL during JPEG decode/resize); batches
are staged onto device asynchronously (double-buffered prefetch) so the TPU
never waits on the host — the §3.1 "input-bound hot loop" countermeasure.
"""

from __future__ import annotations

import queue
import random
import threading
from typing import Callable, Iterator

import numpy as np

from .datasets import ImageFolder


class DataLoader:
    """Batches an indexable dataset with a per-epoch shuffle.

    ``transform(rng, sample.image) -> HWC float array``.
    """

    def __init__(
        self,
        dataset: ImageFolder,
        batch_size: int,
        transform: Callable,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 8,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.transform = transform
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        order = list(range(len(self.dataset)))
        rng = random.Random((self.seed, self.epoch).__hash__())
        if self.shuffle:
            rng.shuffle(order)
        self.epoch += 1

        def load_one(args):
            idx, sample_seed = args
            sample = self.dataset[idx]
            r = random.Random(sample_seed)
            return self.transform(r, sample.image), sample.label

        import concurrent.futures as cf

        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            for start in range(0, len(order), self.batch_size):
                idxs = order[start : start + self.batch_size]
                if self.drop_last and len(idxs) < self.batch_size:
                    break
                seeds = [rng.getrandbits(32) for _ in idxs]
                results = list(pool.map(load_one, zip(idxs, seeds)))
                images = np.stack([r[0] for r in results])
                labels = np.asarray([r[1] for r in results], np.int32)
                yield images, labels


def prefetch_to_device(
    it: Iterator, mesh=None, size: int = 2
) -> Iterator:
    """Stage host batches onto device (sharded over the mesh data axis when
    given) while the current step runs — pin_memory + async H2D equivalent."""
    import jax

    if mesh is not None:
        from ..parallel.mesh import shard_batch

        put = lambda batch: shard_batch(batch, mesh)
    else:
        put = jax.device_put

    q: queue.Queue = queue.Queue(maxsize=size)
    _SENTINEL = object()

    def producer():
        try:
            for batch in it:
                q.put(put(batch))
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        yield item
