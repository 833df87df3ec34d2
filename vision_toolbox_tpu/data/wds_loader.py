"""Batching loader over WebDataset tar shards (streaming, per-host sharded).

Mirrors the reference wds pipeline (data.py:32-38, 68-77): shard shuffle +
1000-sample buffer + per-sample transform + fixed-size batches. Epoch length
is ``train_size // global_batch`` like wds ``ddp_equalize`` — each host
streams its own disjoint shards and contributes batch_size/host_count
samples per step.
"""

from __future__ import annotations

import random
from typing import Callable, Iterator

import numpy as np

from .datasets import iter_webdataset, shard_for_host


class WebDatasetLoader:
    def __init__(
        self,
        shards: list[str],
        batch_size: int,
        transform: Callable,  # (rng, PIL.Image) -> HWC array
        training: bool = True,
        num_batches: int | None = None,
        seed: int = 0,
        per_host: bool = True,
    ):
        self.shards = shard_for_host(shards) if per_host else list(shards)
        self.batch_size = batch_size
        self.transform = transform
        self.training = training
        self.num_batches = num_batches
        self.seed = seed
        self.epoch = 0

    def __len__(self) -> int:
        if self.num_batches is None:
            raise TypeError("streaming loader has no length without num_batches")
        return self.num_batches

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        epoch_seed = (self.seed, self.epoch).__hash__() & 0x7FFFFFFF
        self.epoch += 1
        rng = random.Random(epoch_seed)

        def batches(cycle: int = 0):
            sample_iter = iter_webdataset(
                self.shards,
                shuffle_shards=self.training,
                shuffle_buffer=1000 if self.training else 0,
                seed=epoch_seed + cycle,
            )
            images, labels = [], []
            for sample in sample_iter:
                images.append(self.transform(rng, sample.image))
                labels.append(sample.label)
                if len(images) == self.batch_size:
                    yield np.stack(images), np.asarray(labels, np.int32)
                    images, labels = [], []
            if images and not self.training:
                yield np.stack(images), np.asarray(labels, np.int32)

        it = batches()
        if self.num_batches is None:
            yield from it
            return
        # fixed epoch length (ddp_equalize data.py:76-77): cycle if short
        produced = 0
        cycle = 0
        while produced < self.num_batches:
            got = False
            for batch in it:
                got = True
                yield batch
                produced += 1
                if produced >= self.num_batches:
                    return
            if not got:
                return
            cycle += 1
            it = batches(cycle)  # re-stream fresh shards
