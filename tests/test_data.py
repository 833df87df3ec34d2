"""Data pipeline tests: ImageFolder layout, WebDataset tar round-trip,
per-host sharding, loader batching, transform geometry."""

import io
import os
import random
import tarfile

import numpy as np
import pytest
from PIL import Image

from vision_toolbox_tpu.data import (
    DataLoader,
    ImageFolder,
    iter_webdataset,
    shard_for_host,
    train_transform,
    val_transform,
)


@pytest.fixture()
def image_folder(tmp_path):
    rng = np.random.default_rng(0)
    for cls in ["cat", "dog"]:
        d = tmp_path / cls
        d.mkdir()
        for i in range(6):
            arr = rng.integers(0, 256, (40, 48, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.jpg")
    return str(tmp_path)


def test_image_folder(image_folder):
    ds = ImageFolder(image_folder)
    assert ds.classes == ["cat", "dog"]
    assert len(ds) == 12
    s = ds[0]
    assert s.label == 0
    assert s.image.size == (48, 40)


def test_transforms_shapes(image_folder):
    ds = ImageFolder(image_folder)
    rng = random.Random(0)
    out = train_transform(rng, ds[0].image, crop_size=32)
    assert out.shape == (32, 32, 3)
    assert 0.0 <= out.min() and out.max() <= 1.0
    out = val_transform(ds[0].image, resize_size=36, crop_size=32)
    assert out.shape == (32, 32, 3)


def test_loader_batches(image_folder):
    ds = ImageFolder(image_folder)
    loader = DataLoader(
        ds, batch_size=4, transform=lambda r, im: train_transform(r, im, 32),
        shuffle=True, drop_last=True, num_workers=2,
    )
    batches = list(loader)
    assert len(batches) == 3
    images, labels = batches[0]
    assert images.shape == (4, 32, 32, 3)
    assert labels.shape == (4,)
    # epoch reshuffles
    b2 = list(loader)
    assert not np.array_equal(
        np.concatenate([b[1] for b in batches]), np.concatenate([b[1] for b in b2])
    )


@pytest.fixture()
def wds_shards(tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    idx = 0
    for shard_i in range(3):
        path = tmp_path / f"shard-{shard_i:04d}.tar"
        with tarfile.open(path, "w") as tf:
            for _ in range(5):
                arr = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, format="JPEG")
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{idx:06d}.jpg")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                cls = str(idx % 7).encode()
                info = tarfile.TarInfo(f"{idx:06d}.cls")
                info.size = len(cls)
                tf.addfile(info, io.BytesIO(cls))
                idx += 1
        paths.append(str(path))
    return paths


def test_webdataset_roundtrip(wds_shards):
    samples = list(iter_webdataset(wds_shards))
    assert len(samples) == 15
    assert samples[0].image.size == (24, 24)
    assert [s.label for s in samples[:7]] == list(range(7))


def test_webdataset_shuffle(wds_shards):
    a = [s.label for s in iter_webdataset(wds_shards, shuffle_shards=True, shuffle_buffer=8, seed=1)]
    b = [s.label for s in iter_webdataset(wds_shards)]
    assert sorted(a) == sorted(b)
    assert a != b


def test_shard_for_host(wds_shards):
    parts = [shard_for_host(wds_shards, i, 2) for i in range(2)]
    assert sorted(parts[0] + parts[1]) == sorted(wds_shards)
    assert not set(parts[0]) & set(parts[1])
