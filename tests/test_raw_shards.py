"""Pre-decoded raw-crop shard format (data/raw_shards.py).

The escape hatch for decode-bound hosts: training-time "decode" must be a
memmap copy + window slice with exactly the NativeJPEGLoader batch contract
(uint8 NHWC + int32 labels), exactly-once epochs, and deterministic seeding.
"""

import json
import os

import numpy as np
import pytest

from vision_toolbox_tpu.data.raw_shards import (
    RawShard,
    RawShardDataset,
    RawShardLoader,
    write_shard,
)


def _make_shards(root, counts=(7, 5), store=12, seed=0):
    """Images whose every pixel encodes the global image index — any valid
    crop window is recognizable by its constant value."""
    rng = np.random.default_rng(seed)
    idx = 0
    for si, n in enumerate(counts):
        images = np.zeros((n, store, store, 3), np.uint8)
        labels = np.zeros((n,), np.int32)
        for k in range(n):
            images[k] = idx
            labels[k] = idx % 3
            idx += 1
        write_shard(os.path.join(root, f"shard-{si:05d}.vtraw"), images, labels)
    with open(os.path.join(root, "meta.json"), "w") as f:
        json.dump({"classes": ["a", "b", "c"], "store": store, "n": idx}, f)
    return idx


def test_write_read_roundtrip(tmp_path):
    images = np.random.default_rng(0).integers(0, 256, (9, 8, 8, 3), np.uint8)
    labels = np.arange(9, dtype=np.int32)
    p = str(tmp_path / "s.vtraw")
    write_shard(p, images, labels)
    s = RawShard(p)
    assert (s.n, s.h, s.w, s.c) == (9, 8, 8, 3)
    np.testing.assert_array_equal(np.asarray(s.labels), labels)
    np.testing.assert_array_equal(np.asarray(s.images), images)


def test_dataset_flat_index(tmp_path):
    n = _make_shards(tmp_path, counts=(7, 5))
    ds = RawShardDataset(str(tmp_path))
    assert len(ds) == n
    for i in range(n):
        shard, k = ds.locate(i)
        assert int(shard.images[k, 0, 0, 0]) == i
    assert ds.meta["classes"] == ["a", "b", "c"]


def test_eval_loader_exactly_once(tmp_path):
    n = _make_shards(tmp_path)
    ds = RawShardDataset(str(tmp_path))
    loader = RawShardLoader(ds, batch_size=4, crop_size=8, training=False)
    seen = []
    for images, labels in loader:
        assert images.dtype == np.uint8 and labels.dtype == np.int32
        assert images.shape[1:] == (8, 8, 3)
        seen.extend(images[:, 0, 0, 0].tolist())
        np.testing.assert_array_equal(labels, np.asarray(seen[-len(labels):]) % 3)
    assert sorted(seen) == list(range(n))  # ragged tail kept for eval


def test_train_loader_crops_flips_and_drops(tmp_path):
    n = _make_shards(tmp_path, counts=(11,), store=12)
    ds = RawShardDataset(str(tmp_path))
    loader = RawShardLoader(ds, batch_size=4, crop_size=8, training=True, seed=3)
    seen = []
    for images, labels in loader:
        assert images.shape == (4, 8, 8, 3)
        # every crop window of image i is constant i — identity survives
        # any window + flip
        vals = images[:, 0, 0, 0]
        np.testing.assert_array_equal(images, np.broadcast_to(
            vals[:, None, None, None], images.shape))
        np.testing.assert_array_equal(labels, vals % 3)
        seen.extend(vals.tolist())
    assert len(seen) == (n // 4) * 4  # drop_last under training
    assert len(set(seen)) == len(seen)  # no repeats within the epoch


def test_train_loader_windows_vary(tmp_path):
    """Crops must actually move: store a coordinate ramp and check that the
    sampled windows differ across images/epochs (the whole point of
    store > crop)."""
    store, crop = 16, 8
    images = np.zeros((6, store, store, 3), np.uint8)
    ramp = np.arange(store, dtype=np.uint8)
    images[:, :, :, 0] = ramp[None, :, None]  # y coordinate in channel 0
    images[:, :, :, 1] = ramp[None, None, :]  # x coordinate in channel 1
    write_shard(str(tmp_path / "shard-00000.vtraw"), images, np.zeros((6,), np.int32))
    ds = RawShardDataset(str(tmp_path))
    loader = RawShardLoader(ds, batch_size=6, crop_size=crop, training=True, seed=0)
    corners = set()
    for _ in range(4):
        for imgs, _ in loader:
            for j in range(imgs.shape[0]):
                y0 = int(imgs[j, 0, 0, 0])
                xs = imgs[j, 0, :, 1]
                flipped = xs[0] > xs[-1]
                x0 = int(xs[-1] if flipped else xs[0])
                assert 0 <= y0 <= store - crop and 0 <= x0 <= store - crop
                # window rows/cols are contiguous ramps (a real slice)
                np.testing.assert_array_equal(
                    imgs[j, :, 0, 0], np.arange(y0, y0 + crop, dtype=np.uint8))
                corners.add((y0, x0, flipped))
    assert len(corners) > 4  # windows and flips vary


def test_same_seed_same_epoch_is_deterministic(tmp_path):
    _make_shards(tmp_path)
    ds = RawShardDataset(str(tmp_path))
    a = list(RawShardLoader(ds, 4, 8, training=True, seed=7))
    b = list(RawShardLoader(ds, 4, 8, training=True, seed=7))
    for (ia, la), (ib, lb) in zip(a, b):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(la, lb)


def test_multihost_split_disjoint_and_complete(tmp_path):
    n = _make_shards(tmp_path, counts=(9, 8))
    ds = RawShardDataset(str(tmp_path))
    seen = []
    for pi in range(2):
        loader = RawShardLoader(ds, 4, 8, training=False,
                                process_index=pi, process_count=2)
        for images, _ in loader:
            seen.extend(images[:, 0, 0, 0].tolist())
    assert sorted(seen) == list(range(n))


def test_crop_larger_than_store_raises(tmp_path):
    _make_shards(tmp_path, store=12)
    ds = RawShardDataset(str(tmp_path))
    with pytest.raises(ValueError, match="exceeds stored size"):
        RawShardLoader(ds, 4, 16)


def test_trainer_fit_on_raw_shards(tmp_path):
    """End-to-end: config-selected raw-shard loaders drive the production fit
    loop (train + val epochs) — the same wiring a decode-bound host would
    use (trainer._build_data raw branch)."""
    from vision_toolbox_tpu.train.config import Config
    from vision_toolbox_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    for split, n in (("train", 24), ("val", 8)):
        d = tmp_path / split
        d.mkdir()
        images = rng.integers(0, 256, (n, 40, 40, 3), np.uint8)
        labels = (np.arange(n) % 4).astype(np.int32)
        write_shard(str(d / "shard-00000.vtraw"), images, labels)

    cfg = Config()
    cfg.model.backbone = "darknet19"
    cfg.model.num_classes = 10
    cfg.model.bf16 = False
    cfg.data.raw_shards = True
    cfg.data.train_dir = str(tmp_path / "train")
    cfg.data.val_dir = str(tmp_path / "val")
    cfg.data.batch_size = 8
    cfg.data.train_crop_size = 32
    cfg.data.val_crop_size = 32
    cfg.data.trivial_augment = False
    cfg.data.random_erasing_p = 0.0
    cfg.train.mixup_alpha = 0.0
    cfg.train.cutmix_alpha = 0.0
    cfg.train.epochs = 1
    cfg.train.warmup_epochs = 1
    cfg.runtime.out_dir = str(tmp_path / "out")
    trainer = Trainer(cfg)
    assert len(trainer.train_loader) == 3
    state = trainer.fit()
    assert state is not None
    metrics = [json.loads(l) for l in open(tmp_path / "out" / "metrics.jsonl")]
    assert any("val/acc" in m or "val/loss" in m for m in metrics)


def test_preload_materializes_to_ram(tmp_path):
    """Regression: np.asarray(memmap) is a VIEW — preload must force a real
    copy or "preloaded" training runs at disk random-read speed (measured
    ~160 ms vs ~8 ms per 256-image batch)."""
    _make_shards(str(tmp_path))
    ds = RawShardDataset(str(tmp_path), preload=True)
    for s in ds.shards:
        assert not isinstance(s.images, np.memmap)
        assert s.images.base is None or not isinstance(s.images.base, np.memmap)
        assert not isinstance(s.labels, np.memmap)


def test_native_crop_flip_matches_numpy_fallback(tmp_path):
    """The C++ vtt_crop_flip_batch fast path must be byte-identical to the
    numpy slice/flip fallback for train (random windows + flips) and eval
    (center window) batches."""
    import vision_toolbox_tpu.data.raw_shards as rs
    from vision_toolbox_tpu.data.native import native_available

    if not native_available():
        pytest.skip("native lib not built")
    _make_shards(str(tmp_path), counts=(9, 6), store=16, seed=3)
    # make the pixel content vary inside each image so flips are visible
    rng = np.random.default_rng(0)
    for si, n in enumerate((9, 6)):
        images = rng.integers(0, 256, (n, 16, 16, 3), np.uint8)
        labels = (np.arange(n) % 3).astype(np.int32)
        write_shard(os.path.join(str(tmp_path), f"shard-{si:05d}.vtraw"), images, labels)
    ds = RawShardDataset(str(tmp_path), preload=True)

    def epoch(force_numpy, training):
        orig = rs._crop_flip_native
        if force_numpy:
            rs._crop_flip_native = lambda: False
        try:
            loader = RawShardLoader(ds, 4, 8, training=training, seed=11)
            return list(loader)
        finally:
            rs._crop_flip_native = orig

    for training in (True, False):
        a = epoch(False, training)
        b = epoch(True, training)
        assert len(a) == len(b) > 0
        for (xa, la), (xb, lb) in zip(a, b):
            np.testing.assert_array_equal(xa, xb)
            np.testing.assert_array_equal(la, lb)
