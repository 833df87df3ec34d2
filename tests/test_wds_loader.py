"""WebDataset streaming loader: batching, fixed epoch length, transforms."""

import io
import tarfile

import numpy as np
import pytest
from PIL import Image

from vision_toolbox_tpu.data.wds_loader import WebDatasetLoader


@pytest.fixture()
def shards(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    idx = 0
    for s in range(2):
        p = tmp_path / f"{s:04d}.tar"
        with tarfile.open(p, "w") as tf:
            for _ in range(10):
                arr = rng.integers(0, 256, (28, 28, 3)).astype(np.uint8)
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, format="JPEG")
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{idx:06d}.jpg")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                cls = str(idx % 3).encode()
                info = tarfile.TarInfo(f"{idx:06d}.cls")
                info.size = len(cls)
                tf.addfile(info, io.BytesIO(cls))
                idx += 1
        paths.append(str(p))
    return paths


def _transform(rng, img):
    return np.asarray(img.resize((16, 16)), np.float32) / 255.0


def test_batches_and_shapes(shards):
    loader = WebDatasetLoader(shards, 8, _transform, training=True, per_host=False)
    batches = list(loader)
    assert len(batches) == 2  # 20 samples, drop partial in training
    images, labels = batches[0]
    assert images.shape == (8, 16, 16, 3)
    assert labels.dtype == np.int32


def test_fixed_epoch_length_cycles(shards):
    loader = WebDatasetLoader(shards, 8, _transform, training=True, num_batches=5, per_host=False)
    assert len(loader) == 5
    assert len(list(loader)) == 5  # 20 samples re-streamed to fill 5 batches


def test_val_keeps_partial(shards):
    loader = WebDatasetLoader(shards, 8, _transform, training=False, per_host=False)
    batches = list(loader)
    assert [b[0].shape[0] for b in batches] == [8, 8, 4]


def _label_multiset(batches):
    return sorted(int(l) for _, labels in batches for l in labels)


def test_parallel_streams_same_samples(shards):
    """num_streams=2: same sample multiset, same epoch-length contract as the
    single-stream loader — only the arrival order may differ."""
    single = list(WebDatasetLoader(shards, 4, _transform, training=True, per_host=False))
    multi = list(
        WebDatasetLoader(shards, 4, _transform, training=True, per_host=False, num_streams=2)
    )
    assert len(multi) == len(single) == 5
    assert _label_multiset(multi) == _label_multiset(single)

    # val: exactly-once incl. the ragged final batch
    multi_val = list(
        WebDatasetLoader(shards, 8, _transform, training=False, per_host=False, num_streams=2)
    )
    assert sorted(b[0].shape[0] for b in multi_val) == [4, 8, 8]
    assert _label_multiset(multi_val) == sorted([i % 3 for i in range(20)])


def test_parallel_streams_fixed_epoch_cycles(shards):
    loader = WebDatasetLoader(
        shards, 8, _transform, training=True, num_batches=5, per_host=False, num_streams=2
    )
    assert len(list(loader)) == 5  # 20 samples re-streamed to fill 5 batches

    # second epoch re-deals shards and still meets the contract
    assert len(list(loader)) == 5


def test_parallel_streams_cap(shards):
    """num_streams is capped at the shard count (no idle readers)."""
    loader = WebDatasetLoader(shards, 4, _transform, training=True, per_host=False, num_streams=8)
    assert loader.num_streams == 2
    assert len(list(loader)) == 5


def test_parallel_streams_fail_fast_on_reader_error(shards, tmp_path):
    """A corrupt shard must surface IMMEDIATELY (the epoch must not run on
    silently skewed data until the surviving streams finish) and the reader
    threads must be cancelled + drained."""
    import threading
    import time

    bad = tmp_path / "bad.tar"
    bad.write_bytes(b"this is not a tar archive at all" * 8)
    loader = WebDatasetLoader(
        shards + [str(bad)], 4, _transform, training=True,
        per_host=False, num_streams=3, seed=0,
    )
    n_before = threading.active_count()
    t0 = time.perf_counter()
    with pytest.raises(RuntimeError, match="wds reader stream failed"):
        for _ in loader:
            pass
    assert time.perf_counter() - t0 < 10  # fail fast, not at epoch end
    deadline = time.time() + 5
    while threading.active_count() > n_before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n_before  # readers cancelled, no leak


def test_native_crop_mode_batches(shards):
    """native_crop_size streams undecoded bytes out of the tars and decodes
    the batch in the C++ pool — same batch contract (uint8 NHWC + int32)."""
    from vision_toolbox_tpu.data.native import native_available

    if not native_available():
        pytest.skip("native lib not built")
    loader = WebDatasetLoader(shards, 8, None, training=True, per_host=False,
                              native_crop_size=16)
    batches = list(loader)
    assert len(batches) == 2
    for images, labels in batches:
        assert images.shape == (8, 16, 16, 3) and images.dtype == np.uint8
        assert labels.shape == (8,) and labels.dtype == np.int32
        assert set(labels.tolist()) <= {0, 1, 2}
    # epoch contract: all samples seen once across the two full batches + drop
    # (20 samples, batch 8 -> 2 batches, 4 dropped)


def test_native_crop_mode_parallel_streams(shards):
    from vision_toolbox_tpu.data.native import native_available

    if not native_available():
        pytest.skip("native lib not built")
    loader = WebDatasetLoader(shards, 8, None, training=True, per_host=False,
                              native_crop_size=16, num_streams=2)
    batches = list(loader)
    assert len(batches) == 2
    for images, labels in batches:
        assert images.shape == (8, 16, 16, 3) and images.dtype == np.uint8


def test_native_crop_mode_rejects_val(shards):
    from vision_toolbox_tpu.data.native import native_available

    if not native_available():
        pytest.skip("native lib not built")
    with pytest.raises(ValueError):
        WebDatasetLoader(shards, 8, None, training=False, per_host=False,
                         native_crop_size=16)
