"""Native C++ JPEG decode path: parity vs PIL and loader round-trip.
Skipped when the shared library can't be built (no g++/libjpeg)."""

import random

import numpy as np
import pytest
from PIL import Image

from vision_toolbox_tpu.data.native import (
    NativeJPEGLoader,
    decode_batch,
    jpeg_size,
    native_available,
    sample_rrc_box,
)

pytestmark = pytest.mark.skipif(not native_available(), reason="native lib unavailable")


@pytest.fixture()
def jpeg_file(tmp_path):
    rng = np.random.default_rng(0)
    # smooth image so JPEG loss is small and resize parity is meaningful
    x = np.linspace(0, 255, 64, dtype=np.float32)
    img = (np.add.outer(x, x) / 2).astype(np.uint8)
    arr = np.stack([img, img.T, 255 - img], -1)
    path = tmp_path / "img.jpg"
    Image.fromarray(arr).save(path, quality=95)
    return str(path), arr


def test_jpeg_size(jpeg_file):
    path, arr = jpeg_file
    with open(path, "rb") as f:
        data = f.read()
    assert jpeg_size(data) == (64, 64)


def test_decode_matches_pil(jpeg_file):
    path, _ = jpeg_file
    with open(path, "rb") as f:
        data = f.read()
    out = decode_batch(
        [data], np.asarray([[8, 4, 48, 40]]), np.asarray([[64, 64]]),
        np.zeros(1, np.uint8), 32,
    )[0]
    ref = np.asarray(
        Image.open(path).convert("RGB").resize((32, 32), Image.BILINEAR, box=(8, 4, 56, 44)),
        dtype=np.float32,
    )
    diff = np.abs(out.astype(np.float32) - ref)
    assert np.mean(diff) < 3.0  # PIL/box-resize implementation differences
    assert np.percentile(diff, 95) < 10.0


def test_decode_flip(jpeg_file):
    path, _ = jpeg_file
    with open(path, "rb") as f:
        data = f.read()
    args = ([data], np.asarray([[0, 0, 64, 64]]), np.asarray([[64, 64]]))
    plain = decode_batch(*args, np.zeros(1, np.uint8), 32)[0]
    flipped = decode_batch(*args, np.ones(1, np.uint8), 32)[0]
    np.testing.assert_array_equal(flipped, plain[:, ::-1])


def test_bad_jpeg_raises():
    with pytest.raises(ValueError):
        decode_batch(
            [b"not a jpeg"], np.asarray([[0, 0, 8, 8]]), np.asarray([[8, 8]]),
            np.zeros(1, np.uint8), 8,
        )


def test_native_loader(tmp_path):
    rng = np.random.default_rng(1)
    for cls in ["a", "b"]:
        d = tmp_path / cls
        d.mkdir()
        for i in range(5):
            arr = rng.integers(0, 256, (50, 60, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.jpg")
    from vision_toolbox_tpu.data import ImageFolder

    ds = ImageFolder(str(tmp_path))
    loader = NativeJPEGLoader(ds, batch_size=4, crop_size=32, num_threads=2)
    batches = list(loader)
    assert len(batches) == 2
    images, labels = batches[0]
    assert images.shape == (4, 32, 32, 3) and images.dtype == np.uint8
    assert labels.shape == (4,)
    assert images.std() > 0


def test_rrc_box_distribution():
    rng = random.Random(0)
    for _ in range(100):
        x, y, w, h = sample_rrc_box(rng, 100, 80)
        assert 0 <= x <= 100 - w and 0 <= y <= 80 - h
        assert w > 0 and h > 0
