"""Input-pipeline duty-cycle measurement (SURVEY §7 hard part #4).

Host VM has ONE core, so this measures per-core decode rates and computes
the thread count needed to feed the chip, plus the actual overlapped duty
cycle achievable on this host. Writes a summary to stdout for DESIGN.md.

Synthetic JPEG corpus: ImageNet-like 500×375 quality-87 JPEGs.
"""

from __future__ import annotations

import io
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

DATA = Path("/tmp/vtt_input_bench")
N_IMAGES = 512
CLASSES = 8


def build_corpus():
    from PIL import Image

    if (DATA / "done").exists():
        return
    rng = np.random.default_rng(0)
    for i in range(N_IMAGES):
        cls = DATA / "train" / f"class_{i % CLASSES}"
        cls.mkdir(parents=True, exist_ok=True)
        # low-frequency content so files compress like natural photos
        small = rng.integers(0, 256, (12, 16, 3), np.uint8)
        img = Image.fromarray(small).resize((500, 375), Image.BILINEAR)
        img.save(cls / f"{i}.jpg", quality=87)
    (DATA / "done").touch()


def main():
    build_corpus()
    from vision_toolbox_tpu.data import DataLoader, ImageFolder, train_transform
    from vision_toolbox_tpu.data.native import NativeJPEGLoader

    ds = ImageFolder(str(DATA / "train"))
    batch = 64
    sizes = [os.path.getsize(p) for p, _ in ds.samples]
    print(f"corpus: {len(ds.samples)} jpegs, mean {np.mean(sizes)/1024:.0f} KiB")

    # native C++ path (libjpeg DCT-scaled decode + crop + resize), 1 thread
    t0 = time.perf_counter()
    n = 0
    loader = NativeJPEGLoader(ds, batch, 176, num_threads=1, seed=0)
    for images, labels in loader:
        n += images.shape[0]
    native_rate = n / (time.perf_counter() - t0)
    print(f"native decode+RRC(176): {native_rate:.0f} img/s/core")

    # PIL python path, in-process (num_workers=0 → same thread)
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    n = 0
    loader = DataLoader(
        ds, batch, transform=lambda r, im: train_transform(r, im, 176),
        shuffle=True, drop_last=True, num_workers=1, seed=0,
    )
    for images, labels in loader:
        n += images.shape[0]
    pil_rate = n / (time.perf_counter() - t0)
    print(f"PIL decode+RRC(176):    {pil_rate:.0f} img/s/core")

    # chip demand (measured full-recipe step, bench.py): 3735 img/s
    for demand, tag in ((3735.0, "full recipe"), (4367.0, "no-aug step")):
        print(
            f"threads to feed {tag} ({demand:.0f} img/s): "
            f"native {demand / native_rate:.1f}, PIL {demand / pil_rate:.1f}"
        )
    one_core_duty = native_rate / (native_rate + 3735.0)
    print(
        f"single-core overlapped duty cycle (native, full recipe): "
        f"{100 * native_rate / 3735.0:.1f}% of demand met -> duty {100*one_core_duty:.1f}%"
    )


if __name__ == "__main__":
    main()
