#!/usr/bin/env python
"""Procedural ImageFolder dataset for end-to-end recipe validation.

No real dataset exists on this worker and egress is blocked (see STATUS.md),
so this generates a learnable 40-class corpus: each class is a distinct
(orientation, frequency, hue) sinusoidal grating; each image randomizes
phase, scale, translation, brightness, and adds noise — enough variation
that a constant classifier fails and the full augmentation recipe has to
not destroy the signal.

    python scripts/make_synth_dataset.py --root /tmp/vtt_synth \
        --classes 40 --per-class 250 --val-per-class 25
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
from PIL import Image


def class_image(rng: np.random.Generator, cls: int, n_classes: int, size=(320, 256)):
    H, W = size[1], size[0]
    angle = np.pi * cls / n_classes + rng.normal(0, 0.04)
    freq = (6 + 10 * ((cls * 7) % n_classes) / n_classes) * rng.uniform(0.85, 1.15)
    hue = 2 * np.pi * ((cls * 13) % n_classes) / n_classes
    phase = rng.uniform(0, 2 * np.pi)

    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    ys = ys / H - rng.uniform(0.3, 0.7)
    xs = xs / W - rng.uniform(0.3, 0.7)
    wave = np.sin(freq * (np.cos(angle) * xs + np.sin(angle) * ys) * 2 * np.pi + phase)
    base = 0.5 + 0.35 * wave * rng.uniform(0.7, 1.0)

    rgb = np.stack(
        [
            base * (0.6 + 0.4 * np.cos(hue)),
            base * (0.6 + 0.4 * np.cos(hue + 2.094)),
            base * (0.6 + 0.4 * np.cos(hue + 4.189)),
        ],
        axis=-1,
    )
    rgb = rgb * rng.uniform(0.8, 1.2) + rng.normal(0, 0.04, rgb.shape)
    return (np.clip(rgb, 0, 1) * 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/vtt_synth")
    ap.add_argument("--classes", type=int, default=40)
    ap.add_argument("--per-class", type=int, default=250)
    ap.add_argument("--val-per-class", type=int, default=25)
    args = ap.parse_args()

    root = Path(args.root)
    if (root / "done").exists():
        print("already built:", root)
        return
    rng = np.random.default_rng(0)
    for split, n in (("train", args.per_class), ("val", args.val_per_class)):
        for cls in range(args.classes):
            d = root / split / f"class_{cls:03d}"
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n):
                Image.fromarray(class_image(rng, cls, args.classes)).save(
                    d / f"{i:04d}.jpg", quality=90
                )
        print(f"{split}: {args.classes * n} images")
    (root / "done").touch()


if __name__ == "__main__":
    main()
