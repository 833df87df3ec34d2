#!/usr/bin/env python
"""Hard procedural ImageFolder corpus — built for HEADROOM (round-3 verdict
item #4).

The v1 corpus (make_synth_dataset.py) saturates: both committed runs hit
99.9-100% val top-1, so it can prove the plumbing learns but not that the
*recipe* (TrivialAugment, RandomErasing, CutMix⊕MixUp, label smoothing)
moves accuracy. This generator targets a 70-90% plateau so full-recipe vs
small-recipe A/B runs have signal:

* Class identity is carried by warp-INVARIANT attributes — pattern family
  (rings / spots / checker / rays-pair / waves), frequency band, duo-chrome
  palette, and waveform duty — never by absolute orientation or position,
  so TrivialAugment's rotations/shears/translations are label-preserving
  and augmentation can genuinely regularize.
* Headroom comes from overlap + nuisance: attribute values jitter enough to
  overlap neighboring classes, every image gets a random rotation/scale/
  translation, low-contrast clutter blobs drawn with OTHER classes'
  palettes, an occluder, brightness/contrast/gamma jitter, and heavy noise.
* The train split is small (default 120/class at 100 classes) so the
  generalization gap — the thing augmentation fights — actually exists.

    python scripts/make_synth_dataset_v2.py --root /tmp/vtt_synth_hard \
        --classes 100 --per-class 120 --val-per-class 30
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
from PIL import Image

FAMILIES = ("rings", "spots", "checker", "rays", "waves")


def make_class_specs(n_classes: int, seed: int = 7) -> list[dict]:
    """Sample n distinct attribute combos; neighbors share most attributes."""
    rng = np.random.default_rng(seed)
    specs, seen = [], set()
    while len(specs) < n_classes:
        spec = {
            "family": FAMILIES[rng.integers(len(FAMILIES))],
            "freq": float(rng.choice([3.0, 4.5, 6.5, 9.5, 14.0])),
            "hue": float(rng.choice(np.linspace(0, 2 * np.pi, 8, endpoint=False))),
            "hue2": float(rng.choice(np.linspace(0, 2 * np.pi, 8, endpoint=False))),
            "duty": float(rng.choice([0.35, 0.65])),  # waveform asymmetry
        }
        key = (spec["family"], spec["freq"], spec["hue"], spec["hue2"], spec["duty"])
        if key not in seen:
            seen.add(key)
            specs.append(spec)
    return specs


def _palette(hue: float) -> np.ndarray:
    return 0.55 + 0.45 * np.cos(hue + np.array([0.0, 2.094, 4.189]))


def _field(family: str, fx: np.ndarray, fy: np.ndarray, freq: float, rng) -> np.ndarray:
    """Scalar pattern field in [-1, 1]; orientation is randomized per image so
    it can never carry class information."""
    r = np.hypot(fx, fy)
    theta = np.arctan2(fy, fx)
    phase = rng.uniform(0, 2 * np.pi)
    if family == "rings":
        return np.sin(2 * np.pi * freq * r + phase)
    if family == "spots":
        return np.sin(2 * np.pi * freq * fx + phase) * np.sin(2 * np.pi * freq * fy + phase)
    if family == "checker":
        return np.sign(np.sin(2 * np.pi * freq * fx + phase)) * np.sign(
            np.sin(2 * np.pi * freq * fy + phase)
        ) * (0.7 + 0.3 * np.sin(8 * r))
    if family == "rays":
        n_rays = max(3, int(round(freq)))
        return np.sin(n_rays * theta + phase) * np.cos(2 * np.pi * 0.35 * freq * r)
    # waves: two superposed gratings at a fixed RELATIVE angle (invariant)
    a = rng.uniform(0, 2 * np.pi)
    g1 = np.sin(2 * np.pi * freq * (np.cos(a) * fx + np.sin(a) * fy) + phase)
    g2 = np.sin(2 * np.pi * freq * (np.cos(a + 1.1) * fx + np.sin(a + 1.1) * fy))
    return 0.5 * (g1 + g2)


def class_image(
    rng: np.random.Generator, spec: dict, all_specs: list[dict], size=(256, 256)
) -> np.ndarray:
    H, W = size
    # nuisance affine: rotation (free), scale, translation
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    ys, xs = ys / H - 0.5, xs / W - 0.5
    rot = rng.uniform(0, 2 * np.pi)
    scale = rng.uniform(0.55, 1.5)
    tx, ty = rng.uniform(-0.25, 0.25, 2)
    fx = (np.cos(rot) * xs - np.sin(rot) * ys) * scale + tx
    fy = (np.sin(rot) * xs + np.cos(rot) * ys) * scale + ty

    freq = spec["freq"] * rng.uniform(0.78, 1.28)  # overlaps adjacent bands
    field = _field(spec["family"], fx, fy, freq, rng)
    # duty thresholding: asymmetric waveform (a subtle, contrast-robust cue)
    field = np.tanh(3.0 * (field - (spec["duty"] - 0.5)))

    hue_j = rng.normal(0, 0.55)  # overlaps adjacent palette bins (2pi/8=0.785)
    c1 = _palette(spec["hue"] + hue_j)
    c2 = _palette(spec["hue2"] + hue_j)
    w = (field[..., None] + 1.0) / 2.0
    rgb = w * c1 + (1.0 - w) * c2

    # clutter: low-contrast blobs borrowing OTHER classes' palettes
    for _ in range(rng.integers(2, 5)):
        other = all_specs[rng.integers(len(all_specs))]
        cx, cy = rng.uniform(-0.45, 0.45, 2)
        rad = rng.uniform(0.06, 0.16)
        mask = ((xs - cx) ** 2 + (ys - cy) ** 2) < rad**2
        alpha = rng.uniform(0.25, 0.5)
        rgb[mask] = (1 - alpha) * rgb[mask] + alpha * _palette(other["hue"])

    # occluder rectangle (p = 0.5)
    if rng.random() < 0.5:
        x0, y0 = rng.integers(0, W - 40), rng.integers(0, H - 40)
        bw, bh = rng.integers(30, 90), rng.integers(30, 90)
        rgb[y0 : y0 + bh, x0 : x0 + bw] = rng.uniform(0.1, 0.9, 3)

    # photometric nuisance
    rgb = rgb * rng.uniform(0.6, 1.25) + rng.uniform(-0.12, 0.12)
    rgb = np.clip(rgb, 1e-3, 1.5) ** rng.uniform(0.75, 1.35)
    rgb = rgb + rng.normal(0, 0.09, rgb.shape)
    return (np.clip(rgb, 0, 1) * 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/vtt_synth_hard")
    ap.add_argument("--classes", type=int, default=100)
    ap.add_argument("--per-class", type=int, default=120)
    ap.add_argument("--val-per-class", type=int, default=30)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()

    root = Path(args.root)
    if (root / "done").exists():
        print("already built:", root)
        return
    specs = make_class_specs(args.classes)
    rng = np.random.default_rng(0)
    for split, n in (("train", args.per_class), ("val", args.val_per_class)):
        for cls, spec in enumerate(specs):
            d = root / split / f"class_{cls:03d}"
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n):
                img = class_image(rng, spec, specs, (args.size, args.size))
                Image.fromarray(img).save(d / f"{i:04d}.jpg", quality=88)
        print(f"{split}: {args.classes * n} images", flush=True)
    (root / "done").touch()


if __name__ == "__main__":
    main()
