#!/usr/bin/env python
"""Generate golden-logit arrays from REAL published checkpoints.

Run ONCE in an egress-enabled environment:

    python scripts/make_goldens.py --out tests/goldens

For each pretrained family it downloads the official checkpoint via
``load_pretrained``, runs a fixed deterministic input through the model on
CPU (fp32 — TPU bf16 matmuls are not reproducible enough for goldens), and
stores the feature output. ``tests/test_goldens.py`` then asserts parity
offline forever after — the equivalent of the reference's parity-vs-timm
tests (reference tests/test_vit.py:20-35, test_swin.py:12-20,
test_convnext.py:14-24) without needing torch/timm at test time.

The committed goldens are small ((4, C) feature vectors), so this script's
output belongs in git; the checkpoint cache does not.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

# one representative per ported-weights family
GOLDEN_SPECS = [
    # (name, img_size, kwargs)
    ("darknet19", 224, {}),
    ("cspdarknet53", 224, {}),
    ("vovnet39", 224, {}),
    ("vit_s_16", 224, {}),
    ("vit_b_16", 224, {"weights": "siglip"}),
    ("mixer_b_16", 224, {}),
    ("deit_ti_16", 224, {}),
    ("deit3_s_16", 224, {}),
    ("cait_xxs_24", 224, {}),
    ("swin_t", 224, {}),
    ("convnext_t", 224, {}),
    ("convnextv2_a", 224, {}),
    # torchvision extractor-equivalents (also validates the URL hashes,
    # which were recorded offline)
    ("resnet50", 224, {}),
    ("resnext50_32x4d", 224, {}),
    ("mobilenet_v3_large", 224, {}),
    ("efficientnet_b0", 224, {}),
    ("regnet_y_400mf", 224, {}),
    ("regnet_x_400mf", 224, {}),
]


def fixed_input(img_size: int) -> np.ndarray:
    """Deterministic low-frequency input in [0,1] (no RNG-version drift)."""
    y = np.linspace(0, 4 * np.pi, img_size, dtype=np.float32)
    x = np.linspace(0, 3 * np.pi, img_size, dtype=np.float32)
    base = np.stack(
        [
            np.sin(y)[:, None] * np.cos(x)[None, :],
            np.cos(2 * y)[:, None] * np.sin(x)[None, :],
            np.sin(3 * y)[:, None] * np.sin(2 * x)[None, :],
        ],
        axis=-1,
    )
    batch = np.stack([base * s for s in (0.25, 0.5, 0.75, 1.0)])
    return ((batch + 1) / 2).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/goldens")
    ap.add_argument("--only", default=None, help="comma-separated names")
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    from vision_toolbox_tpu.models.pretrained import load_pretrained

    only = set(args.only.split(",")) if args.only else None
    for name, img_size, kwargs in GOLDEN_SPECS:
        if only and name not in only:
            continue
        tag = name + ("_siglip" if kwargs.get("weights") == "siglip" else "")
        try:
            model, variables = load_pretrained(name, img_size=img_size, **kwargs)
        except Exception as e:  # egress or URL failure: report and continue
            print(f"SKIP {tag}: {type(e).__name__}: {e}")
            continue
        x = jnp.asarray(fixed_input(img_size))
        feats = model.apply(variables, x, train=False)
        if feats.ndim == 4:  # conv feature map -> GAP for a compact golden
            feats = feats.mean(axis=(1, 2))
        np.savez(
            out / f"{tag}.npz",
            output=np.asarray(feats, np.float32),
            img_size=img_size,
            kwargs=np.asarray(sorted(kwargs.items()), dtype=object) if kwargs else np.asarray([]),
        )
        print(f"wrote {tag}: {feats.shape}")


if __name__ == "__main__":
    main()
