#!/usr/bin/env python
"""Offline torch .pth → JAX .npz checkpoint conversion (torch-free).

Reads any of the supported source layouts and writes a sha-named .npz that
``vision_toolbox_tpu.utils.checkpoint.load_params_npz`` can restore:

    python scripts/convert_torch_ckpt.py --family cspdarknet53 \
        --src cspdarknet53-3bfa0423.pth --out-dir converted/

Families: darknet19/53, cspdarknet53, darknet_yolov5{n,s,m,l,x},
vovnet variants, deit/deit3 (official FB), cait (official FB),
swin (official MS), convnext/convnextv2 (official FB).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vision_toolbox_tpu.utils.checkpoint import save_params_npz
from vision_toolbox_tpu.utils.torch_pth import load_pth


def convert(family: str, sd: dict, **kw) -> dict:
    from vision_toolbox_tpu.models.darknet import _DARKNET_VARIANTS, _YOLOV5_VARIANTS
    from vision_toolbox_tpu.models.vovnet import _VOVNET_TABLES
    from vision_toolbox_tpu.utils import torch_interop as ti

    if family in _DARKNET_VARIANTS:
        n_blocks, csp = _DARKNET_VARIANTS[family]
        cfgs = tuple(zip(n_blocks, (64, 128, 256, 512, 1024)))
        return ti.convert_darknet(sd, cfgs, csp)
    if family.startswith("darknet_yolov5"):
        d, w = _YOLOV5_VARIANTS[family[-1]]
        cfgs = tuple((int(n * d), int(c * w)) for n, c in zip((3, 6, 9, 3), (128, 256, 512, 1024)))
        return ti.convert_darknet(sd, cfgs, csp=True, yolov5=True)
    if family.startswith("vovnet"):
        variant = int("".join(ch for ch in family if ch.isdigit()))
        slim = "slim" in family
        ese = "ese" in family
        mids = (64, 80, 96, 112) if slim else (128, 160, 192, 224)
        outs = (128, 256, 384, 512) if slim else (256, 512, 768, 1024)
        nb, nl = _VOVNET_TABLES[variant]
        return ti.convert_vovnet(sd, tuple(zip(nb, mids, nl, outs)), ese)
    if family.startswith("deit3"):
        return ti.convert_deit(sd, kw["depth"], distilled=False, layer_scale=True)
    if family.startswith("deit"):
        return ti.convert_deit(sd, kw["depth"], distilled=True)
    if family.startswith("cait"):
        return ti.convert_cait(sd, kw["depth"])
    if family.startswith("swin"):
        return ti.convert_swin(sd, kw["depths"])
    if family.startswith("convnextv2"):
        return ti.convert_convnext(sd, kw["depths"], v2=True)
    if family.startswith("convnext"):
        return ti.convert_convnext(sd, kw["depths"], v2=False)
    raise ValueError(f"unknown family {family}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--family", required=True)
    parser.add_argument("--src", required=True)
    parser.add_argument("--out-dir", default=".")
    parser.add_argument("--depth", type=int, default=12)
    parser.add_argument("--depths", type=int, nargs="*", default=(2, 2, 6, 2))
    args = parser.parse_args()

    obj = load_pth(args.src)
    sd = obj.get("model", obj.get("state_dict", obj)) if isinstance(obj, dict) else obj
    tree = convert(args.family, sd, depth=args.depth, depths=tuple(args.depths))
    path = save_params_npz(tree, args.family, args.out_dir)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
