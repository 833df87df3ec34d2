#!/usr/bin/env python
"""Export a DarknetYOLOv5 backbone checkpoint (.npz, our tree) to the
Ultralytics YOLOv5 key layout (reference scripts/convert_yolov5_weights.py
rules — torch-free; weights are emitted as an .npz with Ultralytics names and
torch layouts (conv OIHW) so a torch-side `load_state_dict` needs only a
tensor wrap).

Mapping (ref rules at convert_yolov5_weights.py:10-16, note the conv1↔cv2 /
conv2↔cv1 swap):
  stem                      -> model.0
  stage_{i}/conv            -> model.{2i+1}
  stage_{i}/conv1           -> model.{2i+2}.cv2
  stage_{i}/conv2           -> model.{2i+2}.cv1
  stage_{i}/block_{j}/convK -> model.{2i+2}.m.{j}.cvK
  stage_{i}/out_conv        -> model.{2i+2}.cv3
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from vision_toolbox_tpu.utils.checkpoint import flatten_tree, load_params_npz


def _emit(out: dict, ours: dict, stats: dict, our_prefix: str, ult_prefix: str):
    """ConvNormAct subtree -> ultralytics conv+bn names (torch layouts)."""
    kernel = ours["conv"]["kernel"]
    out[f"{ult_prefix}.conv.weight"] = np.transpose(kernel, (3, 2, 0, 1))
    out[f"{ult_prefix}.bn.weight"] = ours["norm"]["scale"]
    out[f"{ult_prefix}.bn.bias"] = ours["norm"]["bias"]
    out[f"{ult_prefix}.bn.running_mean"] = stats["norm"]["mean"]
    out[f"{ult_prefix}.bn.running_var"] = stats["norm"]["var"]


def convert(tree: dict) -> dict:
    params, stats = tree["params"], tree["batch_stats"]
    out: dict = {}
    _emit(out, params["stem"], stats["stem"], "stem", "model.0")
    i = 0
    while f"stage_{i}" in params:
        p, s = params[f"stage_{i}"], stats[f"stage_{i}"]
        _emit(out, p["conv"], s["conv"], "conv", f"model.{2*i+1}")
        _emit(out, p["conv1"], s["conv1"], "conv1", f"model.{2*i+2}.cv2")
        _emit(out, p["conv2"], s["conv2"], "conv2", f"model.{2*i+2}.cv1")
        _emit(out, p["out_conv"], s["out_conv"], "out_conv", f"model.{2*i+2}.cv3")
        j = 0
        while f"block_{j}" in p:
            for k in (1, 2):
                _emit(out, p[f"block_{j}"][f"conv{k}"], s[f"block_{j}"][f"conv{k}"],
                      "blk", f"model.{2*i+2}.m.{j}.cv{k}")
            j += 1
        i += 1
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("src_path", help=".npz backbone checkpoint (our tree)")
    parser.add_argument("dst_path", help="output .npz with Ultralytics names")
    args = parser.parse_args()

    tree = load_params_npz(args.src_path)
    out = convert(tree)
    for k, v in out.items():
        print(f"{k}: {tuple(v.shape)}")
    np.savez(args.dst_path, **out)
    print(f"wrote {args.dst_path} ({len(out)} tensors)")


if __name__ == "__main__":
    main()
