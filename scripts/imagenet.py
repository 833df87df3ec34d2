#!/usr/bin/env python
"""Reorganize the Kaggle ImageNet val/ split into class folders using
LOC_val_solution.csv (reference scripts/imagenet.py:8-27 equivalent,
csv-module based — no pandas needed).

    python scripts/imagenet.py --val-dir val --csv LOC_val_solution.csv
"""

from __future__ import annotations

import argparse
import csv
import os
import shutil


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--val-dir", required=True)
    parser.add_argument("--csv", required=True, help="LOC_val_solution.csv")
    args = parser.parse_args()

    with open(args.csv) as f:
        reader = csv.reader(f)
        next(reader)  # header: ImageId,PredictionString
        moved = 0
        for image_id, prediction in reader:
            wnid = prediction.split()[0]
            cls_dir = os.path.join(args.val_dir, wnid)
            os.makedirs(cls_dir, exist_ok=True)
            src = os.path.join(args.val_dir, image_id + ".JPEG")
            if os.path.exists(src):
                shutil.move(src, os.path.join(cls_dir, image_id + ".JPEG"))
                moved += 1
    print(f"moved {moved} images into class folders")


if __name__ == "__main__":
    main()
