"""Idempotent checkpoint download (reference utils.py:6-10 torch_hub_download
equivalent, torch-free): downloads to a local cache dir, skipping when the
file already exists."""

from __future__ import annotations

import os
import urllib.request


def cache_dir() -> str:
    root = os.environ.get("VTT_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "vision_toolbox_tpu"
    )
    os.makedirs(root, exist_ok=True)
    return root


def cached_download(url: str) -> str:
    path = os.path.join(cache_dir(), os.path.basename(url))
    if not os.path.exists(path):
        tmp = path + ".part"
        urllib.request.urlretrieve(url, tmp)
        os.replace(tmp, path)
    return path
