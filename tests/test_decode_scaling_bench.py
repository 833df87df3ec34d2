"""scripts/bench_decode_scaling.py smoke: the host-decode thread-scaling
harness (verdict #6b) must drive both the native decode pool and the composed
WDS path end-to-end. Rates are not asserted (1-core CI host) — only that the
sweep produces sane positive numbers."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.bench_decode_scaling import bench_decode, bench_wds, build_jpegs
from vision_toolbox_tpu.data.native import native_available


def test_decode_sweep_smoke():
    if not native_available():
        pytest.skip("native decoder not built")
    jpegs, sizes = build_jpegs(16)
    rate = bench_decode(jpegs, sizes, crop=64, n_threads=2, secs=0.2)
    assert rate > 0


def test_wds_sweep_smoke(tmp_path):
    jpegs, _ = build_jpegs(16)
    rate = bench_wds(jpegs, crop=64, num_streams=2, secs=0.2, tmp=tmp_path,
                     batch_size=4)
    assert rate > 0
