"""scripts/bench_serving.py smoke (verdict #4): the batched serving bench
must drive export -> rehydrate -> chained jit calls (and the int8 arm)
end-to-end. Timing values are not asserted on CPU."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.bench_serving import bench_model


def test_bench_model_smoke():
    import jax.numpy as jnp  # noqa: F401

    rows = bench_model("darknet19", [1, 2], img=32, steps=2, reps=1, int8=True)
    assert [r["batch"] for r in rows] == [1, 2]
    for r in rows:
        assert r["ms_per_batch"] > 0
        assert r["artifact_kb"] > 0
        assert r["int8_ms_per_batch"] > 0
