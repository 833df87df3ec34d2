"""Per-op cost breakdown of trivial_augment_wide on the real chip."""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def time_op(fn, *args, n=10, warmup=2):
    fn = jax.jit(fn)
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / n


def main():
    from vision_toolbox_tpu.ops import trivial_augment as ta

    batch, img = 256, 176
    images = jax.random.uniform(jax.random.PRNGKey(0), (batch, img, img, 3), jnp.float32)
    rng = jax.random.PRNGKey(1)
    op = jax.random.randint(rng, (batch,), 0, ta.NUM_OPS)
    mag = jax.random.uniform(rng, (batch,), minval=-1.0, maxval=1.0)

    for name, fn, args in [
        ("affine_warp", ta._affine_warp, (images, op, mag)),
        ("sharpness_blur", ta._sharpness_blur, (images,)),
        ("posterize", ta._posterize, (images, jnp.abs(mag))),
        ("solarize", ta._solarize, (images, jnp.abs(mag))),
        ("autocontrast", ta._autocontrast, (images,)),
        ("equalize", ta._equalize, (images,)),
        ("grayscale", ta._grayscale, (images,)),
        ("full", ta.trivial_augment_wide, (rng, images)),
    ]:
        dt = time_op(fn, *args)
        print(f"{name:16s}: {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
