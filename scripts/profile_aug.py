"""Per-phase timing of the device-side augmentation pipeline on the real chip.

Breaks the full-recipe step cost into: bare step, TrivialAugment warp,
TA pixel ops (each candidate), equalize, RandomErasing, CutMix/MixUp.
All timings host-readback fenced (see CLAUDE.md TPU-timing note).

Usage: python scripts/profile_aug.py [batch] [size]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def bench(fn, *args, n=20, warmup=3):
    fn = jax.jit(fn)
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0])
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 176

    from vision_toolbox_tpu.ops import trivial_augment as ta
    from vision_toolbox_tpu.ops.augment import cutmix_mixup, one_hot_labels, random_erasing
    from vision_toolbox_tpu.ops.warp import affine_warp

    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (batch, size, size, 3), jnp.float32)
    op = jax.random.randint(jax.random.PRNGKey(1), (batch,), 0, ta.NUM_OPS)
    mag = jax.random.uniform(jax.random.PRNGKey(2), (batch,), minval=-1, maxval=1)
    labels = jax.random.randint(jax.random.PRNGKey(3), (batch,), 0, 1000)

    print(f"batch={batch} size={size} backend={jax.default_backend()}")

    t = bench(lambda im: ta.trivial_augment_wide(jax.random.PRNGKey(7), im), images)
    print(f"trivial_augment_wide (full): {t:8.2f} ms")

    t = bench(affine_warp, images, op, mag)
    print(f"  affine_warp (pallas):      {t:8.2f} ms")

    # geometric ops only vs pixel ops only
    op_geo = jnp.full((batch,), ta.OP_ROTATE, jnp.int32)
    t = bench(affine_warp, images, op_geo, mag)
    print(f"  affine_warp (all rotate):  {t:8.2f} ms")
    op_id = jnp.full((batch,), ta.OP_IDENTITY, jnp.int32)
    t = bench(affine_warp, images, op_id, mag)
    print(f"  affine_warp (all identity):{t:8.2f} ms")

    for name, fn in [
        ("equalize", ta._equalize),
        ("autocontrast", ta._autocontrast),
        ("sharpness_blur", ta._sharpness_blur),
        ("posterize", lambda im: ta._posterize(im, jnp.abs(mag))),
        ("solarize", lambda im: ta._solarize(im, jnp.abs(mag))),
        ("grayscale", ta._grayscale),
    ]:
        t = bench(fn, images)
        print(f"  {name:26s} {t:8.2f} ms")

    t = bench(lambda im: random_erasing(jax.random.PRNGKey(9), im, 0.1), images)
    print(f"random_erasing:              {t:8.2f} ms")

    targets = one_hot_labels(labels, 1000)
    t = bench(lambda im, tg: cutmix_mixup(jax.random.PRNGKey(11), im, tg), images, targets)
    print(f"cutmix_mixup:                {t:8.2f} ms")

    # noise generation cost in isolation (random_erasing's dominant term?)
    t = bench(lambda: jax.random.normal(jax.random.PRNGKey(13), images.shape, images.dtype))
    print(f"jax.random.normal(img shape):{t:8.2f} ms")
    t = bench(
        lambda: jax.lax.rng_bit_generator(
            jnp.zeros((2,), jnp.uint64), images.shape, dtype=jnp.uint32
        )[1]
    )
    print(f"rng_bit_generator(img shape):{t:8.2f} ms")


if __name__ == "__main__":
    main()
