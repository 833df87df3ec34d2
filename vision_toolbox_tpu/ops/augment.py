"""Device-side batch augmentation — jit-compiled, runs on TPU inside the train
step (the reference runs these as torch batch ops in training_step,
classifier.py:86-87; extras.py:14-109).

Semantics match the reference exactly:
  * pairing by ``roll(1, axis=0)`` (extras.py:34,68)
  * one Beta(α,α) λ per *batch* (extras.py:38,72)
  * CutMix box: uniform center, half-size ``0.5*sqrt(1-λ)``, clamped to the
    image, λ recomputed from actual box area (extras.py:75-88)
  * ``cutmix_mixup``: 50% coin flip choosing CutMix or MixUp per batch
    (extras.py:105-108)

Everything is traced — no data-dependent Python control flow — so the whole
augmentation fuses into the train step under jit. The CutMix paste is a
broadcasted-iota mask select (TPU-friendly; no dynamic slices).

Images are NHWC, labels are int32 class ids or already-one-hot float arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def one_hot_labels(labels: jax.Array, num_classes: int, dtype=jnp.float32) -> jax.Array:
    if labels.ndim == 1:
        return jax.nn.one_hot(labels, num_classes, dtype=dtype)
    return labels.astype(dtype)


def _sample_beta(rng: jax.Array, alpha: float) -> jax.Array:
    return jax.random.beta(rng, alpha, alpha)


def mixup(
    rng: jax.Array, images: jax.Array, targets: jax.Array, alpha: float = 0.2
) -> tuple[jax.Array, jax.Array]:
    """Batch MixUp (extras.py:14-45 with p=1)."""
    lam = _sample_beta(rng, alpha).astype(images.dtype)
    images_rolled = jnp.roll(images, 1, axis=0)
    targets_rolled = jnp.roll(targets, 1, axis=0)
    images = images * lam + images_rolled * (1.0 - lam)
    targets = targets * lam.astype(targets.dtype) + targets_rolled * (1.0 - lam.astype(targets.dtype))
    return images, targets


def cutmix(
    rng: jax.Array, images: jax.Array, targets: jax.Array, alpha: float = 1.0
) -> tuple[jax.Array, jax.Array]:
    """Batch CutMix (extras.py:48-93 with p=1). One box per batch."""
    _, H, W, _ = images.shape
    rng_lam, rng_x, rng_y = jax.random.split(rng, 3)
    lam = _sample_beta(rng_lam, alpha)

    r_x = jax.random.randint(rng_x, (), 0, W)
    r_y = jax.random.randint(rng_y, (), 0, H)
    r = 0.5 * jnp.sqrt(1.0 - lam)
    r_w_half = jnp.floor(r * W).astype(jnp.int32)
    r_h_half = jnp.floor(r * H).astype(jnp.int32)

    x1 = jnp.clip(r_x - r_w_half, 0, W)
    y1 = jnp.clip(r_y - r_h_half, 0, H)
    x2 = jnp.clip(r_x + r_w_half, 0, W)
    y2 = jnp.clip(r_y + r_h_half, 0, H)

    cols = jax.lax.broadcasted_iota(jnp.int32, (1, H, W, 1), 2)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, H, W, 1), 1)
    box = (rows >= y1) & (rows < y2) & (cols >= x1) & (cols < x2)

    images_rolled = jnp.roll(images, 1, axis=0)
    targets_rolled = jnp.roll(targets, 1, axis=0)
    images = jnp.where(box, images_rolled, images)

    lam_adj = (1.0 - ((x2 - x1) * (y2 - y1)) / (W * H)).astype(targets.dtype)
    targets = targets * lam_adj + targets_rolled * (1.0 - lam_adj)
    return images, targets


def cutmix_mixup(
    rng: jax.Array,
    images: jax.Array,
    targets: jax.Array,
    cutmix_alpha: float = 1.0,
    mixup_alpha: float = 0.2,
) -> tuple[jax.Array, jax.Array]:
    """Per-batch coin flip: 50% CutMix else MixUp (extras.py:96-109)."""
    rng_coin, rng_op = jax.random.split(rng)
    if cutmix_alpha <= 0 and mixup_alpha <= 0:
        raise ValueError("one of cutmix_alpha / mixup_alpha must be > 0")
    if cutmix_alpha <= 0:
        return mixup(rng_op, images, targets, mixup_alpha)
    if mixup_alpha <= 0:
        return cutmix(rng_op, images, targets, cutmix_alpha)
    use_cutmix = jax.random.bernoulli(rng_coin, 0.5)
    return jax.lax.cond(
        use_cutmix,
        lambda r, im, t: cutmix(r, im, t, cutmix_alpha),
        lambda r, im, t: mixup(r, im, t, mixup_alpha),
        rng_op, images, targets,
    )


def random_erasing(
    rng: jax.Array,
    images: jax.Array,
    p: float = 0.1,
    scale: tuple[float, float] = (0.02, 0.33),
    ratio: tuple[float, float] = (0.3, 3.3),
) -> jax.Array:
    """Per-sample RandomErasing with value="random" (data.py:50).

    torchvision rejection-samples up to 10 boxes; here we sample one box and
    clamp it to the image (same support, slightly different box distribution —
    an accepted device-side tradeoff that keeps the op a single fused kernel).
    Erased pixels are N(0,1) noise, matching ``value="random"``.
    """
    N, H, W, C = images.shape
    rngs = jax.random.split(rng, 6)
    apply = jax.random.bernoulli(rngs[0], p, (N, 1, 1, 1))
    area = jax.random.uniform(rngs[1], (N,), minval=scale[0], maxval=scale[1]) * (H * W)
    log_ratio = jax.random.uniform(
        rngs[2], (N,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_ratio)
    h = jnp.minimum(jnp.sqrt(area * aspect).astype(jnp.int32), H)
    w = jnp.minimum(jnp.sqrt(area / aspect).astype(jnp.int32), W)
    top = (jax.random.uniform(rngs[3], (N,)) * (H - h + 1)).astype(jnp.int32)
    left = (jax.random.uniform(rngs[4], (N,)) * (W - w + 1)).astype(jnp.int32)

    rows = jax.lax.broadcasted_iota(jnp.int32, (N, H, W, 1), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (N, H, W, 1), 2)
    t = top[:, None, None, None]
    l = left[:, None, None, None]
    box = (rows >= t) & (rows < t + h[:, None, None, None]) & (cols >= l) & (cols < l + w[:, None, None, None])
    noise = jax.random.normal(rngs[5], images.shape, images.dtype)
    return jnp.where(apply & box, noise, images)
