"""Device-side augmentation semantics (extras.py:14-109 parity invariants) and
loss parity vs torch."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vision_toolbox_tpu.ops.augment import cutmix, cutmix_mixup, mixup, one_hot_labels, random_erasing
from vision_toolbox_tpu.train.classifier import cross_entropy


def _batch(n=8, size=16, c=3, classes=10, seed=0):
    rng = np.random.default_rng(seed)
    images = jnp.asarray(rng.random((n, size, size, c), dtype=np.float32))
    labels = jnp.asarray(rng.integers(0, classes, n), dtype=jnp.int32)
    return images, labels, classes


def test_mixup_is_convex_combination():
    images, labels, classes = _batch()
    targets = one_hot_labels(labels, classes)
    out_img, out_tgt = mixup(jax.random.PRNGKey(0), images, targets, alpha=0.2)
    # each output target row sums to 1 and is a mix of self + rolled neighbor
    np.testing.assert_allclose(np.asarray(out_tgt.sum(-1)), 1.0, rtol=1e-5)
    rolled = jnp.roll(images, 1, axis=0)
    # out = lam*x + (1-lam)*rolled for a single scalar lam
    lam = float(((out_img - rolled) / (images - rolled + 1e-12)).mean())
    np.testing.assert_allclose(np.asarray(out_img), np.asarray(images * lam + rolled * (1 - lam)), atol=1e-4)


def test_cutmix_box_matches_lambda():
    images, labels, classes = _batch(n=4, size=32)
    targets = one_hot_labels(labels, classes)
    out_img, out_tgt = cutmix(jax.random.PRNGKey(3), images, targets, alpha=1.0)
    # pixels are either original or rolled original; infer box fraction
    rolled = jnp.roll(images, 1, axis=0)
    replaced = np.asarray(jnp.abs(out_img - rolled).max(axis=(0, 3)) < 1e-6)  # (H, W)
    frac = replaced.mean()
    # target weight on rolled label should equal replaced fraction
    lam_adj = 1.0 - frac
    expected = np.asarray(targets) * lam_adj + np.asarray(jnp.roll(targets, 1, 0)) * (1 - lam_adj)
    np.testing.assert_allclose(np.asarray(out_tgt), expected, atol=1e-5)


def test_cutmix_mixup_coinflip_jits():
    images, labels, classes = _batch()
    targets = one_hot_labels(labels, classes)
    fn = jax.jit(lambda r, i, t: cutmix_mixup(r, i, t, 1.0, 0.2))
    for s in range(4):
        out_img, out_tgt = fn(jax.random.PRNGKey(s), images, targets)
        assert out_img.shape == images.shape
        np.testing.assert_allclose(np.asarray(out_tgt.sum(-1)), 1.0, rtol=1e-5)


def test_random_erasing_rate():
    images = jnp.zeros((512, 24, 24, 3))
    out = random_erasing(jax.random.PRNGKey(0), images, p=0.25)
    erased = np.asarray((jnp.abs(out).sum(axis=(1, 2, 3)) > 0))
    rate = erased.mean()
    assert 0.15 < rate < 0.35  # ~Binomial(512, .25)
    untouched = np.asarray(out)[~erased]
    assert np.all(untouched == 0)


def test_random_erasing_p0_identity():
    images = jnp.ones((4, 8, 8, 3))
    out = random_erasing(jax.random.PRNGKey(0), images, p=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(images))


@pytest.mark.parametrize("smoothing", [0.0, 0.1])
def test_cross_entropy_parity_hard_labels(smoothing):
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((16, 12), dtype=np.float32)
    labels = rng.integers(0, 12, 16)
    ref = F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(labels), label_smoothing=smoothing).item()
    out = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels), smoothing))
    np.testing.assert_allclose(out, ref, rtol=1e-5)


@pytest.mark.parametrize("smoothing", [0.0, 0.1])
def test_cross_entropy_parity_soft_labels(smoothing):
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((16, 12), dtype=np.float32)
    soft = rng.random((16, 12), dtype=np.float32)
    soft /= soft.sum(-1, keepdims=True)
    ref = F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(soft), label_smoothing=smoothing).item()
    out = float(cross_entropy(jnp.asarray(logits), jnp.asarray(soft), smoothing))
    np.testing.assert_allclose(out, ref, rtol=1e-5)
