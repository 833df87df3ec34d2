"""Image classifier = backbone + global-average-pool + linear head,
mirroring the reference harness model (classifier.py:58-64:
``Sequential(backbone, AdaptiveAvgPool2d, Flatten, Linear)``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.base import Backbone
from ..nn.layers import Linear


class ImageClassifier(nn.Module):
    backbone: Backbone
    num_classes: int
    include_pool: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = self.backbone(x, train=train)
        if self.include_pool and x.ndim == 4:
            # conv backbones return NHWC maps; token models (ViT/DeiT/...)
            # already return pooled (B, C) embeddings
            x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d((1,1)) + Flatten
        head = Linear(self.num_classes, dtype=self.dtype, name="head")
        return head(x).astype(jnp.float32)  # logits in fp32 for a stable loss


def cross_entropy(
    logits: jax.Array, targets: jax.Array, label_smoothing: float = 0.0
) -> jax.Array:
    """F.cross_entropy with label smoothing over hard or soft targets
    (classifier.py:92). ``targets`` is int class ids or (N, C) soft labels."""
    num_classes = logits.shape[-1]
    if targets.ndim == logits.ndim - 1:
        targets = jax.nn.one_hot(targets, num_classes, dtype=logits.dtype)
    if label_smoothing > 0:
        targets = targets * (1.0 - label_smoothing) + label_smoothing / num_classes
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(targets * log_probs, axis=-1).mean()


def accuracy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """argmax top-1 accuracy (classifier.py:106-108)."""
    return (jnp.argmax(logits, axis=-1) == labels).mean()
