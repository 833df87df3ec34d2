"""Backbone contract + registry.

The reference defines the contract at backbones/base.py:14-25: every backbone
exposes ``get_feature_maps(x) -> list``, ``out_channels_list`` and ``stride``;
``forward`` returns the last feature map. We keep the same contract on linen
modules and add a real string registry (``create_backbone("cspdarknet53")``)
fixing the stale ``backbones.__dict__[name]()`` path of the reference harness
(classifier.py:58 — see SURVEY.md §1).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


class Backbone(nn.Module):
    """Abstract backbone: subclasses implement ``get_feature_maps`` only."""

    def get_feature_maps(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        raise NotImplementedError

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return self.get_feature_maps(x, train=train)[-1]

    @property
    def out_channels_list(self) -> tuple[int, ...]:
        raise NotImplementedError

    @property
    def stride(self) -> int:
        raise NotImplementedError

    @property
    def last_out_channels(self) -> int:
        return self.out_channels_list[-1]

    # --- convenience -----------------------------------------------------
    def init_variables(self, rng: jax.Array | int = 0, img_size: int = 224, dtype=jnp.float32):
        """Initialize parameters with a dummy NHWC batch."""
        if isinstance(rng, int):
            rng = jax.random.PRNGKey(rng)
        dummy = jnp.zeros((1, img_size, img_size, 3), dtype)
        return self.init({"params": rng}, dummy, train=False)


_REGISTRY: dict[str, Callable[..., Backbone]] = {}


def register_model(name: str):
    def deco(fn: Callable[..., Backbone]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate model name {name}")
        _REGISTRY[name] = fn
        return fn

    return deco


def create_backbone(name: str, **kwargs: Any) -> Backbone:
    """Build a backbone by registry name, e.g. ``create_backbone("cspdarknet53")``."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown backbone {name!r}; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


def list_backbones() -> list[str]:
    return sorted(_REGISTRY)
