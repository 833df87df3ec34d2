"""Serving export via jax.export — the TPU-native analogue of the
reference's TorchScript path (classifier.py:80-81, tests/test_backbones.py:76-78).

``export_model`` serializes a jitted inference function + weights into a
portable StableHLO artifact; ``load_exported`` rehydrates it into a callable
without the model's Python code. Artifacts are forward-compatible across JAX
versions per jax.export guarantees.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_model(model, variables: dict, input_shape: tuple[int, ...], dtype=jnp.float32) -> bytes:
    """Serialize ``model.apply(variables, x)`` closed over the weights."""

    def fn(x):
        return model.apply(variables, x, train=False)

    exported = jax_export.export(jax.jit(fn))(
        jax.ShapeDtypeStruct(input_shape, dtype)
    )
    return bytes(exported.serialize())


def load_exported(blob: bytes):
    """Deserialize an exported artifact into a callable(x) -> output."""
    exported = jax_export.deserialize(blob)
    return lambda x: exported.call(x)
