"""Serving export via jax.export — the TPU-native analogue of the
reference's TorchScript path (classifier.py:80-81, tests/test_backbones.py:76-78).

``export_model`` serializes a jitted inference function + weights into a
portable artifact; ``load_exported`` rehydrates it into a callable without
the model's Python code. Artifacts are forward-compatible across JAX
versions per jax.export guarantees.

Format: the weights travel NEXT TO the StableHLO module, as function
arguments, not baked into it as constants — a weights-baked module must
ship every parameter byte inside the compile payload, which exceeds
compile-service request limits for ViT-B-class models (measured: HTTP 413
at 86.6M bf16 params on the v5e tunnel) and would force a re-export for
every checkpoint update. Layout: magic ``VTTX0002`` + u64 little-endian
length of the exported-function blob + that blob + a flax msgpack of the
variables dict.
"""

from __future__ import annotations

import struct

import jax
import jax.numpy as jnp
from jax import export as jax_export

_MAGIC = b"VTTX0002"


def export_model(model, variables: dict, input_shape: tuple[int, ...], dtype=jnp.float32) -> bytes:
    """Serialize ``model.apply(variables, x)``; weights ride as arguments."""
    from flax import serialization as fser

    var_structs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)), variables
    )

    def fn(variables, x):
        return model.apply(variables, x, train=False)

    exported = jax_export.export(jax.jit(fn))(
        var_structs, jax.ShapeDtypeStruct(input_shape, dtype)
    )
    fn_blob = bytes(exported.serialize())
    w_blob = fser.msgpack_serialize(jax.tree.map(lambda a: jnp.asarray(a), variables))
    return _MAGIC + struct.pack("<Q", len(fn_blob)) + fn_blob + w_blob


class ExportedModel:
    """Rehydrated serving artifact.

    ``fn(x)`` is the convenience path (weights applied internally, passed as
    jit ARGUMENTS). For composition inside a larger jitted program, thread
    the weights through explicitly — ``fn.call(fn.variables, x)`` — closing
    over ``fn.variables`` instead would inline every parameter byte into the
    traced module as stablehlo.constant literals (measured: a vit_b chain's
    compile payload blew the remote-compile service's request limit).
    """

    def __init__(self, exported, variables):
        self.exported = exported
        self.variables = variables
        self._jit = jax.jit(self.call)

    def call(self, variables, x):
        return self.exported.call(variables, x)

    def __call__(self, x):
        return self._jit(self.variables, x)


def load_exported(blob: bytes):
    """Deserialize an exported artifact into a callable(x) -> output."""
    from flax import serialization as fser

    if not blob.startswith(_MAGIC):
        # legacy layout (round ≤4 artifacts): weights baked into the module
        exported = jax_export.deserialize(blob)
        return lambda x: exported.call(x)
    off = len(_MAGIC) + 8
    (fn_len,) = struct.unpack("<Q", blob[len(_MAGIC):off])
    exported = jax_export.deserialize(blob[off:off + fn_len])
    variables = fser.msgpack_restore(blob[off + fn_len:])
    variables = jax.tree.map(jnp.asarray, variables)  # device-resident once
    return ExportedModel(exported, variables)
