"""Device-mesh utilities — the TPU-native replacement for the reference's
Lightning-DDP/NCCL layer (SURVEY.md §2.3).

The distributed design is GSPMD-style: build a `jax.sharding.Mesh`, shard the
batch over the "data" axis, keep params replicated (optionally sharded later
for TP/FSDP), and let XLA insert the all-reduces over ICI. Cross-replica
BatchNorm (the reference's ``sync_batchnorm: true``) falls out automatically:
batch statistics are means over the global (sharded) batch axis, so XLA emits
the psum itself.

Multi-host: call ``jax.distributed.initialize()`` before ``create_mesh()`` and
every host contributes its local devices; the input pipeline shards files
per-host (see data/).
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    axis_names: Sequence[str] = ("data",),
    axis_sizes: Sequence[int] | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a device mesh. Default: 1-D data-parallel mesh over all devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = [n] + [1] * (len(axis_names) - 1)
    assert int(np.prod(axis_sizes)) == n, f"mesh {axis_sizes} != {n} devices"
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for an NHWC batch: leading dim split over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put a host batch (pytree of arrays) sharded over the data axis.

    Single-host: a plain sharded device_put. Multi-host: each host passes its
    *local* slice of the global batch (1/process_count of the rows — the
    loaders already do per-host sharding) and the pieces are assembled into
    one global array (the TPU-native replacement for the reference's
    per-rank batch split, data.py:65-66)."""
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch
    )
