"""Parameter sharding over a "model" mesh axis (tensor parallelism).

Beyond-parity capability (the reference is DP-only, SURVEY.md §2.3): large
2-D kernels (classifier heads, attention/MLP projections) are sharded
column-wise over the model axis; everything else replicates. Shardings are
*committed* with device_put before jit — XLA's partitioner (GSPMD) then
propagates them through the whole train step and inserts the collectives, so
the step function itself stays unchanged.

Optimizer state trees mirror the param tree (optax momentum/trace buffers),
so the same rule applies structurally to the entire TrainState.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_partition_spec(
    path: tuple, value: Any, mesh: Mesh, model_axis: str = "model", min_size: int = 2**16
) -> P:
    """Column-shard big 2-D kernels over the model axis; replicate the rest."""
    if model_axis not in mesh.axis_names:
        return P()
    axis_size = mesh.shape[model_axis]
    if (
        hasattr(value, "ndim")
        and value.ndim == 2
        and value.size >= min_size
        and value.shape[-1] % axis_size == 0
    ):
        return P(None, model_axis)
    return P()


def fsdp_partition_spec(
    path: tuple, value: Any, mesh: Mesh, data_axis: str = "data", min_size: int = 2**16
) -> P:
    """ZeRO-3-style: shard every large param over the DATA axis (along its
    largest divisible dim). GSPMD then all-gathers weights at use and
    reduce-scatters gradients — weights and optimizer state live sharded."""
    axis_size = mesh.shape[data_axis]
    if not hasattr(value, "ndim") or value.size < min_size:
        return P()
    for dim in sorted(range(value.ndim), key=lambda d: -value.shape[d]):
        if value.shape[dim] % axis_size == 0:
            spec = [None] * value.ndim
            spec[dim] = data_axis
            return P(*spec)
    return P()


def _dict_path(path: tuple) -> tuple:
    """The DictKey subsequence of a tree path. Flax param trees are pure
    dicts, so for any optimizer buffer that mirrors the param tree (optax
    ``trace``/``mu``/``nu`` live inside NamedTuple states whose fields show up
    as GetAttrKey/SequenceKey entries) this recovers the param path exactly."""
    return tuple(k.key for k in path if isinstance(k, jax.tree_util.DictKey))


def shard_train_state(
    state, mesh: Mesh, model_axis: str = "model", min_size: int = 2**16,
    fsdp: bool = False, data_axis: str = "data", rule_fn=None,
):
    """device_put a TrainState with TP (or FSDP when ``fsdp=True``) shardings
    for params and matching shardings for the optimizer buffers.

    Optimizer buffers are matched to their parameter **by tree path** (the
    DictKey subsequence of the leaf path), not by shape — two same-shaped
    params with different specs keep distinct momentum shardings. ``rule_fn``
    overrides the per-param spec rule: ``(path, value) -> PartitionSpec``.
    """

    def rule(path, v):
        if rule_fn is not None:
            return rule_fn(path, v)
        if fsdp:
            return fsdp_partition_spec(path, v, mesh, data_axis, min_size)
        return param_partition_spec(path, v, mesh, model_axis, min_size)

    def spec_tree(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, v: NamedSharding(mesh, rule(path, v)), tree
        )

    params_sh = spec_tree(state.params)
    stats_sh = jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), state.batch_stats)

    by_path = {
        _dict_path(path): (leaf.shape, NamedSharding(mesh, rule(path, leaf)))
        for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]
    }
    replicated = NamedSharding(mesh, P())

    def opt_sharding(path, x):
        ent = by_path.get(_dict_path(path))
        if ent is not None and hasattr(x, "shape") and x.shape == ent[0]:
            return ent[1]
        return replicated

    new_params = jax.device_put(state.params, params_sh)
    new_stats = jax.device_put(state.batch_stats, stats_sh)
    new_opt = jax.tree_util.tree_map_with_path(
        lambda path, x: jax.device_put(x, opt_sharding(path, x)), state.opt_state
    )
    return state.replace(params=new_params, batch_stats=new_stats, opt_state=new_opt)
