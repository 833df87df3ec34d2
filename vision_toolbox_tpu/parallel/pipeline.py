"""Pipeline parallelism (GPipe schedule) over a ``pipe`` mesh axis.

Beyond-parity capability (the reference is DP-only, SURVEY.md §2.3): the
stacked homogeneous transformer blocks (ViT/DeiT families — ref
backbones/vit.py:60-92 is the block being pipelined) are sharded layer-wise
over a ``pipe`` mesh axis and microbatches flow stage-to-stage over ICI via
``lax.ppermute`` inside ``jax.shard_map``. This is the TPU-native shape of
pipeline parallelism: no per-rank processes or send/recv queues — one jitted
SPMD program in which XLA overlaps each stage's compute with the
neighbor-permute of the previous microbatch.

Design:
  * Block params are **stacked** along a leading layer axis (``(L, ...)``
    leaves) and sharded ``P("pipe")`` — each stage holds ``L/S`` layers.
    ``stack_block_params``/``unstack_block_params`` convert to/from the
    standard per-block param tree, so checkpoints remain interchangeable
    with the unpipelined models (param trees are the checkpoint interface).
  * The schedule is GPipe with M microbatches over S stages: ``M + S - 1``
    scan steps; stage 0 feeds new microbatches, stage S-1 collects outputs,
    everyone else relays. The bubble fraction is ``(S-1)/(M+S-1)`` — pick
    ``M >= 4·S`` in production configs. Bubble steps (stage s is idle for
    the first s and last S-1-s steps) skip the stage compute entirely via a
    per-device ``lax.cond`` (the ppermute relay stays outside the branch so
    the collective never diverges across devices) — the idle devices burn no
    FLOPs/HBM while they wait, which matters for energy and for any co-sharded
    work on the same chips.
  * Autodiff: ``jax.grad`` through the scan + ppermute IS the pipelined
    backward (the transpose of a ring ppermute is the reverse-ring
    ppermute), with GPipe's stash-everything activation memory. Combine
    with ``jax.checkpoint`` on the stage fn to trade FLOPs for memory.
  * Composes with data parallelism: run on a ``("data", "pipe")`` mesh and
    shard the batch over ``data`` — each data-rank runs an independent
    pipeline; gradient all-reduce over ``data`` falls out of shard_map's
    transpose (params are unvarying over ``data``).

Dropout/stochastic-depth inside pipelined blocks must be disabled (the
stage fn is applied without rng streams); ViT's default recipe carries its
regularization in the data pipeline, so this matches production use.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, PartitionSpec as P


# ---------------------------------------------------------------- param trees


def stack_block_params(params: dict, prefix: str = "block_") -> tuple[Any, dict]:
    """Split a param tree into (stacked block tree, rest).

    ``params`` holds per-block subtrees ``{prefix}0 .. {prefix}{L-1}`` (the
    ViT layout, models/vit.py); the result stacks every leaf along a new
    leading layer axis — ``(L, ...)`` — ready to shard ``P("pipe")``.
    """
    names = sorted(
        (k for k in params if k.startswith(prefix) and k[len(prefix):].isdigit()),
        key=lambda k: int(k[len(prefix):]),
    )
    assert names, f"no '{prefix}*' blocks in param tree"
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *[params[k] for k in names])
    rest = {k: v for k, v in params.items() if k not in names}
    return stacked, rest


def unstack_block_params(stacked: Any, rest: dict | None = None, prefix: str = "block_") -> dict:
    """Inverse of :func:`stack_block_params` — back to the checkpoint layout."""
    depth = jax.tree.leaves(stacked)[0].shape[0]
    out = dict(rest or {})
    for i in range(depth):
        out[f"{prefix}{i}"] = jax.tree.map(lambda a, i=i: a[i], stacked)
    return out


def _interleave_order(depth: int, stages: int, interleave: int):
    """Layer permutation for the interleaved schedule: device d's chunks
    (d, d+S, ..., d+(v-1)S) laid out contiguously, so the plain ``P(pipe)``
    contiguous shard of the leading axis places them with zero data movement
    (a canonical-order array would need a per-step weight permute instead)."""
    import numpy as np

    C = stages * interleave
    assert depth % C == 0, f"depth {depth} not divisible by {stages} stages x {interleave} chunks"
    lc = depth // C
    return np.concatenate(
        [
            np.arange((d + p * stages) * lc, (d + p * stages + 1) * lc)
            for d in range(stages)
            for p in range(interleave)
        ]
    )


def interleave_block_params(stacked: Any, stages: int, interleave: int) -> Any:
    """Canonical ``(L, ...)`` layer order → device-major chunk order expected
    by ``pipeline_apply(interleave=v)`` (see :func:`_interleave_order`)."""
    if interleave == 1:
        return stacked
    order = _interleave_order(jax.tree.leaves(stacked)[0].shape[0], stages, interleave)
    return jax.tree.map(lambda a: jnp.take(a, order, axis=0), stacked)


def uninterleave_block_params(stacked: Any, stages: int, interleave: int) -> Any:
    """Inverse of :func:`interleave_block_params` — back to canonical order."""
    import numpy as np

    if interleave == 1:
        return stacked
    order = _interleave_order(jax.tree.leaves(stacked)[0].shape[0], stages, interleave)
    inv = np.argsort(order)
    return jax.tree.map(lambda a: jnp.take(a, inv, axis=0), stacked)


def make_stage_fn(block: nn.Module, train: bool = False, remat: bool = False) -> Callable:
    """Stage function applying a stack of ``block`` layers sequentially.

    ``params`` leaves are ``(layers_per_stage, ...)``; the layer loop is a
    ``lax.scan`` so the program size is depth-independent and the fused
    block kernels (ops/block_attention.py, ops/block_mlp.py) dispatch inside
    the scanned body exactly as in the unpipelined model. ``remat=True``
    checkpoints each layer — GPipe stashes activations for every in-flight
    microbatch, so rematerialization is the standard memory lever here.
    """

    def apply_block(p, h):
        return block.apply({"params": p}, h, train=train)

    if remat:
        apply_block = jax.checkpoint(apply_block)

    def stage_fn(params, x):
        def body(h, p):
            return apply_block(p, h), None

        y, _ = jax.lax.scan(body, x, params)
        return y

    return stage_fn


# ------------------------------------------------------------------ schedule


def pipeline_apply(
    stage_fn: Callable,
    stacked_params: Any,
    x: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "pipe",
    batch_axis: str | None = None,
    num_microbatches: int | None = None,
    skip_bubbles: bool = True,
    interleave: int = 1,
) -> jax.Array:
    """Run ``x`` through ``L`` stacked layers pipelined over ``mesh[axis]``.

    ``stacked_params``: leaves ``(L, ...)`` with ``L % S == 0``;
    ``x``: ``(B, ...)`` activations with ``B % M == 0``. ``stage_fn(params,
    mb)`` applies one stage's layer slice to one microbatch (it must be
    shape-preserving — the relay buffer is reused across steps). Other mesh
    axes: pass ``batch_axis`` to keep the batch sharded over it (data
    parallel) — every data-rank runs an independent pipeline.
    ``skip_bubbles=False`` forces the pre-skip schedule in which every device
    computes every step on (masked-out) garbage — kept for A/B tests.

    ``interleave=v`` runs the Megatron-style interleaved schedule: the stack
    splits into ``C = v*S`` chunks and device ``d`` holds chunks
    ``d, d+S, ..., d+(v-1)S`` — each microbatch rides the ring ``v`` times,
    so per-device utilization at ``M = S`` rises from ``S/(2S-1)`` (~1/2) to
    ``vS/(vS+S-1)`` (~``v/(v+1)``) while keeping only ``M`` microbatches of
    activations in flight (plain GPipe needs ``vM`` microbatches for the
    same bubble — interleave is the activation-memory lever). The relay
    stays the same ring ppermute; the per-step cost is ``v-1`` extra
    activation-sized hops per microbatch. Constraints: ``M <= S`` (the
    collision-free window of the shifted schedule), ``L % (v*S) == 0``, and
    ``stacked_params`` must already be in device-major chunk order
    (:func:`interleave_block_params`) so the contiguous ``P(pipe)`` shard
    places each device's chunks with zero per-step weight movement.
    ``stage_fn`` receives ``L/(v*S)``-layer slices.

    Returns ``(B, ...)`` outputs, identical (up to scheduling) to applying
    the L layers sequentially.
    """
    S = mesh.shape[axis]
    v = interleave
    assert v >= 1, f"interleave must be >= 1, got {v}"
    M = num_microbatches or max(S, 1)
    B = x.shape[0]
    L = jax.tree.leaves(stacked_params)[0].shape[0]
    assert L % (S * v) == 0, (
        f"depth {L} not divisible by {S} pipeline stages"
        + (f" x {v} interleaved chunks" if v > 1 else "")
    )
    assert B % M == 0, f"batch {B} not divisible by {M} microbatches"
    if v > 1:
        assert M <= S, (
            f"interleaved schedule needs num_microbatches <= stages ({M} > {S}): "
            f"with M > S two passes of different microbatches collide on a "
            f"device at the same step"
        )
    if batch_axis is not None:
        dp = mesh.shape[batch_axis]
        assert (B // M) % dp == 0, (
            f"microbatch {B // M} not divisible by the {batch_axis}={dp} axis "
            f"(global batch {B}, {M} microbatches)"
        )
    if S == 1:  # no pipe axis worth scheduling — plain sequential scan
        return stage_fn(stacked_params, x)

    xs = x.reshape(M, B // M, *x.shape[1:])

    def run(params, xs):
        stage = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % S) for i in range(S)]

        def step_gpipe(carry, t):
            state, outs = carry
            # stage 0 ingests microbatch t (clamped — bubble steps feed a
            # repeat whose output is never collected); others take the relay
            xin = jax.lax.dynamic_index_in_dim(xs, jnp.minimum(t, M - 1), 0, keepdims=False)
            cur = jnp.where(stage == 0, xin, state)
            if skip_bubbles:
                # stage s holds real microbatch u=t-s only for 0<=u<M; outside
                # that window its input is a garbage relay whose output is
                # never collected — skip the FLOPs (identity keeps the relay
                # shape). Grads are unchanged: collection masks the garbage
                # path to zero cotangent either way.
                real = (t >= stage) & (t < stage + M)
                y = jax.lax.cond(real, lambda c: stage_fn(params, c), lambda c: c, cur)
            else:
                y = stage_fn(params, cur)
            # last stage collects microbatch u = t-(S-1) once it's real
            u = jnp.clip(t - (S - 1), 0, M - 1)
            upd = jax.lax.dynamic_update_index_in_dim(outs, y, u, 0)
            outs = jnp.where((stage == S - 1) & (t >= S - 1), upd, outs)
            nxt = jax.lax.ppermute(y, axis, perm)
            return (nxt, outs), None

        def step_interleaved(carry, t, lparams):
            # Which (microbatch, chunk) does this device hold at step t?
            # Microbatch m sits at chunk c = t - m, and chunk c lives here
            # iff c ≡ stage (mod S); with M <= S at most one candidate m is
            # in range: m* = (t - stage) mod S. Local pass p = (c - stage)/S.
            state, outs = carry
            C = v * S
            mstar = jnp.mod(t - stage, S)
            c = t - mstar
            p = jnp.clip((c - stage) // S, 0, v - 1)
            real = (mstar < M) & (c >= 0) & (c < C)
            local = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, p, 0, keepdims=False),
                lparams,
            )
            xin = jax.lax.dynamic_index_in_dim(xs, jnp.minimum(t, M - 1), 0, keepdims=False)
            # device 0 ingests on its pass-0 window (chunk 0); every later
            # pass — and every other device — consumes the ring relay
            cur = jnp.where((stage == 0) & (c <= 0), xin, state)
            if skip_bubbles:
                y = jax.lax.cond(
                    real, lambda a: stage_fn(a[0], a[1]), lambda a: a[1], (local, cur)
                )
            else:
                y = stage_fn(local, cur)
            # the final chunk C-1 (on device S-1) finishes microbatch m*
            upd = jax.lax.dynamic_update_index_in_dim(
                outs, y, jnp.clip(mstar, 0, M - 1), 0
            )
            outs = jnp.where(real & (c == C - 1), upd, outs)
            nxt = jax.lax.ppermute(y, axis, perm)
            return (nxt, outs), None

        carry0 = (jnp.zeros_like(xs[0]), jnp.zeros_like(xs))
        if v == 1:
            step, n_steps = step_gpipe, M + S - 1
        else:
            # local leaves (v * L/C, ...) -> (v, L/C, ...): pass-indexable
            lparams = jax.tree.map(
                lambda a: a.reshape(v, a.shape[0] // v, *a.shape[1:]), params
            )
            step = functools.partial(step_interleaved, lparams=lparams)
            n_steps = M + v * S - 1
        (_, outs), _ = jax.lax.scan(step, carry0, jnp.arange(n_steps))
        # broadcast the collected outputs from the last stage to every pipe
        # rank (one all-reduce; keeps the result's sharding pipe-invariant
        # so the epilogue/loss runs as plain GSPMD outside this region)
        return jax.lax.psum(jnp.where(stage == S - 1, outs, 0), axis)

    bspec = P(None, batch_axis) if batch_axis else P()
    outs = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P(axis), bspec),
        out_specs=bspec,
        check_vma=False,  # axis_index-driven select: per-stage values are
        # deliberately unreplicated over `axis` until the final psum
    )(stacked_params, xs)
    return outs.reshape(B, *x.shape[1:])


# ------------------------------------------------------------- ViT front end


class _ViTPrologue(nn.Module):
    """Patch embed + PE + cls concat — the pre-pipeline part of ViT.__call__
    (models/vit.py:42-71), applied against the SAME param subtree/names.
    Mirrors ViT._embed exactly (same modules, names, inits) — the
    equivalence test pins the two together."""

    d_model: int
    patch_size: int
    img_size: int
    cls_token: bool
    dtype: Any

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..nn.initializers import torch_default_bias, torch_default_kernel

        p = self.patch_size
        x = nn.Conv(
            self.d_model, (p, p), strides=(p, p), padding="VALID",
            kernel_init=torch_default_kernel, bias_init=torch_default_bias(3 * p * p),
            dtype=self.dtype, name="patch_embed",
        )(x)
        out = x.reshape(x.shape[0], -1, self.d_model)
        n_tokens = (self.img_size // self.patch_size) ** 2
        pe = self.param("pe", nn.initializers.normal(0.02), (1, n_tokens, self.d_model))
        out = out + pe.astype(out.dtype)
        if self.cls_token:
            cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.d_model))
            cls = jnp.broadcast_to(cls, (out.shape[0], 1, self.d_model)).astype(out.dtype)
            out = jnp.concatenate([cls, out], axis=1)
        return out


class _ViTEpilogue(nn.Module):
    """Final norm + pooling — the post-pipeline part of ViT.__call__
    (models/vit.py:74-85), applied against the SAME param subtree/names."""

    d_model: int
    n_heads: int
    bias: bool
    mlp_ratio: float
    norm_eps: float
    pool_type: str
    dtype: Any

    @nn.compact
    def __call__(self, out: jax.Array, train: bool = False) -> jax.Array:
        from ..nn.attention import MHAPooling

        norm = nn.LayerNorm(self.norm_eps, dtype=self.dtype, name="norm")
        if self.pool_type == "cls_token":
            return norm(out[:, 0])
        if self.pool_type == "gap":
            return norm(out).mean(axis=1)
        if self.pool_type == "mha":
            pooler = MHAPooling(
                self.d_model, self.n_heads, self.bias, self.mlp_ratio, self.norm_eps,
                dtype=self.dtype, name="pooler",
            )
            return pooler(norm(out), train=train)
        raise ValueError(f"unsupported pool_type {self.pool_type}")


def vit_pipeline_forward(
    vit: nn.Module,
    variables: dict,
    x: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "pipe",
    batch_axis: str | None = None,
    num_microbatches: int | None = None,
    train: bool = False,
    remat: bool = False,
    interleave: int = 1,
) -> jax.Array:
    """ViT forward with the block stack pipelined over ``mesh[axis]``.

    Numerically the same model as ``vit.apply(variables, x)`` (same params,
    same flax modules for embed/norm/pool, same blocks — only the schedule
    changes). Prologue and epilogue are tiny (<2% of FLOPs) and run as
    plain GSPMD on every device.
    """
    stacked, rest = stack_block_params(variables["params"])
    stacked = interleave_block_params(stacked, mesh.shape[axis], interleave)
    return vit_pipeline_forward_stacked(
        vit, stacked, rest, x, mesh=mesh, axis=axis, batch_axis=batch_axis,
        num_microbatches=num_microbatches, train=train, remat=remat,
        interleave=interleave,
    )


def vit_pipeline_forward_stacked(
    vit: nn.Module,
    stacked: Any,
    rest: dict,
    x: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "pipe",
    batch_axis: str | None = None,
    num_microbatches: int | None = None,
    train: bool = False,
    remat: bool = False,
    interleave: int = 1,
) -> jax.Array:
    """Same as :func:`vit_pipeline_forward` but on a pre-stacked state —
    production pipeline training keeps ``(stacked, rest)`` AS the train
    state (stack once at setup, shard ``P(pipe)``, momentum mirrors it) and
    converts back to the checkpoint layout with ``unstack_block_params``."""
    from ..models.deit import DeiT
    from ..models.vit import ViT
    from ..nn.attention import ViTBlock

    # the prologue/epilogue mirror ViT and DeiT exactly — any OTHER subclass
    # with its own __call__ would silently compute a different model
    is_deit = type(vit) is DeiT
    assert is_deit or type(vit) is ViT, (
        f"pipeline forward mirrors ViT/DeiT exactly; got {type(vit).__name__}"
    )

    if is_deit:
        prologue = _DeiTPrologue(vit.d_model, vit.patch_size, vit.img_size, vit.dtype)
    else:
        prologue = _ViTPrologue(
            vit.d_model, vit.patch_size, vit.img_size, vit.cls_token, vit.dtype
        )
    out = prologue.apply({"params": rest}, x)
    block = ViTBlock(
        vit.d_model, vit.n_heads, vit.bias, vit.mlp_ratio, vit.dropout,
        vit.layer_scale_init, vit.stochastic_depth, vit.norm_eps, dtype=vit.dtype,
    )
    out = pipeline_apply(
        make_stage_fn(block, train=train, remat=remat), stacked, out,
        mesh=mesh, axis=axis, batch_axis=batch_axis,
        num_microbatches=num_microbatches, interleave=interleave,
    )
    if is_deit:
        return _DeiTEpilogue(vit.norm_eps, vit.dtype).apply({"params": rest}, out)
    epilogue = _ViTEpilogue(
        vit.d_model, vit.n_heads, vit.bias, vit.mlp_ratio, vit.norm_eps,
        vit.pool_type, vit.dtype,
    )
    return epilogue.apply({"params": rest}, out, train=train)


class _DeiTPrologue(nn.Module):
    """Patch embed + PE (before concat) + cls/dist tokens — the pre-pipeline
    part of DeiT.__call__ (models/deit.py:23-35), SAME param names."""

    d_model: int
    patch_size: int
    img_size: int
    dtype: Any

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..nn.initializers import torch_default_bias, torch_default_kernel

        p = self.patch_size
        h = nn.Conv(
            self.d_model, (p, p), strides=(p, p), padding="VALID",
            kernel_init=torch_default_kernel, bias_init=torch_default_bias(3 * p * p),
            dtype=self.dtype, name="patch_embed",
        )(x)
        h = h.reshape(h.shape[0], -1, self.d_model)
        n_tokens = (self.img_size // self.patch_size) ** 2
        pe = self.param("pe", nn.initializers.normal(0.02), (1, n_tokens, self.d_model))
        h = h + pe.astype(h.dtype)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.d_model))
        dist = self.param("dist_token", nn.initializers.zeros, (1, 1, self.d_model))
        B = h.shape[0]
        return jnp.concatenate(
            [
                jnp.broadcast_to(cls, (B, 1, self.d_model)).astype(h.dtype),
                jnp.broadcast_to(dist, (B, 1, self.d_model)).astype(h.dtype),
                h,
            ],
            axis=1,
        )


class _DeiTEpilogue(nn.Module):
    """Final norm + (cls, dist) mean pool (models/deit.py:37-38)."""

    norm_eps: float
    dtype: Any

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        norm = nn.LayerNorm(self.norm_eps, dtype=self.dtype, name="norm")
        return norm(tokens[:, :2]).mean(axis=1)


class _CaiTEpilogue(nn.Module):
    """cls token + class-attention blocks + final norm — the post-pipeline
    part of CaiT.__call__ (models/cait.py:143-150), SAME param names. The
    CA stage is 2 tiny blocks over one cls token; it runs replicated."""

    d_model: int
    n_heads: int
    ca_depth: int
    bias: bool
    mlp_ratio: float
    dropout: float
    layer_scale_init: float | None
    stochastic_depth: float
    norm_eps: float
    dtype: Any

    @nn.compact
    def __call__(self, patches: jax.Array, train: bool = False) -> jax.Array:
        from ..models.cait import CaiTCABlock

        B = patches.shape[0]
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.d_model))
        cls = jnp.broadcast_to(cls, (B, 1, self.d_model)).astype(patches.dtype)
        for i in range(self.ca_depth):
            cls = CaiTCABlock(
                self.d_model, self.n_heads, bias=self.bias, mlp_ratio=self.mlp_ratio,
                dropout=self.dropout, layer_scale_init=self.layer_scale_init,
                stochastic_depth=self.stochastic_depth, norm_eps=self.norm_eps,
                dtype=self.dtype, name=f"ca_block_{i}",
            )(patches, cls, train=train)
        return nn.LayerNorm(self.norm_eps, dtype=self.dtype, name="norm")(cls[:, 0])


def cait_pipeline_forward(
    cait: nn.Module,
    variables: dict,
    x: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "pipe",
    batch_axis: str | None = None,
    num_microbatches: int | None = None,
    train: bool = False,
    remat: bool = False,
    interleave: int = 1,
) -> jax.Array:
    """CaiT forward with the homogeneous self-attention stack (``sa_block_i``,
    the bulk of the depth — e.g. 24 of 26 blocks) pipelined over
    ``mesh[axis]``; patch embed and the 2-block class-attention stage run
    replicated. CaiT's prologue is exactly ViT's cls-free embed (same
    modules/names, models/cait.py:115-125)."""
    stacked, rest = stack_block_params(variables["params"], prefix="sa_block_")
    stacked = interleave_block_params(stacked, mesh.shape[axis], interleave)
    return cait_pipeline_forward_stacked(
        cait, stacked, rest, x, mesh=mesh, axis=axis, batch_axis=batch_axis,
        num_microbatches=num_microbatches, train=train, remat=remat,
        interleave=interleave,
    )


def cait_pipeline_forward_stacked(
    cait: nn.Module,
    stacked: Any,
    rest: dict,
    x: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "pipe",
    batch_axis: str | None = None,
    num_microbatches: int | None = None,
    train: bool = False,
    remat: bool = False,
    interleave: int = 1,
) -> jax.Array:
    """:func:`cait_pipeline_forward` on a pre-stacked ``sa_block_`` state."""
    from ..models.cait import CaiT, TalkingHeadAttention
    from ..nn.attention import ViTBlock

    assert type(cait) is CaiT, type(cait).__name__
    out = _ViTPrologue(
        cait.d_model, cait.patch_size, cait.img_size, False, cait.dtype
    ).apply({"params": rest}, x)
    block = ViTBlock(
        cait.d_model, cait.n_heads, cait.bias, cait.mlp_ratio, cait.dropout,
        cait.layer_scale_init, cait.stochastic_depth, cait.norm_eps,
        attention=lambda name: TalkingHeadAttention(
            cait.d_model, cait.n_heads, cait.bias, cait.dropout,
            dtype=cait.dtype, name=name,
        ),
        dtype=cait.dtype,
    )
    out = pipeline_apply(
        make_stage_fn(block, train=train, remat=remat), stacked, out,
        mesh=mesh, axis=axis, batch_axis=batch_axis,
        num_microbatches=num_microbatches, interleave=interleave,
    )
    epilogue = _CaiTEpilogue(
        cait.d_model, cait.n_heads, cait.ca_depth, cait.bias, cait.mlp_ratio,
        cait.dropout, cait.layer_scale_init, cait.stochastic_depth,
        cait.norm_eps, cait.dtype,
    )
    return epilogue.apply({"params": rest}, out, train=train)


class _MixerPrologue(nn.Module):
    """Patch embed — the pre-pipeline part of MLPMixer.__call__
    (models/mlp_mixer.py:66-73), applied against the SAME param names."""

    d_model: int
    patch_size: int
    dtype: Any

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..nn.initializers import torch_default_bias, torch_default_kernel

        p = self.patch_size
        x = nn.Conv(
            self.d_model, (p, p), strides=(p, p), padding="VALID",
            kernel_init=torch_default_kernel, bias_init=torch_default_bias(3 * p * p),
            dtype=self.dtype, name="patch_embed",
        )(x)
        return x.reshape(x.shape[0], -1, self.d_model)


class _MixerEpilogue(nn.Module):
    """Final norm + GAP (models/mlp_mixer.py:80-81)."""

    norm_eps: float
    dtype: Any

    @nn.compact
    def __call__(self, out: jax.Array) -> jax.Array:
        return nn.LayerNorm(self.norm_eps, dtype=self.dtype, name="norm")(out).mean(axis=1)


def mixer_pipeline_forward(
    mixer: nn.Module,
    variables: dict,
    x: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "pipe",
    batch_axis: str | None = None,
    num_microbatches: int | None = None,
    train: bool = False,
    remat: bool = False,
    interleave: int = 1,
) -> jax.Array:
    """MLP-Mixer forward with the block stack pipelined over ``mesh[axis]``
    — same shape as :func:`vit_pipeline_forward` (MixerBlocks follow the
    same ``block_i`` naming, so the generic stack/stage machinery applies)."""
    stacked, rest = stack_block_params(variables["params"])
    stacked = interleave_block_params(stacked, mesh.shape[axis], interleave)
    return mixer_pipeline_forward_stacked(
        mixer, stacked, rest, x, mesh=mesh, axis=axis, batch_axis=batch_axis,
        num_microbatches=num_microbatches, train=train, remat=remat,
        interleave=interleave,
    )


def mixer_pipeline_forward_stacked(
    mixer: nn.Module,
    stacked: Any,
    rest: dict,
    x: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "pipe",
    batch_axis: str | None = None,
    num_microbatches: int | None = None,
    train: bool = False,
    remat: bool = False,
    interleave: int = 1,
) -> jax.Array:
    """:func:`mixer_pipeline_forward` on a pre-stacked ``block_`` state."""
    from ..models.mlp_mixer import MixerBlock, MLPMixer

    assert type(mixer) is MLPMixer, type(mixer).__name__
    out = _MixerPrologue(mixer.d_model, mixer.patch_size, mixer.dtype).apply(
        {"params": rest}, x
    )
    n_tokens = (mixer.img_size // mixer.patch_size) ** 2
    block = MixerBlock(
        n_tokens, mixer.d_model, mixer.mlp_ratio, mixer.dropout, mixer.norm_eps,
        dtype=mixer.dtype,
    )
    out = pipeline_apply(
        make_stage_fn(block, train=train, remat=remat), stacked, out,
        mesh=mesh, axis=axis, batch_axis=batch_axis,
        num_microbatches=num_microbatches, interleave=interleave,
    )
    return _MixerEpilogue(mixer.norm_eps, mixer.dtype).apply({"params": rest}, out)


def pipeline_param_sharding(stacked: Any, mesh: Mesh, axis: str = "pipe"):
    """NamedShardings placing the stacked layer axis on the pipe axis."""
    from jax.sharding import NamedSharding

    return jax.tree.map(lambda _: NamedSharding(mesh, P(axis)), stacked)


# --------------------------------------------- trainer-level pipeline support


def pipeline_block_prefix(model: nn.Module) -> str:
    """The per-block param-name prefix of ``model``'s pipelinable stack."""
    from ..models.cait import CaiT

    return "sa_block_" if type(model) is CaiT else "block_"


def pipeline_forward_stacked(
    model: nn.Module,
    stacked: Any,
    rest: dict,
    x: jax.Array,
    **kw,
) -> jax.Array:
    """Dispatch to the family-specific pipelined forward (pre-stacked state).

    Covers every stacked-transformer family: ViT/DeiT/DeiT3 (ViT class),
    DeiT (dist-token subclass), CaiT (``sa_block_`` stack), MLP-Mixer.
    Unknown subclasses fail loudly inside the family forwards."""
    from ..models.cait import CaiT
    from ..models.mlp_mixer import MLPMixer

    if type(model) is CaiT:
        return cait_pipeline_forward_stacked(model, stacked, rest, x, **kw)
    if type(model) is MLPMixer:
        return mixer_pipeline_forward_stacked(model, stacked, rest, x, **kw)
    return vit_pipeline_forward_stacked(model, stacked, rest, x, **kw)


def classifier_params_to_pipeline(
    params: dict, prefix: str = "block_", stages: int = 1, interleave: int = 1
) -> dict:
    """ImageClassifier param tree (checkpoint layout) → pipeline layout.

    ``{"backbone": {..., block_i...}, "head": ...}`` becomes
    ``{"backbone": rest, "backbone_stacked": (L, ...) leaves, "head": ...}``.
    The stacked subtree is the only part whose placement differs (``P(pipe)``);
    leaf/module names inside each block are preserved, so the optimizer's
    3-group weight-decay classification (train/optim.py param_group) and the
    checkpoint converters keep working after :func:`classifier_params_from_pipeline`.
    """
    stacked, rest = stack_block_params(params["backbone"], prefix)
    if interleave > 1:
        stacked = interleave_block_params(stacked, stages, interleave)
    out = {k: v for k, v in params.items() if k != "backbone"}
    out["backbone"] = rest
    out["backbone_stacked"] = stacked
    return out


def classifier_params_from_pipeline(
    params: dict, prefix: str = "block_", stages: int = 1, interleave: int = 1
) -> dict:
    """Inverse of :func:`classifier_params_to_pipeline` — back to the
    standard checkpoint layout that loads into the sequential model."""
    stacked = params["backbone_stacked"]
    if interleave > 1:
        stacked = uninterleave_block_params(stacked, stages, interleave)
    out = {k: v for k, v in params.items() if k != "backbone_stacked"}
    out["backbone"] = unstack_block_params(stacked, params["backbone"], prefix)
    return out


def make_classifier_pipeline_apply(
    classifier: nn.Module,
    mesh: Mesh,
    *,
    axis: str = "pipe",
    batch_axis: str | None = "data",
    num_microbatches: int | None = None,
    remat: bool = False,
    interleave: int = 1,
) -> Callable:
    """Drop-in ``apply_fn`` for ``ImageClassifier.apply`` on the pipeline
    param layout (see :func:`classifier_params_to_pipeline`).

    Signature-compatible with what train/step.py's train/eval steps call:
    ``apply_fn(variables, x, train=..., mutable=[...], rngs=...)``. The
    pipelined families are all LayerNorm models (no batch_stats) and the
    stage fn carries no rng streams, so ``mutable`` returns an empty tree and
    ``rngs`` is ignored — the trainer enforces dropout/drop-path == 0."""

    def apply_fn(variables, x, train=False, mutable=None, rngs=None):
        from ..nn.layers import Linear

        p = variables["params"]
        feats = pipeline_forward_stacked(
            classifier.backbone, p["backbone_stacked"], p["backbone"], x,
            mesh=mesh, axis=axis, batch_axis=batch_axis,
            num_microbatches=num_microbatches, train=train, remat=remat,
            interleave=interleave,
        )
        head = Linear(classifier.num_classes, dtype=classifier.dtype, name="head")
        logits = head.apply({"params": p["head"]}, feats).astype(jnp.float32)
        return (logits, {}) if mutable else logits

    return apply_fn


def pipeline_state_shardings(state: Any, mesh: Mesh, axis: str = "pipe"):
    """Sharding tree for a pipeline TrainState: every leaf whose tree path
    passes through ``backbone_stacked`` (params AND the optimizer's
    momentum/trace mirrors of them) goes ``P(axis)``; everything else is
    replicated. Feed to ``jax.device_put(state, ...)`` to commit."""
    from jax.sharding import NamedSharding

    repl = NamedSharding(mesh, P())
    pipe = NamedSharding(mesh, P(axis))

    def sh(path, _leaf):
        keys = tuple(str(getattr(k, "key", k)) for k in path)
        return pipe if "backbone_stacked" in keys else repl

    return jax.tree_util.tree_map_with_path(sh, state)
