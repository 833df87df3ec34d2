"""Pipeline parallelism (parallel/pipeline.py) on the virtual 8-device mesh.

The GPipe schedule must be a pure re-scheduling: outputs and gradients match
the sequential layer stack up to f32 accumulation-order noise (the f64
cross-check during development measured 2e-11 worst-case relative grad
difference — the remaining f32 deltas are ordering, not schedule, effects).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_toolbox_tpu import create_backbone
from vision_toolbox_tpu.parallel import create_mesh
from vision_toolbox_tpu.parallel.pipeline import (
    pipeline_apply,
    pipeline_param_sharding,
    stack_block_params,
    unstack_block_params,
    vit_pipeline_forward,
    vit_pipeline_forward_stacked,
)


# ------------------------------------------------------- generic pipeline op


def _toy_stack(L=8, D=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 2)
    return {
        "w": jax.random.normal(ks[0], (L, D, D)) * D**-0.5,
        "b": 0.1 * jax.random.normal(ks[1], (L, D)),
    }


def _toy_stage_fn(params, x):
    def body(h, p):
        return jnp.tanh(h @ p["w"] + p["b"]), None

    y, _ = jax.lax.scan(body, x, params)
    return y


def _toy_sequential(stacked, x):
    return _toy_stage_fn(stacked, x)


@pytest.mark.parametrize(
    "mesh_axes,mesh_shape,batch_axis,M",
    [
        (("pipe",), (8,), None, 8),  # pure pp, M == S
        (("pipe",), (4,), None, 12),  # M > S (bubble amortization)
        (("data", "pipe"), (2, 4), "data", 6),  # dp × pp
        (("pipe",), (1,), None, 4),  # degenerate S=1 falls back to scan
    ],
)
def test_pipeline_apply_matches_sequential(mesh_axes, mesh_shape, batch_axis, M):
    n = int(np.prod(mesh_shape))
    mesh = create_mesh(mesh_axes, mesh_shape, devices=jax.devices()[:n])
    stacked = _toy_stack(L=8, D=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (24, 16))
    want = _toy_sequential(stacked, x)
    got = jax.jit(
        lambda p, x: pipeline_apply(
            _toy_stage_fn, p, x, mesh=mesh, batch_axis=batch_axis, num_microbatches=M
        )
    )(stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_pipeline_apply_grads_match_sequential():
    mesh = create_mesh(("pipe",), (4,), devices=jax.devices()[:4])
    stacked = _toy_stack(L=8, D=16, seed=2)
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 16))
    w = jnp.cos(jnp.arange(16))

    def loss(fn):
        return lambda p, x: jnp.sum(fn(p, x) * w)

    pp = lambda p, x: pipeline_apply(_toy_stage_fn, p, x, mesh=mesh, num_microbatches=4)
    gp = jax.jit(jax.grad(loss(pp), argnums=(0, 1)))(stacked, x)
    gs = jax.jit(jax.grad(loss(_toy_sequential), argnums=(0, 1)))(stacked, x)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_pipeline_bubble_skip_equivalence():
    """skip_bubbles is a pure FLOP saver: identical values and grads to the
    compute-everything schedule, and the compiled program really carries the
    per-device conditional around the stage body."""
    mesh = create_mesh(("pipe",), (4,), devices=jax.devices()[:4])
    stacked = _toy_stack(L=8, D=16, seed=4)
    x = jax.random.normal(jax.random.PRNGKey(5), (12, 16))
    w = jnp.sin(jnp.arange(16))

    def loss(skip):
        def f(p, x):
            y = pipeline_apply(
                _toy_stage_fn, p, x, mesh=mesh, num_microbatches=6,
                skip_bubbles=skip,
            )
            return jnp.sum(y * w)

        return f

    la, ga = jax.jit(jax.value_and_grad(loss(True)))(stacked, x)
    lb, gb = jax.jit(jax.value_and_grad(loss(False)))(stacked, x)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    txt = (
        jax.jit(lambda p, x: pipeline_apply(_toy_stage_fn, p, x, mesh=mesh, num_microbatches=6))
        .lower(stacked, x)
        .compile()
        .as_text()
    )
    assert "conditional" in txt, "bubble-skip did not compile to a conditional"


@pytest.mark.parametrize("S,v,M,dp", [(4, 2, 4, None), (4, 2, 2, None), (2, 4, 2, 4)])
def test_pipeline_interleaved_matches_sequential(S, v, M, dp):
    """Megatron-style interleave: device d holds chunks d, d+S, ...; outputs
    must be identical to the sequential stack (the schedule only reorders
    bit-exact chunk applications)."""
    from vision_toolbox_tpu.parallel.pipeline import interleave_block_params

    if dp:
        mesh = create_mesh(("data", "pipe"), (dp, S))
        ba = "data"
    else:
        mesh = create_mesh(("pipe",), (S,), devices=jax.devices()[:S])
        ba = None
    stacked = _toy_stack(L=8, D=16, seed=7)
    x = jax.random.normal(jax.random.PRNGKey(8), (16, 16))
    want = _toy_sequential(stacked, x)
    il = interleave_block_params(stacked, S, v)
    got = jax.jit(
        lambda p, x: pipeline_apply(
            _toy_stage_fn, p, x, mesh=mesh, batch_axis=ba,
            num_microbatches=M, interleave=v,
        )
    )(il, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pipeline_interleaved_grads_match_sequential():
    """Grads through the interleaved scan (param chunk dynamic-indexing per
    pass) must match the sequential stack after un-permuting the layer axis."""
    from vision_toolbox_tpu.parallel.pipeline import (
        interleave_block_params,
        uninterleave_block_params,
    )

    mesh = create_mesh(("pipe",), (4,), devices=jax.devices()[:4])
    stacked = _toy_stack(L=8, D=16, seed=9)
    x = jax.random.normal(jax.random.PRNGKey(10), (8, 16))
    w = jnp.cos(jnp.arange(16))
    il = interleave_block_params(stacked, 4, 2)
    gp = jax.jit(
        jax.grad(
            lambda p, x: jnp.sum(
                pipeline_apply(
                    _toy_stage_fn, p, x, mesh=mesh, num_microbatches=4, interleave=2
                )
                * w
            ),
            argnums=(0, 1),
        )
    )(il, x)
    gs = jax.jit(
        jax.grad(lambda p, x: jnp.sum(_toy_sequential(p, x) * w), argnums=(0, 1))
    )(stacked, x)
    gp = (uninterleave_block_params(gp[0], 4, 2), gp[1])
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_pipeline_interleaved_rejections():
    """M > S collides two passes on one device; depth must split into v*S
    chunks — both must fail loudly."""
    mesh = create_mesh(("pipe",), (4,), devices=jax.devices()[:4])
    stacked = _toy_stack(L=8, D=16)
    x = jnp.zeros((16, 16))
    with pytest.raises(AssertionError, match="microbatches <= stages"):
        pipeline_apply(
            _toy_stage_fn, stacked, x, mesh=mesh, num_microbatches=8, interleave=2
        )
    with pytest.raises(AssertionError, match="interleaved chunks"):
        pipeline_apply(
            _toy_stage_fn, _toy_stack(L=12), x, mesh=mesh,
            num_microbatches=4, interleave=2,  # 12 % (4*2) != 0
        )


def test_vit_pipeline_interleaved_matches_sequential():
    """ViT end-to-end through the interleaved schedule (depth 12 = 4 stages
    x 3 chunks) must reproduce the sequential model."""
    vit = create_backbone("vit_ti_16", img_size=32)
    v = vit.init_variables(0, 32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3))
    want = vit.apply(v, x)
    mesh = create_mesh(("data", "pipe"), (2, 4))
    got = jax.jit(
        lambda v, x: vit_pipeline_forward(
            vit, v, x, mesh=mesh, batch_axis="data",
            num_microbatches=4, interleave=3,
        )
    )(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_pipeline_apply_rejects_bad_divisibility():
    mesh = create_mesh(("pipe",), (4,), devices=jax.devices()[:4])
    stacked = _toy_stack(L=6, D=16)  # 6 % 4 != 0
    x = jnp.zeros((8, 16))
    with pytest.raises(AssertionError, match="not divisible by 4 pipeline"):
        pipeline_apply(_toy_stage_fn, stacked, x, mesh=mesh)

    mesh2 = create_mesh(("data", "pipe"), (2, 4))
    with pytest.raises(AssertionError, match="microbatch"):
        pipeline_apply(
            _toy_stage_fn, _toy_stack(L=8), jnp.zeros((8, 16)),
            mesh=mesh2, batch_axis="data", num_microbatches=8,
        )


# ------------------------------------------------------------- param layout


def test_stack_unstack_roundtrip():
    vit = create_backbone("vit_ti_16", img_size=32)
    params = vit.init_variables(0, 32)["params"]
    stacked, rest = stack_block_params(params)
    assert jax.tree.leaves(stacked)[0].shape[0] == 12
    assert not any(k.startswith("block_") for k in rest)
    back = unstack_block_params(stacked, rest)
    pa = jax.tree_util.tree_leaves_with_path(params)
    pb = jax.tree_util.tree_leaves_with_path(back)
    assert [k for k, _ in pa] == [k for k, _ in pb]
    for (k, a), (_, b) in zip(pa, pb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(k))


# ------------------------------------------------------------------ ViT e2e


@pytest.mark.parametrize("pool_type", ["cls_token", "gap", "mha"])
def test_vit_pipeline_forward_matches_sequential(pool_type):
    """Pins the pipeline's prologue/epilogue mirrors to ViT.__call__ across
    every pooling mode (mha = the SigLIP MAP head)."""
    vit = create_backbone("vit_ti_16", img_size=32, pool_type=pool_type,
                          cls_token=pool_type == "cls_token")
    v = vit.init_variables(0, 32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3))
    want = vit.apply(v, x)
    mesh = create_mesh(("data", "pipe"), (2, 4))
    got = jax.jit(
        lambda v, x: vit_pipeline_forward(vit, v, x, mesh=mesh, batch_axis="data")
    )(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_deit_pipeline_forward_matches_sequential():
    """DeiT (dist token, PE-before-concat, (cls,dist) mean pool) routes
    through its own prologue/epilogue mirrors."""
    deit = create_backbone("deit_s_16", img_size=32)
    v = deit.init_variables(0, 32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3))
    want = deit.apply(v, x)
    mesh = create_mesh(("pipe",), (4,), devices=jax.devices()[:4])
    got = jax.jit(
        lambda v, x: vit_pipeline_forward(deit, v, x, mesh=mesh, num_microbatches=4)
    )(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_pipeline_rejects_unknown_subclass():
    """A ViT subclass the mirrors don't cover must fail loudly instead of
    silently computing a different model."""
    from vision_toolbox_tpu.models.vit import ViT

    class Weird(ViT):
        pass

    vit = create_backbone("vit_ti_16", img_size=32)
    weird = Weird(d_model=192, depth=12, n_heads=3, patch_size=16, img_size=32)
    v = vit.init_variables(0, 32)
    mesh = create_mesh(("pipe",), (4,), devices=jax.devices()[:4])
    with pytest.raises(AssertionError, match="mirrors ViT/DeiT exactly"):
        vit_pipeline_forward(weird, v, jnp.zeros((8, 32, 32, 3)), mesh=mesh)


def test_vit_pipeline_train_step_stacked_state():
    """One SGD step on the production-shaped pipeline state: stacked blocks
    sharded P(pipe), rest + head replicated; loss finite, params move, and
    the unstacked result still loads into the sequential model."""
    mesh = create_mesh(("data", "pipe"), (2, 4))
    vit = create_backbone("vit_ti_16", img_size=32)
    v = vit.init_variables(0, 32)
    stacked, rest = stack_block_params(v["params"])
    stacked = jax.device_put(stacked, pipeline_param_sharding(stacked, mesh))
    head = {
        "kernel": jax.random.normal(jax.random.PRNGKey(5), (192, 10)) * 192**-0.5,
        "bias": jnp.zeros((10,)),
    }
    params = {"blocks": stacked, "rest": rest, "head": head}
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 32, 32, 3))
    y = jax.random.randint(jax.random.PRNGKey(2), (16,), 0, 10)

    def loss_fn(params, x, y):
        feats = vit_pipeline_forward_stacked(
            vit, params["blocks"], params["rest"], x,
            mesh=mesh, batch_axis="data", num_microbatches=8, train=True,
        )
        logits = feats @ params["head"]["kernel"] + params["head"]["bias"]
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))

    @jax.jit
    def step(params, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        new = jax.tree.map(lambda p, g: p - 0.1 * g, params, grads)
        return loss, new

    loss, new_params = step(params, x, y)
    assert np.isfinite(float(loss))
    # stacked blocks stayed pipe-sharded through the update
    spec = jax.tree.leaves(new_params["blocks"])[0].sharding.spec
    assert spec == jax.sharding.PartitionSpec("pipe")
    # blocks actually trained
    d = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), new_params["blocks"], stacked
    )
    assert max(jax.tree.leaves(d)) > 0
    # checkpoint interface: unstack loads back into the sequential model
    seq_params = unstack_block_params(new_params["blocks"], new_params["rest"])
    out = vit.apply({"params": seq_params}, x)
    assert out.shape == (16, 192)


# ------------------------------------------------- sequence parallelism (sp)


@pytest.mark.parametrize(
    "name,kw",
    [
        ("vit_ti_16", dict(cls_token=False, pool_type="gap")),  # T=4 divides
        ("vit_ti_16", dict()),  # default cls_token: T=5 → padded to 8
        ("deit_ti_16", dict()),  # cls+dist tokens: T=6 → padded to 8
    ],
)
def test_token_sharding_is_semantics_free(name, kw):
    """ViT.token_sharding only re-lays out the token axis — outputs must be
    identical (up to f32 reassociation) to the unconstrained model, and the
    param tree must not change (the hook adds no params). When T does not
    divide the seq axis, _blocks pads with masked zero tokens — still exact
    (the -1e9 key mask underflows to softmax weight 0.0)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = create_mesh(("data", "seq"), (2, 4))
    kw = dict(img_size=32, **kw)
    vit_sp = create_backbone(
        name, token_sharding=NamedSharding(mesh, P("data", "seq")), **kw
    )
    vit = create_backbone(name, **kw)
    v = vit.init_variables(0, 32)
    v_sp = vit_sp.init_variables(0, 32)
    pa = jax.tree_util.tree_leaves_with_path(v)
    pb = jax.tree_util.tree_leaves_with_path(v_sp)
    assert [k for k, _ in pa] == [k for k, _ in pb]

    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3))
    want = vit.apply(v, x)
    got = jax.jit(lambda v, x: vit_sp.apply(v, x))(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_token_sharding_cls_token_inserts_collectives():
    """The padded cls-token sp path must actually shard: the compiled forward
    has to contain an all-gather (k/v around attention), not silently decay
    to replication (the round-4 warn-and-skip failure mode)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = create_mesh(("data", "seq"), (2, 4))
    vit_sp = create_backbone(
        "vit_ti_16", img_size=32,
        token_sharding=NamedSharding(mesh, P("data", "seq")),
    )
    v = vit_sp.init_variables(0, 32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3))
    compiled = jax.jit(lambda v, x: vit_sp.apply(v, x)).lower(v, x).compile()
    hlo = compiled.as_text()
    assert "all-gather" in hlo, "sp produced no all-gather — constraint decayed"


def test_pipeline_remat_matches():
    """remat=True must be a pure memory/flops trade — same values, same grads."""
    mesh = create_mesh(("pipe",), (4,), devices=jax.devices()[:4])
    vit = create_backbone("vit_ti_16", img_size=32)
    v = vit.init_variables(0, 32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3))

    def loss(v, x, remat):
        return jnp.sum(
            vit_pipeline_forward(vit, v, x, mesh=mesh, num_microbatches=4, remat=remat) ** 2
        )

    la, ga = jax.jit(jax.value_and_grad(lambda v: loss(v, x, True)))(v)
    lb, gb = jax.jit(jax.value_and_grad(lambda v: loss(v, x, False)))(v)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_deit3_pipeline_forward_matches_sequential():
    """deit3_* builds a plain ViT with LayerScale — the stage_fn must carry
    the ls/droppath block config through the pipeline."""
    vit = create_backbone("deit3_s_16", img_size=32)
    assert type(vit).__name__ == "ViT" and vit.layer_scale_init is not None
    v = vit.init_variables(0, 32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3))
    want = vit.apply(v, x)
    mesh = create_mesh(("pipe",), (4,), devices=jax.devices()[:4])
    got = jax.jit(
        lambda v, x: vit_pipeline_forward(vit, v, x, mesh=mesh, num_microbatches=4)
    )(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_mixer_pipeline_forward_matches_sequential():
    """MixerBlocks follow the block_i convention — the generic pipeline
    machinery must reproduce the sequential MLP-Mixer exactly."""
    from vision_toolbox_tpu.models.mlp_mixer import MLPMixer
    from vision_toolbox_tpu.parallel.pipeline import mixer_pipeline_forward

    mixer = MLPMixer(n_layers=8, d_model=32, patch_size=16, img_size=32)
    v = mixer.init_variables(0, 32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3))
    want = mixer.apply(v, x)
    mesh = create_mesh(("data", "pipe"), (2, 4))
    got = jax.jit(
        lambda v, x: mixer_pipeline_forward(mixer, v, x, mesh=mesh, batch_axis="data")
    )(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_cait_pipeline_forward_matches_sequential():
    """CaiT's sa_block_ stack pipelines through the generic machinery; the
    cls-free ViT prologue and the replicated class-attention epilogue must
    reproduce the sequential model."""
    from vision_toolbox_tpu.models.cait import CaiT
    from vision_toolbox_tpu.parallel.pipeline import cait_pipeline_forward

    cait = CaiT(d_model=32, sa_depth=8, ca_depth=2, n_heads=2,
                patch_size=16, img_size=32)
    v = cait.init_variables(0, 32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3))
    want = cait.apply(v, x)
    mesh = create_mesh(("data", "pipe"), (2, 4))
    got = jax.jit(
        lambda v, x: cait_pipeline_forward(cait, v, x, mesh=mesh, batch_axis="data")
    )(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)
