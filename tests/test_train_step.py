"""Sharded train-step tests on the 8-device virtual CPU mesh — the
multi-device story the reference never tests (SURVEY.md §4c)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_toolbox_tpu import create_backbone
from vision_toolbox_tpu.parallel import create_mesh, shard_batch
from vision_toolbox_tpu.train import (
    ImageClassifier,
    TrainState,
    make_eval_step,
    make_train_step,
    sgd_with_param_groups,
    shard_train_step,
    warmup_cosine_schedule,
)
from vision_toolbox_tpu.train.optim import param_group


NUM_CLASSES = 10


@pytest.fixture(scope="module")
def setup():
    model = ImageClassifier(backbone=create_backbone("darknet19"), num_classes=NUM_CLASSES)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng}, jnp.zeros((1, 32, 32, 3)), train=False)
    schedule = warmup_cosine_schedule(0.5, total_epochs=10, steps_per_epoch=5)
    tx = sgd_with_param_groups(variables["params"], schedule, momentum=0.9, weight_decay=2e-5)
    state = TrainState.create(model.apply, variables, tx)
    return model, state


def _copy_state(state):
    # the sharded step donates its input state; give each test its own buffers
    return jax.tree_util.tree_map(jnp.copy, state)


def test_multi_device_train_step(setup):
    _, state = setup
    state = _copy_state(state)
    assert len(jax.devices()) == 8
    mesh = create_mesh(("data",))
    step = shard_train_step(make_train_step(NUM_CLASSES), mesh)

    rng = jax.random.PRNGKey(1)
    images = jax.random.uniform(rng, (16, 32, 32, 3))
    labels = jax.random.randint(rng, (16,), 0, NUM_CLASSES)
    images, labels = shard_batch((images, labels), mesh)

    old_params = jax.tree_util.tree_map(lambda x: x.copy(), state.params)
    state2, metrics = step(state, images, labels, jax.random.PRNGKey(2))
    loss = float(metrics["loss"])
    assert np.isfinite(loss) and loss > 0
    assert int(state2.step) == 1

    # params actually moved
    deltas = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()), old_params, state2.params)
    assert max(jax.tree_util.tree_leaves(deltas)) > 0

    # second step with donated state works
    state3, metrics2 = step(state2, images, labels, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics2["loss"]))
    assert int(state3.step) == 2


def test_sharded_step_equals_single_device(setup):
    """The 8-way sharded step must produce the SAME updated parameters as an
    unsharded single-device step on the identical global batch + rng —
    data-parallelism is an implementation detail, not a semantics change."""
    _, state0 = setup
    images = jax.random.uniform(jax.random.PRNGKey(7), (16, 32, 32, 3))
    labels = jax.random.randint(jax.random.PRNGKey(8), (16,), 0, NUM_CLASSES)
    rng = jax.random.PRNGKey(9)
    train_step = make_train_step(NUM_CLASSES)

    mesh = create_mesh(("data",))
    sharded = shard_train_step(train_step, mesh)
    s_img, s_lab = shard_batch((images, labels), mesh)
    state_a, metrics_a = sharded(_copy_state(state0), s_img, s_lab, rng)

    single = jax.jit(train_step)
    state_b, metrics_b = single(_copy_state(state0), images, labels, rng)

    np.testing.assert_allclose(float(metrics_a["loss"]), float(metrics_b["loss"]), rtol=1e-5)
    flat_a = jax.tree_util.tree_leaves(state_a.params)
    flat_b = jax.tree_util.tree_leaves(state_b.params)
    # differences are reduction-order float noise through the backward
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_a.batch_stats),
        jax.tree_util.tree_leaves(state_b.batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_train_step_with_stochastic_depth():
    """rng threading through drop-path + LayerScale models (deit3) under the
    sharded step."""
    model = ImageClassifier(
        backbone=create_backbone("deit3_ti_16", img_size=32, stochastic_depth=0.2),
        num_classes=NUM_CLASSES,
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 32, 3)), train=False)
    tx = sgd_with_param_groups(variables["params"], 0.01, momentum=0.9)
    state = TrainState.create(model.apply, variables, tx)
    mesh = create_mesh(("data",))
    step = shard_train_step(make_train_step(NUM_CLASSES), mesh)
    images = jax.random.uniform(jax.random.PRNGKey(1), (16, 32, 32, 3))
    labels = jax.random.randint(jax.random.PRNGKey(2), (16,), 0, NUM_CLASSES)
    images, labels = shard_batch((images, labels), mesh)
    state, metrics = step(state, images, labels, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))


def test_tensor_parallel_head():
    """dp×tp mesh: the classifier head kernel shards over the model axis and
    stays sharded through a full train step (GSPMD propagates committed
    shardings)."""
    from jax.sharding import PartitionSpec as P

    from vision_toolbox_tpu.parallel.sharding import shard_train_state

    num_classes = 16
    model = ImageClassifier(backbone=create_backbone("darknet19"), num_classes=num_classes)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 32, 3)), train=False)
    tx = sgd_with_param_groups(variables["params"], 0.01, momentum=0.9, weight_decay=2e-5)
    state = TrainState.create(model.apply, variables, tx)

    mesh = create_mesh(("data", "model"), (4, 2))
    state = shard_train_state(state, mesh, min_size=1024)
    spec = state.params["head"]["kernel"].sharding.spec
    assert spec == P(None, "model"), spec
    # conv kernels (4-D) stay replicated
    assert state.params["backbone"]["stem"]["conv"]["kernel"].sharding.spec == P()

    step = shard_train_step(make_train_step(num_classes), mesh)
    images = jax.random.uniform(jax.random.PRNGKey(1), (16, 32, 32, 3))
    labels = jax.random.randint(jax.random.PRNGKey(2), (16,), 0, num_classes)
    images, labels = shard_batch((images, labels), mesh)
    state2, metrics = step(state, images, labels, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    # sharding survived the step (params and momentum)
    assert state2.params["head"]["kernel"].sharding.spec == P(None, "model")


def test_fsdp_sharding():
    """ZeRO-3-style: params live sharded over the data axis; the train step
    still produces finite loss and keeps params sharded."""
    from jax.sharding import PartitionSpec as P

    from vision_toolbox_tpu.parallel.sharding import shard_train_state

    model = ImageClassifier(backbone=create_backbone("darknet19"), num_classes=NUM_CLASSES)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 32, 3)), train=False)
    tx = sgd_with_param_groups(variables["params"], 0.01, momentum=0.9)
    state = TrainState.create(model.apply, variables, tx)
    mesh = create_mesh(("data",))
    state = shard_train_state(state, mesh, fsdp=True, min_size=4096)

    # a large conv kernel is sharded along a divisible dim
    k = state.params["backbone"]["stage_4"]["block_0"]["conv2"]["conv"]["kernel"]
    assert "data" in tuple(k.sharding.spec), k.sharding.spec

    step = shard_train_step(make_train_step(NUM_CLASSES, mixup_alpha=0, cutmix_alpha=0), mesh)
    images = jax.random.uniform(jax.random.PRNGKey(1), (16, 32, 32, 3))
    labels = jax.random.randint(jax.random.PRNGKey(2), (16,), 0, NUM_CLASSES)
    images, labels = shard_batch((images, labels), mesh)
    state2, metrics = step(state, images, labels, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    k2 = state2.params["backbone"]["stage_4"]["block_0"]["conv2"]["conv"]["kernel"]
    assert k2.sharding.spec == k.sharding.spec


def test_opt_state_sharding_by_tree_path():
    """Two same-shaped params with DIFFERENT specs: each momentum buffer must
    get its own param's spec (path-matched), not the first shape-match."""
    from jax.sharding import PartitionSpec as P

    from vision_toolbox_tpu.parallel.sharding import shard_train_state

    params = {
        "a": {"kernel": jnp.ones((8, 8))},
        "b": {"kernel": jnp.ones((8, 8))},
    }
    tx = __import__("optax").sgd(0.1, momentum=0.9)
    state = TrainState.create(lambda v, x: x, {"params": params}, tx)
    mesh = create_mesh(("data", "model"), (4, 2))

    def rule(path, v):
        names = [k.key for k in path if hasattr(k, "key")]
        return P(None, "model") if "a" in names else P()

    state = shard_train_state(state, mesh, rule_fn=rule)
    assert state.params["a"]["kernel"].sharding.spec == P(None, "model")
    assert state.params["b"]["kernel"].sharding.spec == P()
    trace = jax.tree_util.tree_leaves(
        state.opt_state, is_leaf=lambda x: isinstance(x, dict)
    )
    mu = [t for t in trace if isinstance(t, dict) and "a" in t][0]
    assert mu["a"]["kernel"].sharding.spec == P(None, "model")
    assert mu["b"]["kernel"].sharding.spec == P()


def test_eval_step(setup):
    _, state = setup
    eval_step = jax.jit(make_eval_step())
    images = jax.random.uniform(jax.random.PRNGKey(3), (8, 32, 32, 3))
    labels = jax.random.randint(jax.random.PRNGKey(4), (8,), 0, NUM_CLASSES)
    m = eval_step(state, images, labels)
    assert np.isfinite(float(m["loss"]))
    assert 0.0 <= float(m["acc"]) <= 1.0


def test_param_groups(setup):
    _, state = setup
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    groups = {}
    for path, _ in flat:
        keys = tuple(getattr(k, "key", str(k)) for k in path)
        groups.setdefault(param_group(keys), []).append(keys)
    # BN scale+bias are norm; conv kernels are other; head bias is bias
    assert any(k[-1] == "scale" for k in groups["norm"])
    assert all(k[-1] in ("scale", "bias") for k in groups["norm"])
    assert any(k[-1] == "kernel" for k in groups["other"])
    assert any(k[-1] == "bias" for k in groups.get("bias", []))


def test_schedule_matches_reference_shape():
    # epoch-stepped: factor 0.01 -> 1 over 5 epochs, then cosine to 0 (classifier.py:171-192)
    sched = warmup_cosine_schedule(0.5, total_epochs=100, steps_per_epoch=10, warmup_epochs=5, warmup_factor=0.01)
    np.testing.assert_allclose(float(sched(0)), 0.5 * 0.01, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10)), 0.5 * (0.01 + 0.99 / 5), rtol=1e-6)
    np.testing.assert_allclose(float(sched(50)), 0.5, rtol=1e-6)  # warmup done
    np.testing.assert_allclose(
        float(sched(55 * 10)), 0.5 * 0.5 * (1 + np.cos(np.pi * 50 / 95)), rtol=1e-6
    )
    assert float(sched(999)) < 1e-3  # end of cosine ~ 0


def test_bn_stats_sync_over_mesh(setup):
    """Batch stats after a sharded step must equal the global-batch stats —
    i.e. GSPMD gives us sync-BN semantics (configs/base.yaml:22) for free."""
    model, state = setup
    state = _copy_state(state)
    mesh = create_mesh(("data",))
    step = shard_train_step(
        make_train_step(NUM_CLASSES, mixup_alpha=0, cutmix_alpha=0), mesh
    )
    images = jax.random.normal(jax.random.PRNGKey(5), (16, 32, 32, 3))
    labels = jax.random.randint(jax.random.PRNGKey(6), (16,), 0, NUM_CLASSES)
    sharded = shard_batch((images, labels), mesh)
    state_sharded, _ = step(_copy_state(state), *sharded, jax.random.PRNGKey(7))

    # same step unsharded (single device semantics, global batch)
    step_local = jax.jit(make_train_step(NUM_CLASSES, mixup_alpha=0, cutmix_alpha=0))
    state_local, _ = step_local(_copy_state(state), images, labels, jax.random.PRNGKey(7))

    a = jax.tree_util.tree_leaves(state_sharded.batch_stats)
    b = jax.tree_util.tree_leaves(state_local.batch_stats)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=2e-4, atol=1e-5)
