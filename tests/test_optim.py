"""Optimizer parity vs torch (SGD momentum + weight-decay-before-momentum,
RMSprop) and smoke coverage for the other optimizers."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vision_toolbox_tpu.train.optim import make_optimizer


def _run_ours(name, params0, grads_seq, lr=0.1, momentum=0.9, wd=0.01, **kw):
    params = {"w": {"kernel": jnp.asarray(params0)}}
    tx = make_optimizer(name, params, lr, momentum=momentum, weight_decay=wd, **kw)
    state = tx.init(params)
    for g in grads_seq:
        grads = {"w": {"kernel": jnp.asarray(g)}}
        updates, state = tx.update(grads, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    return np.asarray(params["w"]["kernel"])


def _run_torch(opt_cls, params0, grads_seq, **kw):
    p = torch.nn.Parameter(torch.from_numpy(params0.copy()))
    opt = opt_cls([p], **kw)
    for g in grads_seq:
        opt.zero_grad()
        p.grad = torch.from_numpy(g.copy())
        opt.step()
    return p.detach().numpy()


@pytest.fixture()
def data():
    rng = np.random.default_rng(0)
    params0 = rng.standard_normal((4, 3), dtype=np.float32)
    grads = [rng.standard_normal((4, 3), dtype=np.float32) for _ in range(5)]
    return params0, grads


def test_sgd_matches_torch(data):
    params0, grads = data
    ours = _run_ours("sgd", params0, grads, lr=0.1, momentum=0.9, wd=0.01)
    ref = _run_torch(torch.optim.SGD, params0, grads, lr=0.1, momentum=0.9, weight_decay=0.01)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_sgd_nesterov_matches_torch(data):
    params0, grads = data
    ours = _run_ours("sgd", params0, grads, lr=0.1, momentum=0.9, wd=0.0, nesterov=True)
    ref = _run_torch(torch.optim.SGD, params0, grads, lr=0.1, momentum=0.9, nesterov=True)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_rmsprop_matches_torch(data):
    params0, grads = data
    ours = _run_ours("rmsprop", params0, grads, lr=0.01, momentum=0.9, wd=0.01)
    ref = _run_torch(
        torch.optim.RMSprop, params0, grads,
        lr=0.01, momentum=0.9, weight_decay=0.01, alpha=0.99, eps=1e-8,
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name", ["adamw", "lamb", "lars"])
def test_other_optimizers_step(name, data):
    params0, grads = data
    out = _run_ours(name, params0, grads, lr=0.01)
    assert np.all(np.isfinite(out))
    assert not np.allclose(out, params0)


def test_norm_params_skip_decay():
    params = {"norm": {"scale": jnp.ones(4)}, "w": {"kernel": jnp.ones((4, 4))}}
    tx = make_optimizer("sgd", params, 0.1, momentum=0.0, weight_decay=0.5)
    state = tx.init(params)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(zeros, state, params)
    # kernel decays, norm scale doesn't
    assert float(jnp.abs(updates["w"]["kernel"]).max()) > 0
    assert float(jnp.abs(updates["norm"]["scale"]).max()) == 0


def test_grad_accum_matches_mean_gradient():
    """optax.MultiSteps composed with the masked per-group decay chain: two
    accumulated micro-steps must equal one step on the mean gradient."""
    import optax

    from vision_toolbox_tpu.train.optim import make_optimizer

    params = {
        "conv": {"kernel": jnp.ones((3, 3)), "bias": jnp.zeros((3,))},
        "norm": {"scale": jnp.ones((3,)), "bias": jnp.zeros((3,))},
    }
    rng = np.random.default_rng(0)
    g1 = jax.tree_util.tree_map(lambda p: jnp.asarray(rng.standard_normal(p.shape), jnp.float32), params)
    g2 = jax.tree_util.tree_map(lambda p: jnp.asarray(rng.standard_normal(p.shape), jnp.float32), params)

    tx = make_optimizer("sgd", params, 0.1, momentum=0.9, weight_decay=1e-2)
    ref_state = tx.init(params)
    mean_g = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, g1, g2)
    ref_updates, _ = tx.update(mean_g, ref_state, params)
    ref_params = optax.apply_updates(params, ref_updates)

    tx2 = make_optimizer("sgd", params, 0.1, momentum=0.9, weight_decay=1e-2)
    mtx = optax.MultiSteps(tx2, every_k_schedule=2).gradient_transformation()
    state = mtx.init(params)
    p = params
    for g in (g1, g2):
        updates, state = mtx.update(g, state, p)
        p = optax.apply_updates(p, updates)

    for a, b in zip(jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
