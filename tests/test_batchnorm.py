"""Custom BatchNorm parity vs torch: train-mode normalization, running-stat
updates (unbiased var, torch momentum), inference transform, and GSPMD
global-batch stats (covered further in test_train_step.py)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from vision_toolbox_tpu.nn.norm import BatchNorm


def _setup(c=6, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((4, 5, 5, c), dtype=np.float32) * 2 + 1
    scale = rng.standard_normal(c, dtype=np.float32)
    bias = rng.standard_normal(c, dtype=np.float32)
    mean = rng.standard_normal(c, dtype=np.float32)
    var = rng.random(c, dtype=np.float32) + 0.5
    return x, scale, bias, mean, var


def _torch_bn(x, scale, bias, mean, var, training):
    bn = torch.nn.BatchNorm2d(x.shape[-1], eps=1e-5, momentum=0.1)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(scale))
        bn.bias.copy_(torch.from_numpy(bias))
        bn.running_mean.copy_(torch.from_numpy(mean))
        bn.running_var.copy_(torch.from_numpy(var))
    bn.train(training)
    out = bn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    return (
        out.detach().numpy().transpose(0, 2, 3, 1),
        bn.running_mean.detach().numpy(),
        bn.running_var.detach().numpy(),
    )


def _ours(x, scale, bias, mean, var, training):
    bn = BatchNorm(use_running_average=not training, momentum=0.9, epsilon=1e-5)
    variables = {
        "params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)},
    }
    if training:
        out, mut = bn.apply(variables, jnp.asarray(x), mutable=["batch_stats"])
        return np.asarray(out), np.asarray(mut["batch_stats"]["mean"]), np.asarray(mut["batch_stats"]["var"])
    out = bn.apply(variables, jnp.asarray(x))
    return np.asarray(out), mean, var


def test_train_mode_parity():
    args = _setup()
    ref_out, ref_mean, ref_var = _torch_bn(*args, training=True)
    out, new_mean, new_var = _ours(*args, training=True)
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(new_mean, ref_mean, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(new_var, ref_var, rtol=1e-5, atol=1e-6)  # unbiased update


def test_eval_mode_parity():
    args = _setup(seed=1)
    ref_out, _, _ = _torch_bn(*args, training=False)
    out, _, _ = _ours(*args, training=False)
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=1e-5)


def test_bf16_compute_keeps_f32_stats():
    x, scale, bias, mean, var = _setup(seed=2)
    bn = BatchNorm(use_running_average=False, dtype=jnp.bfloat16)
    variables = {
        "params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)},
    }
    out, mut = bn.apply(variables, jnp.asarray(x, jnp.bfloat16), mutable=["batch_stats"])
    assert out.dtype == jnp.bfloat16
    assert mut["batch_stats"]["mean"].dtype == jnp.float32
    # stats still close to the f32 reference
    _, ref_mean, ref_var = _torch_bn(x, scale, bias, mean, var, training=True)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]), ref_mean, rtol=2e-2, atol=2e-2)
