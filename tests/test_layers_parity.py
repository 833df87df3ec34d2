"""Numerical parity of core primitives vs PyTorch CPU (the reference's
substrate). Verifies the porting hazards called out in SURVEY.md §7:
explicit ceil((k-s)/2) padding vs XLA SAME, -inf maxpool padding,
exact-erf GELU, hard-sigmoid, BN inference transform.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from vision_toolbox_tpu.nn.layers import (
    avg_pool_torch,
    max_pool_torch,
    torch_pad,
    ACTIVATIONS,
)


@pytest.mark.parametrize("k,s,size", [(3, 1, 17), (3, 2, 17), (6, 2, 20), (1, 1, 8), (7, 2, 15)])
def test_conv_padding_parity(k, s, size):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, size, size), dtype=np.float32)
    w = rng.standard_normal((4, 5, k, k), dtype=np.float32)
    pad = torch_pad(k, s)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), stride=s, padding=pad).numpy()

    import jax.lax as lax

    out = lax.conv_general_dilated(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(w.transpose(2, 3, 1, 0)),
        window_strides=(s, s),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,s,p,size", [(3, 2, 1, 16), (3, 2, 1, 15), (5, 1, 2, 10)])
def test_max_pool_parity(k, s, p, size):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, size, size), dtype=np.float32)
    ref = F.max_pool2d(torch.from_numpy(x), k, s, p).numpy()
    out = max_pool_torch(jnp.asarray(x.transpose(0, 2, 3, 1)), k, s, p)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("k,s,p,size", [(5, 1, 2, 10), (2, 2, 0, 8)])
def test_avg_pool_parity(k, s, p, size):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, size, size), dtype=np.float32)
    ref = F.avg_pool2d(torch.from_numpy(x), k, s, p).numpy()
    out = avg_pool_torch(jnp.asarray(x.transpose(0, 2, 3, 1)), k, s, p)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize(
    "name,torch_fn",
    [
        ("relu", F.relu),
        ("leaky_relu", lambda t: F.leaky_relu(t, 0.2)),
        ("silu", F.silu),
        ("gelu", F.gelu),  # torch default = exact erf
        ("hardsigmoid", F.hardsigmoid),
        ("hardswish", F.hardswish),
        ("relu6", F.relu6),
    ],
)
def test_activation_parity(name, torch_fn):
    x = np.linspace(-5, 5, 201, dtype=np.float32)
    ref = torch_fn(torch.from_numpy(x)).numpy()
    out = np.asarray(ACTIVATIONS[name](jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_batchnorm_inference_parity():
    rng = np.random.default_rng(3)
    c = 6
    x = rng.standard_normal((2, c, 5, 5), dtype=np.float32)
    weight = rng.standard_normal(c, dtype=np.float32)
    bias = rng.standard_normal(c, dtype=np.float32)
    mean = rng.standard_normal(c, dtype=np.float32)
    var = rng.random(c, dtype=np.float32) + 0.5

    bn = torch.nn.BatchNorm2d(c, eps=1e-5)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(weight))
        bn.bias.copy_(torch.from_numpy(bias))
        bn.running_mean.copy_(torch.from_numpy(mean))
        bn.running_var.copy_(torch.from_numpy(var))
    bn.eval()
    ref = bn(torch.from_numpy(x)).detach().numpy()

    from flax import linen as nn

    mod = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5)
    variables = {
        "params": {"scale": jnp.asarray(weight), "bias": jnp.asarray(bias)},
        "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)},
    }
    out = mod.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5)
