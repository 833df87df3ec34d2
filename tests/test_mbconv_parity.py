"""MBConv parity vs torch replicas for both SE conventions:
MobileNetV3 (relu + hardsigmoid SE) and EfficientNet (silu + sigmoid SE)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vision_toolbox_tpu.models.mbconv import MBConv

torch.manual_seed(9)
g = lambda *s: torch.randn(*s) * 0.1
t = lambda x: jnp.asarray(x.numpy())


def _bn(c):
    return {"w": g(c) + 1, "b": g(c), "mean": g(c), "var": torch.rand(c) + 0.5}


def _bn_eval(x, p):
    return F.batch_norm(x, p["mean"], p["var"], p["w"], p["b"], False, 0.01, 1e-3)


def _bn_jax(p):
    return (
        {"scale": t(p["w"]), "bias": t(p["b"])},
        {"mean": t(p["mean"]), "var": t(p["var"])},
    )


def _run_case(act_t, act_name, gate_t, gate_name):
    C_in, C_exp, C_out, K, S = 8, 24, 8, 3, 1
    se_c = 6
    w_exp, bn_exp = g(C_exp, C_in, 1, 1), _bn(C_exp)
    w_dw, bn_dw = g(C_exp, 1, K, K), _bn(C_exp)
    w_se1, b_se1 = g(se_c, C_exp, 1, 1), g(se_c)
    w_se2, b_se2 = g(C_exp, se_c, 1, 1), g(C_exp)
    w_pr, bn_pr = g(C_out, C_exp, 1, 1), _bn(C_out)
    x_np = np.random.default_rng(0).standard_normal((2, C_in, 8, 8)).astype(np.float32)

    with torch.no_grad():
        x = torch.from_numpy(x_np)
        y = act_t(_bn_eval(F.conv2d(x, w_exp), bn_exp))
        y = act_t(_bn_eval(F.conv2d(y, w_dw, stride=S, padding=1, groups=C_exp), bn_dw))
        s = y.mean((2, 3), keepdim=True)
        s = act_t(F.conv2d(s, w_se1, b_se1))
        s = gate_t(F.conv2d(s, w_se2, b_se2))
        y = y * s
        y = _bn_eval(F.conv2d(y, w_pr), bn_pr)
        ref = (y + x).numpy()  # stride 1, in == out → residual

    p_exp, s_exp = _bn_jax(bn_exp)
    p_dw, s_dw = _bn_jax(bn_dw)
    p_pr, s_pr = _bn_jax(bn_pr)
    params = {
        "expand": {"conv": {"kernel": t(w_exp.permute(2, 3, 1, 0))}, "norm": p_exp},
        "dwconv": {"conv": {"kernel": t(w_dw.permute(2, 3, 1, 0))}, "norm": p_dw},
        "se": {
            "fc1": {"kernel": t(w_se1.permute(2, 3, 1, 0)), "bias": t(b_se1)},
            "fc2": {"kernel": t(w_se2.permute(2, 3, 1, 0)), "bias": t(b_se2)},
        },
        "project": {"conv": {"kernel": t(w_pr.permute(2, 3, 1, 0))}, "norm": p_pr},
    }
    stats = {"expand": {"norm": s_exp}, "dwconv": {"norm": s_dw}, "project": {"norm": s_pr}}
    m = MBConv(C_exp, C_out, K, S, se_channels=se_c, se_act=act_name, se_gate=gate_name, act=act_name)
    out = m.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x_np.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=5e-4, atol=5e-4
    )


def test_mbconv_mobilenetv3_semantics():
    _run_case(F.relu, "relu", F.hardsigmoid, "hardsigmoid")


def test_mbconv_efficientnet_semantics():
    _run_case(F.silu, "silu", torch.sigmoid, "sigmoid")
