"""Numeric parity for the remaining block types: ResNet basic/bottleneck
blocks vs torch replicas, and PatchConvNet's attention pooling vs a replica
of the reference (patchconvnet.py:68-103)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

torch.manual_seed(7)
g = lambda *s: torch.randn(*s) * 0.05
t = lambda x: jnp.asarray(x.numpy())


def _bn_eval(x, p):
    return F.batch_norm(x, p["mean"], p["var"], p["w"], p["b"], False, 0.1, 1e-5)


def _rand_bn(c):
    return {
        "w": g(c) + 1, "b": g(c),
        "mean": g(c), "var": torch.rand(c) + 0.5,
    }


def _bn_to_jax(p):
    return (
        {"scale": t(p["w"]), "bias": t(p["b"])},
        {"mean": t(p["mean"]), "var": t(p["var"])},
    )


def test_basic_block_parity():
    from vision_toolbox_tpu.models.resnet import BasicBlock

    C, S = 8, 2
    w1, bn1 = g(C, C, 3, 3), _rand_bn(C)
    w2, bn2 = g(C, C, 3, 3), _rand_bn(C)
    wd, bnd = g(C, C, 1, 1), _rand_bn(C)
    x_np = np.random.default_rng(0).standard_normal((2, C, 8, 8)).astype(np.float32)

    with torch.no_grad():
        x = torch.from_numpy(x_np)
        y = F.relu(_bn_eval(F.conv2d(x, w1, stride=S, padding=1), bn1))
        y = _bn_eval(F.conv2d(y, w2, padding=1), bn2)
        idt = _bn_eval(F.conv2d(x, wd, stride=S), bnd)
        ref = F.relu(y + idt).numpy()

    params, stats = {}, {}
    for name, w, bn in [("conv1", w1, bn1), ("conv2", w2, bn2), ("downsample", wd, bnd)]:
        pn, sn = _bn_to_jax(bn)
        params[name] = {"conv": {"kernel": t(w.permute(2, 3, 1, 0))}, "norm": pn}
        stats[name] = {"norm": sn}
    out = BasicBlock(C, S).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x_np.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=5e-4, atol=5e-4)


def test_bottleneck_block_parity():
    from vision_toolbox_tpu.models.resnet import Bottleneck

    C_in, C_out, S = 8, 16, 1  # mid = 4
    mid = C_out // 4
    w1, bn1 = g(mid, C_in, 1, 1), _rand_bn(mid)
    w2, bn2 = g(mid, mid, 3, 3), _rand_bn(mid)
    w3, bn3 = g(C_out, mid, 1, 1), _rand_bn(C_out)
    wd, bnd = g(C_out, C_in, 1, 1), _rand_bn(C_out)
    x_np = np.random.default_rng(1).standard_normal((2, C_in, 6, 6)).astype(np.float32)

    with torch.no_grad():
        x = torch.from_numpy(x_np)
        y = F.relu(_bn_eval(F.conv2d(x, w1), bn1))
        y = F.relu(_bn_eval(F.conv2d(y, w2, stride=S, padding=1), bn2))
        y = _bn_eval(F.conv2d(y, w3), bn3)
        idt = _bn_eval(F.conv2d(x, wd), bnd)
        ref = F.relu(y + idt).numpy()

    params, stats = {}, {}
    for name, w, bn in [("conv1", w1, bn1), ("conv2", w2, bn2), ("conv3", w3, bn3), ("downsample", wd, bnd)]:
        pn, sn = _bn_to_jax(bn)
        params[name] = {"conv": {"kernel": t(w.permute(2, 3, 1, 0))}, "norm": pn}
        stats[name] = {"norm": sn}
    out = Bottleneck(C_out, S).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x_np.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, rtol=5e-4, atol=5e-4)


def test_patchconvnet_attention_pooling_parity():
    from vision_toolbox_tpu.models.patchconvnet import AttentionPooling

    D, L, B = 16, 6, 2
    cls = g(D)
    ln1, ln2, ln3 = [(g(D) + 1, g(D)) for _ in range(3)]
    qp, kp, vp, op = [(g(D, D), g(D)) for _ in range(4)]
    g1, g2 = g(D), g(D)
    fc1 = (g(3 * D, D), g(3 * D))
    fc2 = (g(D, 3 * D), g(D))
    x_np = np.random.default_rng(2).standard_normal((B, L, D)).astype(np.float32)

    with torch.no_grad():
        x = torch.from_numpy(x_np)
        cls_tok = cls.expand(B, 1, -1)
        out = torch.cat([cls_tok, x], 1)
        out = F.layer_norm(out, (D,), ln1[0], ln1[1], 1e-5)
        # single-head attention, q = cls row
        q = (out[:, :1] @ qp[0].T + qp[1])
        k = (out @ kp[0].T + kp[1])
        v = (out @ vp[0].T + vp[1])
        att = F.scaled_dot_product_attention(q.unsqueeze(1), k.unsqueeze(1), v.unsqueeze(1)).squeeze(1)
        att = att @ op[0].T + op[1]
        cls_tok = cls_tok + att * g1
        y = F.layer_norm(cls_tok, (D,), ln2[0], ln2[1], 1e-5)
        y = F.gelu(y @ fc1[0].T + fc1[1]) @ fc2[0].T + fc2[1]
        cls_tok = cls_tok + y * g2
        ref = F.layer_norm(cls_tok, (D,), ln3[0], ln3[1], 1e-5)[:, 0].numpy()

    params = {
        "cls_token": t(cls),
        "norm1": {"scale": t(ln1[0]), "bias": t(ln1[1])},
        "norm2": {"scale": t(ln2[0]), "bias": t(ln2[1])},
        "norm3": {"scale": t(ln3[0]), "bias": t(ln3[1])},
        "q_proj": {"kernel": t(qp[0].T), "bias": t(qp[1])},
        "k_proj": {"kernel": t(kp[0].T), "bias": t(kp[1])},
        "v_proj": {"kernel": t(vp[0].T), "bias": t(vp[1])},
        "out_proj": {"kernel": t(op[0].T), "bias": t(op[1])},
        "layer_scale_1": t(g1),
        "layer_scale_2": t(g2),
        "mlp": {
            "linear1": {"kernel": t(fc1[0].T), "bias": t(fc1[1])},
            "linear2": {"kernel": t(fc2[0].T), "bias": t(fc2[1])},
        },
    }
    out = AttentionPooling(D, mlp_ratio=3, drop_path=0.0).apply({"params": params}, jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=5e-4)
