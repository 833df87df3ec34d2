"""MHAPooling (SigLIP MAP head) parity vs a torch replica of the reference
(vit.py:95-108: probe attends over tokens, residual MLP after norm)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vision_toolbox_tpu.nn.attention import MHAPooling

torch.manual_seed(5)
g = lambda *s: torch.randn(*s) * 0.05
t = lambda x: jnp.asarray(x.numpy())


def test_mha_pooling_parity():
    D, H, L, B = 16, 2, 9, 3
    probe = g(1, 1, D)
    qp, kp, vp, op = [(g(D, D), g(D)) for _ in range(4)]
    ln = (g(D) + 1, g(D))
    fc1 = (g(4 * D, D), g(4 * D))
    fc2 = (g(D, 4 * D), g(D))
    x_np = np.random.default_rng(0).standard_normal((B, L, D)).astype(np.float32)

    with torch.no_grad():
        x = torch.from_numpy(x_np)
        q = (probe.expand(B, -1, -1) @ qp[0].T + qp[1]).unflatten(-1, (H, -1)).transpose(-2, -3)
        k = (x @ kp[0].T + kp[1]).unflatten(-1, (H, -1)).transpose(-2, -3)
        v = (x @ vp[0].T + vp[1]).unflatten(-1, (H, -1)).transpose(-2, -3)
        att = F.scaled_dot_product_attention(q, k, v).transpose(-2, -3).flatten(-2)
        pooled = (att @ op[0].T + op[1]).squeeze(1)
        y = F.layer_norm(pooled, (D,), ln[0], ln[1], 1e-6)
        ref = (pooled + F.gelu(y @ fc1[0].T + fc1[1]) @ fc2[0].T + fc2[1]).numpy()

    params = {
        "probe": t(probe),
        "mha": {
            "q_proj": {"kernel": t(qp[0].T), "bias": t(qp[1])},
            "k_proj": {"kernel": t(kp[0].T), "bias": t(kp[1])},
            "v_proj": {"kernel": t(vp[0].T), "bias": t(vp[1])},
            "out_proj": {"kernel": t(op[0].T), "bias": t(op[1])},
        },
        "norm": {"scale": t(ln[0]), "bias": t(ln[1])},
        "mlp": {
            "linear1": {"kernel": t(fc1[0].T), "bias": t(fc1[1])},
            "linear2": {"kernel": t(fc2[0].T), "bias": t(fc2[1])},
        },
    }
    out = MHAPooling(D, H).apply({"params": params}, jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=5e-4)
