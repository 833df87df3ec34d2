"""ViT full-model parity vs a pure-torch replica (vit.py:144-157 semantics)
for the cls_token and gap pooling paths, plus a resize_pe smoke round-trip
(reference tests/test_vit.py:13-17 pattern)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vision_toolbox_tpu.models.vit import ViT, resize_pe

torch.manual_seed(1)

D, DEPTH, HEADS, PATCH, IMG = 16, 2, 2, 8, 32


def _rand_block(d):
    g = lambda *s: torch.randn(*s) * 0.05
    return {
        "ln1_w": g(d) + 1, "ln1_b": g(d), "ln2_w": g(d) + 1, "ln2_b": g(d),
        "q_w": g(d, d), "q_b": g(d), "k_w": g(d, d), "k_b": g(d),
        "v_w": g(d, d), "v_b": g(d), "o_w": g(d, d), "o_b": g(d),
        "fc1_w": g(4 * d, d), "fc1_b": g(4 * d), "fc2_w": g(d, 4 * d), "fc2_b": g(d),
    }


def _block_fwd(p, x, d):
    y = F.layer_norm(x, (d,), p["ln1_w"], p["ln1_b"], 1e-6)
    q = (y @ p["q_w"].T + p["q_b"]).unflatten(-1, (HEADS, -1)).transpose(-2, -3)
    k = (y @ p["k_w"].T + p["k_b"]).unflatten(-1, (HEADS, -1)).transpose(-2, -3)
    v = (y @ p["v_w"].T + p["v_b"]).unflatten(-1, (HEADS, -1)).transpose(-2, -3)
    att = F.scaled_dot_product_attention(q, k, v).transpose(-2, -3).flatten(-2)
    x = x + att @ p["o_w"].T + p["o_b"]
    y = F.layer_norm(x, (d,), p["ln2_w"], p["ln2_b"], 1e-6)
    return x + F.gelu(y @ p["fc1_w"].T + p["fc1_b"]) @ p["fc2_w"].T + p["fc2_b"]


def _block_to_jax(p):
    t = lambda x: jnp.asarray(x.numpy())
    return {
        "mha_norm": {"scale": t(p["ln1_w"]), "bias": t(p["ln1_b"])},
        "mha": {
            "q_proj": {"kernel": t(p["q_w"].T), "bias": t(p["q_b"])},
            "k_proj": {"kernel": t(p["k_w"].T), "bias": t(p["k_b"])},
            "v_proj": {"kernel": t(p["v_w"].T), "bias": t(p["v_b"])},
            "out_proj": {"kernel": t(p["o_w"].T), "bias": t(p["o_b"])},
        },
        "mlp_norm": {"scale": t(p["ln2_w"]), "bias": t(p["ln2_b"])},
        "mlp": {
            "linear1": {"kernel": t(p["fc1_w"].T), "bias": t(p["fc1_b"])},
            "linear2": {"kernel": t(p["fc2_w"].T), "bias": t(p["fc2_b"])},
        },
    }


def _build(pool_type, cls_token):
    g = lambda *s: torch.randn(*s) * 0.05
    n = (IMG // PATCH) ** 2
    weights = {
        "patch_w": g(D, 3, PATCH, PATCH), "patch_b": g(D),
        "pe": g(1, n, D), "cls": g(1, 1, D),
        "norm_w": g(D) + 1, "norm_b": g(D),
        "blocks": [_rand_block(D) for _ in range(DEPTH)],
    }
    t = lambda x: jnp.asarray(x.numpy())
    params = {
        "patch_embed": {"kernel": t(weights["patch_w"].permute(2, 3, 1, 0)), "bias": t(weights["patch_b"])},
        "pe": t(weights["pe"]),
        "norm": {"scale": t(weights["norm_w"]), "bias": t(weights["norm_b"])},
    }
    if cls_token:
        params["cls_token"] = t(weights["cls"])
    for i, b in enumerate(weights["blocks"]):
        params[f"block_{i}"] = _block_to_jax(b)
    model = ViT(d_model=D, depth=DEPTH, n_heads=HEADS, patch_size=PATCH, img_size=IMG,
                cls_token=cls_token, pool_type=pool_type)
    return weights, model, params


def _torch_fwd(w, x_np, pool_type, cls_token):
    with torch.no_grad():
        x = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        out = F.conv2d(x, w["patch_w"], w["patch_b"], stride=PATCH).flatten(2).transpose(1, 2)
        out = out + w["pe"]
        if cls_token:
            out = torch.cat([w["cls"].expand(out.shape[0], -1, -1), out], 1)
        for b in w["blocks"]:
            out = _block_fwd(b, out, D)
        if pool_type == "cls_token":
            return F.layer_norm(out[:, 0], (D,), w["norm_w"], w["norm_b"], 1e-6).numpy()
        return F.layer_norm(out, (D,), w["norm_w"], w["norm_b"], 1e-6).mean(1).numpy()


def test_vit_cls_pool_parity():
    w, model, params = _build("cls_token", True)
    x_np = np.random.default_rng(0).standard_normal((2, IMG, IMG, 3)).astype(np.float32)
    ref = _torch_fwd(w, x_np, "cls_token", True)
    out = model.apply({"params": params}, jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=5e-4)


def test_vit_gap_pool_parity():
    w, model, params = _build("gap", False)
    x_np = np.random.default_rng(1).standard_normal((2, IMG, IMG, 3)).astype(np.float32)
    ref = _torch_fwd(w, x_np, "gap", False)
    out = model.apply({"params": params}, jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=5e-4)


def test_resize_pe_roundtrip():
    _, model, params = _build("cls_token", True)
    pe = params["pe"]
    pe_up = resize_pe(pe, 64, PATCH)  # 4x4 -> 8x8 grid
    assert pe_up.shape == (1, 64, D)
    model_big = ViT(d_model=D, depth=DEPTH, n_heads=HEADS, patch_size=PATCH, img_size=64)
    params_big = dict(params, pe=pe_up)
    out = model_big.apply({"params": params_big}, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, D)
    # down-resize returns the original grid shape with close values for a
    # smooth embedding
    smooth = jnp.asarray(np.tile(np.linspace(0, 1, 16, dtype=np.float32)[None, :, None], (1, 1, D)))
    again = resize_pe(resize_pe(smooth, 64, PATCH), IMG, PATCH)
    np.testing.assert_allclose(np.asarray(again), np.asarray(smooth), atol=0.08)
