"""Swin full-model numerical parity vs a pure-torch functional replica of the
reference (swin.py:16-184 semantics): window partition, relative-PE bias,
cyclic shift with region masks, patch merging, final norm + GAP."""

import itertools

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vision_toolbox_tpu.models.swin import SwinTransformer

torch.manual_seed(0)

D_MODEL, N_HEADS, DEPTHS, WINDOW, IMG = 8, 2, (2, 2), 2, 16


def _win_partition(x, w):
    B, H, W, C = x.shape
    nH, nW = H // w, W // w
    x = x.view(B, nH, w, nW, w, C).transpose(2, 3).reshape(B * nH * nW, w * w, C)
    return x, nH, nW


def _win_unpartition(x, w, nH, nW):
    B = x.shape[0] // (nH * nW)
    C = x.shape[2]
    x = x.view(B, nH, nW, w, w, C).transpose(2, 3).reshape(B, nH * w, nW * w, C)
    return x


def _rel_index(w):
    xy = torch.cartesian_prod(torch.arange(w), torch.arange(w))
    diff = xy.unsqueeze(1) - xy.unsqueeze(0)
    return (diff[:, :, 0] + w - 1) * (2 * w - 1) + diff[:, :, 1] + w - 1


def _shift_mask(size, w, shift):
    img_mask = torch.zeros(1, size, size, 1)
    slices = (slice(0, -w), slice(-w, -shift), slice(-shift, None))
    for i, (hs, ws) in enumerate(itertools.product(slices, slices)):
        img_mask[:, hs, ws, :] = i
    wm, _, _ = _win_partition(img_mask, w)
    return (wm.transpose(1, 2) - wm != 0) * (-100.0)


def _mha(p, x, bias, n_heads):
    B, L, C = x.shape
    q = (x @ p["q_w"].T + p["q_b"]).unflatten(-1, (n_heads, -1)).transpose(-2, -3)
    k = (x @ p["k_w"].T + p["k_b"]).unflatten(-1, (n_heads, -1)).transpose(-2, -3)
    v = (x @ p["v_w"].T + p["v_b"]).unflatten(-1, (n_heads, -1)).transpose(-2, -3)
    out = F.scaled_dot_product_attention(q, k, v, bias)
    out = out.transpose(-2, -3).flatten(-2)
    return out @ p["o_w"].T + p["o_b"]


def _window_attention(p, x, input_size, w, shift, n_heads):
    B = x.shape[0]
    attn_bias = p["pe_table"][..., _rel_index(w)]  # (1, H, w², w²)
    if shift:
        s = w // 2
        x = x.roll((-s, -s), (1, 2))
        attn_bias = attn_bias + _shift_mask(input_size, w, s).unsqueeze(1)
    xw, nH, nW = _win_partition(x, w)
    # tile the per-window bias over the flattened (B*nW) batch — torch SDPA
    # cannot broadcast (nW, ...) against (B*nW, ...)
    if attn_bias.shape[0] == 1:
        attn_bias = attn_bias.expand(xw.shape[0], -1, -1, -1)
    else:
        attn_bias = attn_bias.repeat(B, 1, 1, 1)
    xw = _mha(p, xw, attn_bias, n_heads)
    x = _win_unpartition(xw, w, nH, nW)
    if shift:
        s = w // 2
        x = x.roll((s, s), (1, 2))
    return x


def _block(p, x, input_size, w, shift, n_heads):
    d = x.shape[-1]
    y = F.layer_norm(x, (d,), p["ln1_w"], p["ln1_b"], 1e-5)
    x = x + _window_attention(p, y, input_size, w, shift, n_heads)
    y = F.layer_norm(x, (d,), p["ln2_w"], p["ln2_b"], 1e-5)
    y = F.gelu(y @ p["fc1_w"].T + p["fc1_b"]) @ p["fc2_w"].T + p["fc2_b"]
    return x + y


def _rand_block_params(d, n_heads, w):
    g = lambda *s: torch.randn(*s) * 0.05
    return {
        "ln1_w": g(d) + 1, "ln1_b": g(d), "ln2_w": g(d) + 1, "ln2_b": g(d),
        "q_w": g(d, d), "q_b": g(d), "k_w": g(d, d), "k_b": g(d),
        "v_w": g(d, d), "v_b": g(d), "o_w": g(d, d), "o_b": g(d),
        "fc1_w": g(4 * d, d), "fc1_b": g(4 * d), "fc2_w": g(d, 4 * d), "fc2_b": g(d),
        "pe_table": g(1, n_heads, (2 * w - 1) ** 2),
    }


def _block_to_jax(p):
    t = lambda x: jnp.asarray(x.numpy())
    return {
        "mha_norm": {"scale": t(p["ln1_w"]), "bias": t(p["ln1_b"])},
        "mha": {
            "q_proj": {"kernel": t(p["q_w"].T), "bias": t(p["q_b"])},
            "k_proj": {"kernel": t(p["k_w"].T), "bias": t(p["k_b"])},
            "v_proj": {"kernel": t(p["v_w"].T), "bias": t(p["v_b"])},
            "out_proj": {"kernel": t(p["o_w"].T), "bias": t(p["o_b"])},
            "relative_pe_table": t(p["pe_table"]),
        },
        "mlp_norm": {"scale": t(p["ln2_w"]), "bias": t(p["ln2_b"])},
        "mlp": {
            "linear1": {"kernel": t(p["fc1_w"].T), "bias": t(p["fc1_b"])},
            "linear2": {"kernel": t(p["fc2_w"].T), "bias": t(p["fc2_b"])},
        },
    }


def test_swin_full_parity():
    g = lambda *s: torch.randn(*s) * 0.05
    patch_w = g(D_MODEL, 3, 4, 4)
    patch_b = g(D_MODEL)
    pn_w, pn_b = g(D_MODEL) + 1, g(D_MODEL)
    blocks = []
    d, h, size = D_MODEL, N_HEADS, IMG // 4
    merges = []
    for s, depth in enumerate(DEPTHS):
        if s > 0:
            merges.append({
                "norm_w": g(4 * d) + 1, "norm_b": g(4 * d), "red_w": g(2 * d, 4 * d),
            })
            size //= 2
            d *= 2
            h *= 2
        blocks.append([_rand_block_params(d, h, WINDOW) for _ in range(depth)])
    norm_w, norm_b = g(d) + 1, g(d)

    x_np = np.random.default_rng(0).standard_normal((2, IMG, IMG, 3)).astype(np.float32)

    # --- torch forward
    with torch.no_grad():
        x = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        x = F.conv2d(x, patch_w, patch_b, stride=4).permute(0, 2, 3, 1)
        x = F.layer_norm(x, (D_MODEL,), pn_w, pn_b, 1e-5)
        d, h, size = D_MODEL, N_HEADS, IMG // 4
        for s, depth in enumerate(DEPTHS):
            if s > 0:
                m = merges[s - 1]
                B, H, W, C = x.shape
                x = x.view(B, H // 2, 2, W // 2, 2, C).transpose(2, 3).flatten(-3)
                x = F.layer_norm(x, (4 * C,), m["norm_w"], m["norm_b"], 1e-5)
                x = (x @ m["red_w"].T).view(B, H // 2, W // 2, 2 * C)
                size //= 2
                d *= 2
                h *= 2
            for j in range(depth):
                shift = bool(j % 2) and size > WINDOW
                x = _block(blocks[s][j], x, size, WINDOW, shift, h)
        ref = F.layer_norm(x, (d,), norm_w, norm_b, 1e-5).mean((1, 2)).numpy()

    # --- ours
    t = lambda v: jnp.asarray(v.numpy())
    params = {
        "patch_embed": {"kernel": t(patch_w.permute(2, 3, 1, 0)), "bias": t(patch_b)},
        "patch_norm": {"scale": t(pn_w), "bias": t(pn_b)},
        "norm": {"scale": t(norm_w), "bias": t(norm_b)},
    }
    for s, depth in enumerate(DEPTHS):
        if s > 0:
            m = merges[s - 1]
            params[f"downsample_{s}"] = {
                "norm": {"scale": t(m["norm_w"]), "bias": t(m["norm_b"])},
                "reduction": {"kernel": t(m["red_w"].T)},
            }
        for j in range(depth):
            params[f"stage_{s}_block_{j}"] = _block_to_jax(blocks[s][j])

    model = SwinTransformer(
        img_size=IMG, d_model=D_MODEL, n_heads=N_HEADS,
        depths=DEPTHS, window_sizes=(WINDOW,) * len(DEPTHS),
    )
    out = model.apply({"params": params}, jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=5e-4)
