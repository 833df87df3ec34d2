"""Numerical parity of transformer/conv blocks vs pure-torch replicas of the
reference math (torchvision is unavailable here, so reference modules are
re-stated inline with plain torch ops, citing reference file:line).

All comparisons run in fp32 on CPU at the reference test tolerance
(rtol/atol 2e-5, see reference tests/test_vit.py:35 etc.).
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

RTOL, ATOL = 2e-5, 2e-5


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def mha_torch(x, n_heads, wq, bq, wk, bk, wv, bv, wo, bo, bias=None):
    """reference vit.py:29-48 with SDPA."""
    q = (x @ wq.T + bq).unflatten(-1, (n_heads, -1)).transpose(-2, -3)
    k = (x @ wk.T + bk).unflatten(-1, (n_heads, -1)).transpose(-2, -3)
    v = (x @ wv.T + bv).unflatten(-1, (n_heads, -1)).transpose(-2, -3)
    out = F.scaled_dot_product_attention(q, k, v, bias)
    out = out.transpose(-2, -3).flatten(-2)
    return out @ wo.T + bo


def make_linear_params(rng, d_in, d_out):
    w = torch.from_numpy(rng.standard_normal((d_out, d_in), dtype=np.float32) * 0.05)
    b = torch.from_numpy(rng.standard_normal(d_out, dtype=np.float32) * 0.05)
    return w, b


def test_mha_parity():
    from vision_toolbox_tpu.nn.attention import MHA

    rng = np.random.default_rng(0)
    d, h, L, B = 64, 4, 10, 2
    x = torch.from_numpy(rng.standard_normal((B, L, d), dtype=np.float32))
    ps = {n: make_linear_params(rng, d, d) for n in ["q", "k", "v", "o"]}
    ref = mha_torch(x, h, *ps["q"], *ps["k"], *ps["v"], *ps["o"])

    m = MHA(d, h)
    params = {
        f"{n}_proj": {"kernel": t2j(w.T), "bias": t2j(b)}
        for n, (w, b) in [("q", ps["q"]), ("k", ps["k"]), ("v", ps["v"]), ("out", ps["o"])]
    }
    out = m.apply({"params": params}, t2j(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=RTOL, atol=ATOL)


def test_mha_with_bias_parity():
    from vision_toolbox_tpu.nn.attention import MHA

    rng = np.random.default_rng(5)
    d, h, L, B = 32, 2, 9, 2
    x = torch.from_numpy(rng.standard_normal((B, L, d), dtype=np.float32))
    attn_bias = torch.from_numpy(rng.standard_normal((1, h, L, L), dtype=np.float32))
    ps = {n: make_linear_params(rng, d, d) for n in ["q", "k", "v", "o"]}
    ref = mha_torch(x, h, *ps["q"], *ps["k"], *ps["v"], *ps["o"], bias=attn_bias)

    m = MHA(d, h)
    params = {
        f"{n}_proj": {"kernel": t2j(w.T), "bias": t2j(b)}
        for n, (w, b) in [("q", ps["q"]), ("k", ps["k"]), ("v", ps["v"]), ("out", ps["o"])]
    }
    out = m.apply({"params": params}, t2j(x), attn_bias=t2j(attn_bias))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=RTOL, atol=ATOL)


def test_vit_block_parity():
    """Pre-LN block: x + mha(ln(x)); x + mlp(ln(x)) (ref vit.py:60-92)."""
    from vision_toolbox_tpu.nn.attention import ViTBlock

    rng = np.random.default_rng(1)
    d, h, L, B = 48, 4, 7, 2
    x = torch.from_numpy(rng.standard_normal((B, L, d), dtype=np.float32))

    ln1_w, ln1_b = make_linear_params(rng, 1, d)[0].squeeze(), make_linear_params(rng, 1, d)[0].squeeze()
    ln2_w, ln2_b = make_linear_params(rng, 1, d)[0].squeeze(), make_linear_params(rng, 1, d)[0].squeeze()
    ps = {n: make_linear_params(rng, d, d) for n in ["q", "k", "v", "o"]}
    w1, b1 = make_linear_params(rng, d, d * 4)
    w2, b2 = make_linear_params(rng, d * 4, d)

    def ln(x, w, b):
        return F.layer_norm(x, (d,), w, b, 1e-6)

    y = ln(x, ln1_w, ln1_b)
    x_ref = x + mha_torch(y, h, *ps["q"], *ps["k"], *ps["v"], *ps["o"])
    y = ln(x_ref, ln2_w, ln2_b)
    x_ref = x_ref + (F.gelu(y @ w1.T + b1) @ w2.T + b2)

    m = ViTBlock(d, h)
    params = {
        "mha_norm": {"scale": t2j(ln1_w), "bias": t2j(ln1_b)},
        "mha": {
            f"{n}_proj": {"kernel": t2j(w.T), "bias": t2j(b)}
            for n, (w, b) in [("q", ps["q"]), ("k", ps["k"]), ("v", ps["v"]), ("out", ps["o"])]
        },
        "mlp_norm": {"scale": t2j(ln2_w), "bias": t2j(ln2_b)},
        "mlp": {
            "linear1": {"kernel": t2j(w1.T), "bias": t2j(b1)},
            "linear2": {"kernel": t2j(w2.T), "bias": t2j(b2)},
        },
    }
    out = m.apply({"params": params}, t2j(x))
    np.testing.assert_allclose(np.asarray(out), x_ref.numpy(), rtol=RTOL, atol=ATOL)


def test_grn_parity():
    """GlobalResponseNorm over spatial L2 norm (ref convnext.py:15-26)."""
    from vision_toolbox_tpu.models.convnext import GlobalResponseNorm

    rng = np.random.default_rng(2)
    x = torch.from_numpy(rng.standard_normal((2, 5, 5, 16), dtype=np.float32))
    gamma = torch.from_numpy(rng.standard_normal(16, dtype=np.float32))
    beta = torch.from_numpy(rng.standard_normal(16, dtype=np.float32))

    gx = torch.linalg.vector_norm(x, dim=(1, 2), keepdim=True)
    nx = gx / gx.mean(-1, keepdim=True).add(1e-6)
    ref = x + x * nx * gamma + beta

    m = GlobalResponseNorm()
    out = m.apply({"params": {"gamma": t2j(gamma), "beta": t2j(beta)}}, t2j(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=RTOL, atol=ATOL)


def test_talking_head_attention_parity():
    """Pre/post-softmax head mixing via 1×1 convs (ref cait.py:32-51)."""
    from vision_toolbox_tpu.models.cait import TalkingHeadAttention

    rng = np.random.default_rng(3)
    d, h, L, B = 48, 4, 6, 2
    x = torch.from_numpy(rng.standard_normal((B, L, d), dtype=np.float32))
    ps = {n: make_linear_params(rng, d, d) for n in ["q", "k", "v", "o"]}
    wl, bl = make_linear_params(rng, h, h)
    ww, bw = make_linear_params(rng, h, h)
    scale = (d // h) ** -0.5

    q = (x @ ps["q"][0].T + ps["q"][1]).unflatten(-1, (h, -1)).transpose(-2, -3)
    k = (x @ ps["k"][0].T + ps["k"][1]).unflatten(-1, (h, -1)).transpose(-2, -3)
    v = (x @ ps["v"][0].T + ps["v"][1]).unflatten(-1, (h, -1)).transpose(-2, -3)
    attn = q @ (k * scale).transpose(-1, -2)  # (B, h, L, L)
    attn = torch.einsum("bhqk,gh->bgqk", attn, wl) + bl[None, :, None, None]
    attn = torch.softmax(attn, -1)
    attn = torch.einsum("bhqk,gh->bgqk", attn, ww) + bw[None, :, None, None]
    out = attn @ v
    ref = out.transpose(-2, -3).flatten(-2) @ ps["o"][0].T + ps["o"][1]

    m = TalkingHeadAttention(d, h)
    params = {
        f"{n}_proj": {"kernel": t2j(w.T), "bias": t2j(b)}
        for n, (w, b) in [("q", ps["q"]), ("k", ps["k"]), ("v", ps["v"]), ("out", ps["o"])]
    }
    params.update(
        proj_l_kernel=t2j(wl), proj_l_bias=t2j(bl),
        proj_w_kernel=t2j(ww), proj_w_bias=t2j(bw),
    )
    out = m.apply({"params": params}, t2j(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=RTOL, atol=ATOL)


def test_patch_merging_parity():
    """2×2 merge order p1,p3,p2,p4 + LN + linear (ref swin.py:113-124)."""
    from vision_toolbox_tpu.models.swin import PatchMerging

    rng = np.random.default_rng(4)
    B, H, W, C = 2, 4, 4, 8
    x = torch.from_numpy(rng.standard_normal((B, H, W, C), dtype=np.float32))
    ln_w = torch.from_numpy(rng.standard_normal(4 * C, dtype=np.float32))
    ln_b = torch.from_numpy(rng.standard_normal(4 * C, dtype=np.float32))
    red_w = torch.from_numpy(rng.standard_normal((2 * C, 4 * C), dtype=np.float32) * 0.05)

    y = x.view(B, H // 2, 2, W // 2, 2, C).transpose(2, 3).flatten(-3)
    y = F.layer_norm(y, (4 * C,), ln_w, ln_b, 1e-5)
    ref = (y @ red_w.T).view(B, H // 2, W // 2, 2 * C)

    m = PatchMerging()
    params = {
        "norm": {"scale": t2j(ln_w), "bias": t2j(ln_b)},
        "reduction": {"kernel": t2j(red_w.T)},
    }
    out = m.apply({"params": params}, t2j(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=RTOL, atol=ATOL)


def test_window_attention_relative_pe_index():
    """Relative-PE index must match the reference construction (swin.py:67-69)."""
    from vision_toolbox_tpu.models.swin import _relative_pe_index

    w = 4
    xy = torch.cartesian_prod(torch.arange(w), torch.arange(w))
    diff = xy.unsqueeze(1) - xy.unsqueeze(0)
    ref = (diff[:, :, 0] + w - 1) * (2 * w - 1) + diff[:, :, 1] + w - 1
    np.testing.assert_array_equal(_relative_pe_index(w), ref.numpy())


def test_swin_shift_mask():
    """Shift mask must match the reference construction (swin.py:50-57)."""
    import itertools

    from vision_toolbox_tpu.models.swin import _shift_attn_mask, window_partition

    size, w = 8, 4
    shift = w // 2
    img_mask = torch.zeros(1, size, size, 1)
    slices = (slice(0, -w), slice(-w, -shift), slice(-shift, None))
    for i, (hs, ws) in enumerate(itertools.product(slices, slices)):
        img_mask[:, hs, ws, :] = i
    t = img_mask.view(1, size // w, w, size // w, w, 1).transpose(2, 3)
    windows = t.reshape((size // w) ** 2, w * w)
    ref = ((windows.unsqueeze(1) - windows.unsqueeze(2)) != 0) * (-100.0)
    np.testing.assert_allclose(_shift_attn_mask(size, w, shift), ref.numpy(), rtol=0, atol=0)


def test_osa_block_parity():
    """OSA: chained 3×3 convs, concat all, 1×1 project, eSE, residual
    (ref vovnet.py:31-63). BN in inference mode with synthetic stats."""
    from vision_toolbox_tpu.models.vovnet import OSABlock

    rng = np.random.default_rng(6)
    C, mid, L = 16, 8, 3
    x = torch.from_numpy(rng.standard_normal((2, C, 6, 6), dtype=np.float32))

    convs, bns = [], []
    in_c = C
    for _ in range(L):
        w = torch.from_numpy(rng.standard_normal((mid, in_c, 3, 3), dtype=np.float32) * 0.1)
        bn = [torch.from_numpy(rng.standard_normal(mid, dtype=np.float32)) for _ in range(2)] + [
            torch.from_numpy(rng.standard_normal(mid, dtype=np.float32)),
            torch.from_numpy(rng.random(mid, dtype=np.float32) + 0.5),
        ]
        convs.append(w)
        bns.append(bn)
        in_c = mid
    cat_c = C + mid * L
    w_out = torch.from_numpy(rng.standard_normal((C, cat_c, 1, 1), dtype=np.float32) * 0.1)
    bn_out = [torch.from_numpy(rng.standard_normal(C, dtype=np.float32)) for _ in range(2)] + [
        torch.from_numpy(rng.standard_normal(C, dtype=np.float32)),
        torch.from_numpy(rng.random(C, dtype=np.float32) + 0.5),
    ]
    w_ese, b_ese = make_linear_params(rng, C, C)

    def bn_eval(x, p):
        return F.batch_norm(x, p[2], p[3], p[0], p[1], False, 0.1, 1e-5)

    outs = [x]
    y = x
    for w, bn in zip(convs, bns):
        y = F.relu(bn_eval(F.conv2d(y, w, padding=1), bn))
        outs.append(y)
    y = torch.cat(outs, 1)
    y = F.relu(bn_eval(F.conv2d(y, w_out), bn_out))
    gate = F.hardsigmoid(F.conv2d(y.mean((2, 3), keepdim=True), w_ese[:, :, None, None], b_ese))
    ref = y * gate + x  # residual since in == out

    m = OSABlock(mid, L, C, ese=True)
    params, stats = {}, {}
    for i, (w, bn) in enumerate(zip(convs, bns)):
        params[f"conv_{i}"] = {
            "conv": {"kernel": t2j(w.permute(2, 3, 1, 0))},
            "norm": {"scale": t2j(bn[0]), "bias": t2j(bn[1])},
        }
        stats[f"conv_{i}"] = {"norm": {"mean": t2j(bn[2]), "var": t2j(bn[3])}}
    params["out_conv"] = {
        "conv": {"kernel": t2j(w_out.permute(2, 3, 1, 0))},
        "norm": {"scale": t2j(bn_out[0]), "bias": t2j(bn_out[1])},
    }
    stats["out_conv"] = {"norm": {"mean": t2j(bn_out[2]), "var": t2j(bn_out[3])}}
    params["ese"] = {"linear": {"kernel": t2j(w_ese.T[None, None]), "bias": t2j(b_ese)}}

    out = m.apply(
        {"params": params, "batch_stats": stats},
        t2j(x.permute(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref.numpy(), rtol=1e-4, atol=1e-4
    )
