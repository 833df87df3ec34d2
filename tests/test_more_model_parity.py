"""Full-model parity for ConvNeXt, MLP-Mixer, DeiT, and CaiT vs pure-torch
functional replicas of the reference forwards (convnext.py:103-110,
mlp_mixer.py:59-64, deit.py:37-41, cait.py:136-143)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

torch.manual_seed(3)
g = lambda *s: torch.randn(*s) * 0.05
t = lambda x: jnp.asarray(x.numpy())


def _ln(x, w, b, eps=1e-6):
    return F.layer_norm(x, (x.shape[-1],), w, b, eps)


# ---------------------------------------------------------------------------
# ConvNeXt
# ---------------------------------------------------------------------------

def test_convnext_full_parity():
    from vision_toolbox_tpu.models.convnext import ConvNeXt

    D, DEPTHS, IMG = 8, (1, 2), 16
    stem_w, stem_b = g(D, 3, 4, 4), g(D)
    stem_ln = (g(D) + 1, g(D))
    final_ln = (g(2 * D) + 1, g(2 * D))
    ds_ln = (g(D) + 1, g(D))
    ds_w, ds_b = g(2 * D, D, 2, 2), g(2 * D)

    def rand_block(d):
        return {
            "dw_w": g(d, 1, 7, 7), "dw_b": g(d),
            "ln_w": g(d) + 1, "ln_b": g(d),
            "fc1_w": g(4 * d, d), "fc1_b": g(4 * d),
            "fc2_w": g(d, 4 * d), "fc2_b": g(d),
            "gamma": g(d),
        }

    blocks = [[rand_block(D * 2**s) for _ in range(n)] for s, n in enumerate(DEPTHS)]

    def block_fwd(p, x):  # NHWC
        d = x.shape[-1]
        y = x.permute(0, 3, 1, 2)
        y = F.conv2d(y, p["dw_w"], p["dw_b"], padding=3, groups=d).permute(0, 2, 3, 1)
        y = _ln(y, p["ln_w"], p["ln_b"])
        y = F.gelu(y @ p["fc1_w"].T + p["fc1_b"]) @ p["fc2_w"].T + p["fc2_b"]
        return x + y * p["gamma"]

    x_np = np.random.default_rng(0).standard_normal((2, IMG, IMG, 3)).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        x = F.conv2d(x, stem_w, stem_b, stride=4).permute(0, 2, 3, 1)
        x = _ln(x, *stem_ln)
        for s in range(len(DEPTHS)):
            if s > 0:
                x = _ln(x, *ds_ln).permute(0, 3, 1, 2)
                x = F.conv2d(x, ds_w, ds_b, stride=2).permute(0, 2, 3, 1)
            for p in blocks[s]:
                x = block_fwd(p, x)
        ref = _ln(x.mean((1, 2)), *final_ln).numpy()

    params = {
        "stem_conv": {"kernel": t(stem_w.permute(2, 3, 1, 0)), "bias": t(stem_b)},
        "stem_norm": {"scale": t(stem_ln[0]), "bias": t(stem_ln[1])},
        "downsample_norm_1": {"scale": t(ds_ln[0]), "bias": t(ds_ln[1])},
        "downsample_conv_1": {"kernel": t(ds_w.permute(2, 3, 1, 0)), "bias": t(ds_b)},
        "norm": {"scale": t(final_ln[0]), "bias": t(final_ln[1])},
    }
    for s, blist in enumerate(blocks):
        for j, p in enumerate(blist):
            params[f"stage_{s}_block_{j}"] = {
                "dwconv": {"kernel": t(p["dw_w"].permute(2, 3, 1, 0)), "bias": t(p["dw_b"])},
                "norm": {"scale": t(p["ln_w"]), "bias": t(p["ln_b"])},
                "pwconv1": {"kernel": t(p["fc1_w"].T), "bias": t(p["fc1_b"])},
                "pwconv2": {"kernel": t(p["fc2_w"].T), "bias": t(p["fc2_b"])},
                "layer_scale": {"gamma": t(p["gamma"])},
            }
    model = ConvNeXt(d_model=D, depths=DEPTHS)
    out = model.apply({"params": params}, jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------------
# MLP-Mixer
# ---------------------------------------------------------------------------

def test_mixer_full_parity():
    from vision_toolbox_tpu.models.mlp_mixer import MLPMixer

    D, LAYERS, PATCH, IMG = 16, 2, 8, 32
    N = (IMG // PATCH) ** 2
    tok_dim, ch_dim = D // 2, 4 * D
    pw, pb = g(D, 3, PATCH, PATCH), g(D)
    final_ln = (g(D) + 1, g(D))

    def rand_block():
        return {
            "ln1": (g(D) + 1, g(D)), "ln2": (g(D) + 1, g(D)),
            "tok1_w": g(tok_dim, N), "tok1_b": g(tok_dim),
            "tok2_w": g(N, tok_dim), "tok2_b": g(N),
            "ch1_w": g(ch_dim, D), "ch1_b": g(ch_dim),
            "ch2_w": g(D, ch_dim), "ch2_b": g(D),
        }

    blocks = [rand_block() for _ in range(LAYERS)]
    x_np = np.random.default_rng(1).standard_normal((2, IMG, IMG, 3)).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        x = F.conv2d(x, pw, pb, stride=PATCH).flatten(2).transpose(1, 2)
        for p in blocks:
            y = _ln(x, *p["ln1"]).transpose(-1, -2)
            y = F.gelu(y @ p["tok1_w"].T + p["tok1_b"]) @ p["tok2_w"].T + p["tok2_b"]
            x = x + y.transpose(-1, -2)
            y = _ln(x, *p["ln2"])
            x = x + F.gelu(y @ p["ch1_w"].T + p["ch1_b"]) @ p["ch2_w"].T + p["ch2_b"]
        ref = _ln(x, *final_ln).mean(1).numpy()

    params = {
        "patch_embed": {"kernel": t(pw.permute(2, 3, 1, 0)), "bias": t(pb)},
        "norm": {"scale": t(final_ln[0]), "bias": t(final_ln[1])},
    }
    for i, p in enumerate(blocks):
        params[f"block_{i}"] = {
            "norm1": {"scale": t(p["ln1"][0]), "bias": t(p["ln1"][1])},
            "token_mixing": {
                "linear1": {"kernel": t(p["tok1_w"].T), "bias": t(p["tok1_b"])},
                "linear2": {"kernel": t(p["tok2_w"].T), "bias": t(p["tok2_b"])},
            },
            "norm2": {"scale": t(p["ln2"][0]), "bias": t(p["ln2"][1])},
            "channel_mixing": {
                "linear1": {"kernel": t(p["ch1_w"].T), "bias": t(p["ch1_b"])},
                "linear2": {"kernel": t(p["ch2_w"].T), "bias": t(p["ch2_b"])},
            },
        }
    model = MLPMixer(n_layers=LAYERS, d_model=D, patch_size=PATCH, img_size=IMG)
    out = model.apply({"params": params}, jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------------
# DeiT (dist token wiring)
# ---------------------------------------------------------------------------

def _rand_vit_block(d, heads):
    return {
        "ln1": (g(d) + 1, g(d)), "ln2": (g(d) + 1, g(d)),
        "q": (g(d, d), g(d)), "k": (g(d, d), g(d)), "v": (g(d, d), g(d)), "o": (g(d, d), g(d)),
        "fc1": (g(4 * d, d), g(4 * d)), "fc2": (g(d, 4 * d), g(d)),
        "heads": heads,
    }


def _vit_block_fwd(p, x, d):
    y = _ln(x, *p["ln1"])
    H = p["heads"]
    q = (y @ p["q"][0].T + p["q"][1]).unflatten(-1, (H, -1)).transpose(-2, -3)
    k = (y @ p["k"][0].T + p["k"][1]).unflatten(-1, (H, -1)).transpose(-2, -3)
    v = (y @ p["v"][0].T + p["v"][1]).unflatten(-1, (H, -1)).transpose(-2, -3)
    att = F.scaled_dot_product_attention(q, k, v).transpose(-2, -3).flatten(-2)
    x = x + att @ p["o"][0].T + p["o"][1]
    y = _ln(x, *p["ln2"])
    return x + F.gelu(y @ p["fc1"][0].T + p["fc1"][1]) @ p["fc2"][0].T + p["fc2"][1]


def _vit_block_to_jax(p):
    return {
        "mha_norm": {"scale": t(p["ln1"][0]), "bias": t(p["ln1"][1])},
        "mha": {
            "q_proj": {"kernel": t(p["q"][0].T), "bias": t(p["q"][1])},
            "k_proj": {"kernel": t(p["k"][0].T), "bias": t(p["k"][1])},
            "v_proj": {"kernel": t(p["v"][0].T), "bias": t(p["v"][1])},
            "out_proj": {"kernel": t(p["o"][0].T), "bias": t(p["o"][1])},
        },
        "mlp_norm": {"scale": t(p["ln2"][0]), "bias": t(p["ln2"][1])},
        "mlp": {
            "linear1": {"kernel": t(p["fc1"][0].T), "bias": t(p["fc1"][1])},
            "linear2": {"kernel": t(p["fc2"][0].T), "bias": t(p["fc2"][1])},
        },
    }


def test_deit_full_parity():
    from vision_toolbox_tpu.models.deit import DeiT

    D, HEADS, DEPTH, PATCH, IMG = 16, 2, 2, 8, 32
    N = (IMG // PATCH) ** 2
    pw, pb = g(D, 3, PATCH, PATCH), g(D)
    pe, cls, dist = g(1, N, D), g(1, 1, D), g(1, 1, D)
    final_ln = (g(D) + 1, g(D))
    blocks = [_rand_vit_block(D, HEADS) for _ in range(DEPTH)]

    x_np = np.random.default_rng(2).standard_normal((2, IMG, IMG, 3)).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        out = F.conv2d(x, pw, pb, stride=PATCH).flatten(2).transpose(1, 2)
        B = out.shape[0]
        out = torch.cat([cls.expand(B, -1, -1), dist.expand(B, -1, -1), out + pe], 1)
        for p in blocks:
            out = _vit_block_fwd(p, out, D)
        ref = _ln(out[:, :2], *final_ln).mean(1).numpy()

    params = {
        "patch_embed": {"kernel": t(pw.permute(2, 3, 1, 0)), "bias": t(pb)},
        "pe": t(pe), "cls_token": t(cls), "dist_token": t(dist),
        "norm": {"scale": t(final_ln[0]), "bias": t(final_ln[1])},
    }
    for i, p in enumerate(blocks):
        params[f"block_{i}"] = _vit_block_to_jax(p)
    model = DeiT(d_model=D, depth=DEPTH, n_heads=HEADS, patch_size=PATCH, img_size=IMG)
    out = model.apply({"params": params}, jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------------
# CaiT (talking-head SA + class-attention wiring)
# ---------------------------------------------------------------------------

def test_cait_full_parity():
    from vision_toolbox_tpu.models.cait import CaiT

    D, HEADS, SA, CA, PATCH, IMG = 16, 2, 1, 2, 8, 32
    N = (IMG // PATCH) ** 2
    pw, pb = g(D, 3, PATCH, PATCH), g(D)
    pe, cls = g(1, N, D), g(1, 1, D)
    final_ln = (g(D) + 1, g(D))

    def rand_sa():
        p = _rand_vit_block(D, HEADS)
        p.update(
            pl=(g(HEADS, HEADS), g(HEADS)), pwm=(g(HEADS, HEADS), g(HEADS)),
            g1=g(D), g2=g(D),
        )
        return p

    def rand_ca():
        p = _rand_vit_block(D, HEADS)
        p.update(g1=g(D), g2=g(D))
        return p

    sa_blocks = [rand_sa() for _ in range(SA)]
    ca_blocks = [rand_ca() for _ in range(CA)]

    def sa_fwd(p, x):
        y = _ln(x, *p["ln1"])
        H = HEADS
        q = (y @ p["q"][0].T + p["q"][1]).unflatten(-1, (H, -1)).transpose(-2, -3)
        k = (y @ p["k"][0].T + p["k"][1]).unflatten(-1, (H, -1)).transpose(-2, -3)
        v = (y @ p["v"][0].T + p["v"][1]).unflatten(-1, (H, -1)).transpose(-2, -3)
        attn = q @ (k * (D // H) ** -0.5).transpose(-1, -2)
        attn = torch.einsum("bhqk,gh->bgqk", attn, p["pl"][0]) + p["pl"][1][None, :, None, None]
        attn = torch.softmax(attn, -1)
        attn = torch.einsum("bhqk,gh->bgqk", attn, p["pwm"][0]) + p["pwm"][1][None, :, None, None]
        att = (attn @ v).transpose(-2, -3).flatten(-2)
        x = x + (att @ p["o"][0].T + p["o"][1]) * p["g1"]
        y = _ln(x, *p["ln2"])
        return x + (F.gelu(y @ p["fc1"][0].T + p["fc1"][1]) @ p["fc2"][0].T + p["fc2"][1]) * p["g2"]

    def ca_fwd(p, patches, cls_tok):
        tokens = torch.cat([cls_tok, patches], 1)
        y = _ln(tokens, *p["ln1"])
        H = HEADS
        q = (y[:, :1] @ p["q"][0].T + p["q"][1]).unflatten(-1, (H, -1)).transpose(-2, -3)
        k = (y @ p["k"][0].T + p["k"][1]).unflatten(-1, (H, -1)).transpose(-2, -3)
        v = (y @ p["v"][0].T + p["v"][1]).unflatten(-1, (H, -1)).transpose(-2, -3)
        att = F.scaled_dot_product_attention(q, k, v).transpose(-2, -3).flatten(-2)
        cls_tok = cls_tok + (att @ p["o"][0].T + p["o"][1]) * p["g1"]
        y = _ln(cls_tok, *p["ln2"])
        return cls_tok + (F.gelu(y @ p["fc1"][0].T + p["fc1"][1]) @ p["fc2"][0].T + p["fc2"][1]) * p["g2"]

    x_np = np.random.default_rng(3).standard_normal((2, IMG, IMG, 3)).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(x_np.transpose(0, 3, 1, 2))
        patches = F.conv2d(x, pw, pb, stride=PATCH).flatten(2).transpose(1, 2) + pe
        for p in sa_blocks:
            patches = sa_fwd(p, patches)
        cls_tok = cls.expand(patches.shape[0], -1, -1)
        for p in ca_blocks:
            cls_tok = ca_fwd(p, patches, cls_tok)
        ref = _ln(cls_tok[:, 0], *final_ln).numpy()

    params = {
        "patch_embed": {"kernel": t(pw.permute(2, 3, 1, 0)), "bias": t(pb)},
        "pe": t(pe), "cls_token": t(cls),
        "norm": {"scale": t(final_ln[0]), "bias": t(final_ln[1])},
    }
    for i, p in enumerate(sa_blocks):
        b = _vit_block_to_jax(p)
        b["mha"].update(
            proj_l_kernel=t(p["pl"][0]), proj_l_bias=t(p["pl"][1]),
            proj_w_kernel=t(p["pwm"][0]), proj_w_bias=t(p["pwm"][1]),
        )
        b["mha_scale"] = {"gamma": t(p["g1"])}
        b["mlp_scale"] = {"gamma": t(p["g2"])}
        params[f"sa_block_{i}"] = b
    for i, p in enumerate(ca_blocks):
        b = _vit_block_to_jax(p)
        b["mha_scale"] = {"gamma": t(p["g1"])}
        b["mlp_scale"] = {"gamma": t(p["g2"])}
        params[f"ca_block_{i}"] = b

    model = CaiT(d_model=D, sa_depth=SA, ca_depth=CA, n_heads=HEADS, patch_size=PATCH, img_size=IMG)
    out = model.apply({"params": params}, jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=5e-4)
