"""load_pretrained for the official-checkpoint families (DeiT/DeiT3/CaiT/
Swin/ConvNeXt), offline: synthesize the official torch state-dict layout
(matching FB/MS release key names, ref deit.py:71-115, cait.py:180-230,
swin.py:216-263, convnext.py:156-191), save it into the download cache as a
real torch zip .pth, and run the full download→read→convert→apply path.

Structure is checked against model.init (every path + shape must match), and
a forward pass must produce finite outputs of the right shape.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vision_toolbox_tpu.utils.checkpoint import flatten_tree

rng = np.random.default_rng(0)


def _f(*shape):
    return torch.from_numpy(rng.standard_normal(shape, dtype=np.float32) * 0.02)


@pytest.fixture()
def cache(tmp_path, monkeypatch):
    monkeypatch.setenv("VTT_CACHE_DIR", str(tmp_path))
    return tmp_path


def _assert_same_structure(converted, initialized):
    a = {k: v.shape for k, v in flatten_tree(converted).items()}
    b = {k: v.shape for k, v in flatten_tree(initialized).items()}
    assert a == b, (
        f"missing={sorted(set(b) - set(a))[:6]} extra={sorted(set(a) - set(b))[:6]} "
        f"shape_mismatch={[(k, a[k], b[k]) for k in a.keys() & b.keys() if a[k] != b[k]][:6]}"
    )


def _vit_block_sd(sd, p, d, layer_scale=False, talking_heads=0):
    sd[f"{p}.norm1.weight"], sd[f"{p}.norm1.bias"] = _f(d), _f(d)
    sd[f"{p}.attn.qkv.weight"] = _f(3 * d, d)
    sd[f"{p}.attn.qkv.bias"] = _f(3 * d)
    sd[f"{p}.attn.proj.weight"], sd[f"{p}.attn.proj.bias"] = _f(d, d), _f(d)
    if talking_heads:
        h = talking_heads
        sd[f"{p}.attn.proj_l.weight"], sd[f"{p}.attn.proj_l.bias"] = _f(h, h, 1, 1), _f(h)
        sd[f"{p}.attn.proj_w.weight"], sd[f"{p}.attn.proj_w.bias"] = _f(h, h, 1, 1), _f(h)
    sd[f"{p}.norm2.weight"], sd[f"{p}.norm2.bias"] = _f(d), _f(d)
    sd[f"{p}.mlp.fc1.weight"], sd[f"{p}.mlp.fc1.bias"] = _f(4 * d, d), _f(4 * d)
    sd[f"{p}.mlp.fc2.weight"], sd[f"{p}.mlp.fc2.bias"] = _f(d, 4 * d), _f(d)
    if layer_scale:
        sd[f"{p}.gamma_1"], sd[f"{p}.gamma_2"] = _f(d), _f(d)


def _run(name, variables_expected_model, img_size=224, **kw):
    from vision_toolbox_tpu.models.pretrained import load_pretrained

    model, variables = load_pretrained(name, img_size=img_size, **kw)
    init = variables_expected_model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, img_size, img_size, 3)),
        train=False,
    )
    _assert_same_structure(variables, init)
    out = model.apply(variables, jnp.zeros((2, img_size, img_size, 3)), train=False)
    assert np.all(np.isfinite(np.asarray(out, np.float32)))
    return model, out


def test_load_pretrained_deit_official(cache):
    from vision_toolbox_tpu.models.pretrained import DEIT_CKPTS

    d, depth, n_patch = 192, 12, (224 // 16) ** 2
    sd = {
        "patch_embed.proj.weight": _f(d, 3, 16, 16),
        "patch_embed.proj.bias": _f(d),
        "pos_embed": _f(1, 2 + n_patch, d),
        "cls_token": _f(1, 1, d),
        "dist_token": _f(1, 1, d),
        "norm.weight": _f(d),
        "norm.bias": _f(d),
        "head.weight": _f(10, d),
        "head.bias": _f(10),
        "head_dist.weight": _f(10, d),
        "head_dist.bias": _f(10),
    }
    for i in range(depth):
        _vit_block_sd(sd, f"blocks.{i}", d)
    torch.save({"model": sd}, cache / DEIT_CKPTS[("deit_ti_16", 224)])

    from vision_toolbox_tpu import create_backbone

    _, out = _run("deit_ti_16", create_backbone("deit_ti_16"))
    assert out.shape == (2, d)


def test_load_pretrained_deit3_official(cache):
    from vision_toolbox_tpu.models.pretrained import DEIT3_CKPTS

    d, depth, n_patch = 384, 12, (224 // 16) ** 2
    sd = {
        "patch_embed.proj.weight": _f(d, 3, 16, 16),
        "patch_embed.proj.bias": _f(d),
        "pos_embed": _f(1, 1 + n_patch, d),  # deit3 PE covers (cls, patches)
        "cls_token": _f(1, 1, d),
        "norm.weight": _f(d),
        "norm.bias": _f(d),
        "head.weight": _f(10, d),
        "head.bias": _f(10),
    }
    for i in range(depth):
        _vit_block_sd(sd, f"blocks.{i}", d, layer_scale=True)
    torch.save({"model": sd}, cache / DEIT3_CKPTS[("deit3_s_16", 224)])

    from vision_toolbox_tpu import create_backbone

    _, out = _run("deit3_s_16", create_backbone("deit3_s_16"))
    assert out.shape == (2, d)


def test_load_pretrained_cait_official(cache):
    from vision_toolbox_tpu.models.pretrained import CAIT_CKPTS

    d, sa_depth, heads, n_patch = 192, 24, 4, (224 // 16) ** 2
    sd = {
        "module.patch_embed.proj.weight": _f(d, 3, 16, 16),
        "module.patch_embed.proj.bias": _f(d),
        "module.pos_embed": _f(1, n_patch, d),
        "module.cls_token": _f(1, 1, d),
        "module.norm.weight": _f(d),
        "module.norm.bias": _f(d),
        "module.head.weight": _f(10, d),
        "module.head.bias": _f(10),
    }
    for i in range(sa_depth):
        _vit_block_sd(sd, f"module.blocks.{i}", d, layer_scale=True, talking_heads=heads)
    for i in range(2):
        p = f"module.blocks_token_only.{i}"
        for proj in ("q", "k", "v", "proj"):
            sd[f"{p}.attn.{proj}.weight"] = _f(d, d)
            sd[f"{p}.attn.{proj}.bias"] = _f(d)
        sd[f"{p}.norm1.weight"], sd[f"{p}.norm1.bias"] = _f(d), _f(d)
        sd[f"{p}.norm2.weight"], sd[f"{p}.norm2.bias"] = _f(d), _f(d)
        sd[f"{p}.mlp.fc1.weight"], sd[f"{p}.mlp.fc1.bias"] = _f(4 * d, d), _f(4 * d)
        sd[f"{p}.mlp.fc2.weight"], sd[f"{p}.mlp.fc2.bias"] = _f(d, 4 * d), _f(d)
        sd[f"{p}.gamma_1"], sd[f"{p}.gamma_2"] = _f(d), _f(d)
    torch.save({"model": sd}, cache / CAIT_CKPTS[("cait_xxs_24", 224)])

    from vision_toolbox_tpu import create_backbone

    _, out = _run("cait_xxs_24", create_backbone("cait_xxs_24"))
    assert out.shape == (2, d)


def test_load_pretrained_swin_official(cache):
    from vision_toolbox_tpu.models.pretrained import SWIN_CKPTS

    d_model, n_heads, depths, window = 96, 3, (2, 2, 6, 2), 7
    sd = {
        "patch_embed.proj.weight": _f(d_model, 3, 4, 4),
        "patch_embed.proj.bias": _f(d_model),
        "patch_embed.norm.weight": _f(d_model),
        "patch_embed.norm.bias": _f(d_model),
        "norm.weight": _f(8 * d_model),
        "norm.bias": _f(8 * d_model),
        "head.weight": _f(10, 8 * d_model),
        "head.bias": _f(10),
    }
    for s, depth in enumerate(depths):
        d, h = d_model * 2**s, n_heads * 2**s
        if s > 0:
            sd[f"layers.{s-1}.downsample.norm.weight"] = _f(2 * d)
            sd[f"layers.{s-1}.downsample.norm.bias"] = _f(2 * d)
            sd[f"layers.{s-1}.downsample.reduction.weight"] = _f(d, 2 * d)
        for b in range(depth):
            p = f"layers.{s}.blocks.{b}"
            _vit_block_sd(sd, p, d)
            sd[f"{p}.attn.relative_position_bias_table"] = _f((2 * window - 1) ** 2, h)
            sd[f"{p}.attn.relative_position_index"] = torch.zeros(
                (window**2, window**2), dtype=torch.int64
            )
    torch.save({"model": sd}, cache / SWIN_CKPTS["swin_t"].rsplit("/", 1)[-1])

    from vision_toolbox_tpu import create_backbone

    _, out = _run("swin_t", create_backbone("swin_t"))
    assert out.shape[0] == 2 and out.shape[-1] == 8 * d_model


def _convnext_sd(d_model, depths, v2):
    sd = {
        "downsample_layers.0.0.weight": _f(d_model, 3, 4, 4),
        "downsample_layers.0.0.bias": _f(d_model),
        "downsample_layers.0.1.weight": _f(d_model),
        "downsample_layers.0.1.bias": _f(d_model),
        "head.weight": _f(10, d_model * 2 ** (len(depths) - 1)),
        "head.bias": _f(10),
    }
    if not v2:
        dd = d_model * 2 ** (len(depths) - 1)
        sd["norm.weight"], sd["norm.bias"] = _f(dd), _f(dd)
    for s, depth in enumerate(depths):
        d = d_model * 2**s
        if s > 0:
            sd[f"downsample_layers.{s}.0.weight"] = _f(d // 2)
            sd[f"downsample_layers.{s}.0.bias"] = _f(d // 2)
            sd[f"downsample_layers.{s}.1.weight"] = _f(d, d // 2, 2, 2)
            sd[f"downsample_layers.{s}.1.bias"] = _f(d)
        for b in range(depth):
            p = f"stages.{s}.{b}"
            sd[f"{p}.dwconv.weight"], sd[f"{p}.dwconv.bias"] = _f(d, 1, 7, 7), _f(d)
            sd[f"{p}.norm.weight"], sd[f"{p}.norm.bias"] = _f(d), _f(d)
            sd[f"{p}.pwconv1.weight"], sd[f"{p}.pwconv1.bias"] = _f(4 * d, d), _f(4 * d)
            sd[f"{p}.pwconv2.weight"], sd[f"{p}.pwconv2.bias"] = _f(d, 4 * d), _f(d)
            if v2:
                sd[f"{p}.grn.gamma"] = _f(1, 1, 1, 4 * d)
                sd[f"{p}.grn.beta"] = _f(1, 1, 1, 4 * d)
            else:
                sd[f"{p}.gamma"] = _f(d)
    return sd


def test_load_pretrained_convnextv2_official(cache):
    """FCMAE checkpoint: no head norm in the state dict (convnext.py:186-191)."""
    from vision_toolbox_tpu import create_backbone
    from vision_toolbox_tpu.models.pretrained import CONVNEXT_CKPTS

    model = create_backbone("convnextv2_a")
    sd = _convnext_sd(model.d_model, model.depths, v2=True)
    torch.save({"model": sd}, cache / CONVNEXT_CKPTS["convnextv2_a"])

    from vision_toolbox_tpu.models.pretrained import load_pretrained

    model2, variables = load_pretrained("convnextv2_a")
    # FCMAE ckpts lack the final norm; load_pretrained fills the default init
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["norm"]["scale"]), 1.0
    )
    init = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3)), train=False
    )
    _assert_same_structure(variables, init)
    out = model2.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
    assert np.all(np.isfinite(np.asarray(out, np.float32)))


def test_load_pretrained_convnext_v1_official(cache):
    from vision_toolbox_tpu import create_backbone
    from vision_toolbox_tpu.models.pretrained import CONVNEXT_CKPTS

    model = create_backbone("convnext_t")
    sd = _convnext_sd(model.d_model, model.depths, v2=False)
    torch.save({"model": sd}, cache / CONVNEXT_CKPTS["convnext_t"])

    from vision_toolbox_tpu.models.pretrained import load_pretrained

    model2, variables = load_pretrained("convnext_t")
    out = model2.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
    assert out.shape[-1] == model.d_model * 2 ** (len(model.depths) - 1)
    assert np.all(np.isfinite(np.asarray(out, np.float32)))
