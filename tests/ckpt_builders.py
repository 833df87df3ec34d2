"""Synthetic official-layout checkpoint builders for EVERY family in
scripts/make_goldens.py's GOLDEN_SPECS (round-3 verdict item #7): plant one
checkpoint per pretrained family into the download cache so the egress-kit
dry run exercises the complete post-download pipeline — when egress finally
lands, one make_goldens run validates the whole URL table with no surprises.

Layouts mirror the official releases the converters were written against:
reference vision-toolbox release .pth (darknet.py:17, vovnet.py:121-134),
AugReg/SigLIP/Mixer flax .npz (vit.py:189-207, mlp_mixer.py:73-81),
FB DeiT/CaiT (deit.py:59-65, cait.py:161-173), MS Swin (swin.py:193-200),
FB ConvNeXt (convnext.py:131-150), and torchvision IMAGENET1K_V1
(torchvision_models.py:23-55).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent))

from test_model_parity import _make_cna  # reference ConvNormAct layout
from test_pretrained_official import _convnext_sd, _f, _vit_block_sd
from test_pretrained_torchvision import _bn, _cbn, _se

rng = np.random.default_rng(7)


def _fnp(*shape):
    return rng.standard_normal(shape, dtype=np.float32) * 0.02


# ---------------- reference-release conv backbones (.pth) ----------------

def plant_darknet19(cache):
    from vision_toolbox_tpu.models.pretrained import BACKBONE_CKPTS

    r = np.random.default_rng(0)
    sd: dict = {}
    _make_cna(r, "stem", 3, 32, 3, sd)
    in_c = 32
    for i, (n, out_c) in enumerate(zip((0, 1, 1, 2, 2), (64, 128, 256, 512, 1024))):
        if n == 0:
            _make_cna(r, f"stages.{i}", in_c, out_c, 3, sd)
        else:
            _make_cna(r, f"stages.{i}.conv", in_c, out_c, 3, sd)
            for j in range(n):
                _make_cna(r, f"stages.{i}.blocks.{j}.conv1", out_c, out_c // 2, 1, sd)
                _make_cna(r, f"stages.{i}.blocks.{j}.conv2", out_c // 2, out_c, 3, sd)
        in_c = out_c
    torch.save(sd, cache / BACKBONE_CKPTS["darknet19"])


def plant_cspdarknet53(cache):
    from vision_toolbox_tpu.models.darknet import _DARKNET_VARIANTS
    from vision_toolbox_tpu.models.pretrained import BACKBONE_CKPTS

    n_blocks_list, _ = _DARKNET_VARIANTS["cspdarknet53"]
    r = np.random.default_rng(1)
    sd: dict = {}
    _make_cna(r, "stem", 3, 32, 3, sd)
    in_c = 32
    for i, (n, out_c) in enumerate(zip(n_blocks_list, (64, 128, 256, 512, 1024))):
        _make_cna(r, f"stages.{i}.conv", in_c, out_c, 3, sd)
        half = out_c // 2
        _make_cna(r, f"stages.{i}.conv1", out_c, half, 1, sd)
        _make_cna(r, f"stages.{i}.conv2", out_c, half, 1, sd)
        for j in range(n):
            _make_cna(r, f"stages.{i}.blocks.{j}.conv1", half, half, 1, sd)
            _make_cna(r, f"stages.{i}.blocks.{j}.conv2", half, half, 3, sd)
        _make_cna(r, f"stages.{i}.out_conv", out_c, out_c, 1, sd)
        in_c = out_c
    torch.save(sd, cache / BACKBONE_CKPTS["cspdarknet53"])


def plant_vovnet39(cache):
    from vision_toolbox_tpu.models.pretrained import BACKBONE_CKPTS
    from vision_toolbox_tpu.models.vovnet import _VOVNET_TABLES

    n_blocks_list, n_layers_list = _VOVNET_TABLES[39]
    mid_list, out_list = (128, 160, 192, 224), (256, 512, 768, 1024)
    r = np.random.default_rng(2)
    sd: dict = {}
    _make_cna(r, "stem.0", 3, 64, 3, sd)
    _make_cna(r, "stem.1", 64, 64, 3, sd)
    _make_cna(r, "stem.2", 64, 128, 3, sd)
    in_c = 128
    for i, (n, mid, L, out_c) in enumerate(
        zip(n_blocks_list, mid_list, n_layers_list, out_list)
    ):
        for j in range(n):
            cin = in_c
            for k in range(L):
                _make_cna(r, f"stages.{i}.module_{j}.convs.{k}", cin, mid, 3, sd)
                cin = mid
            _make_cna(r, f"stages.{i}.module_{j}.out_conv", in_c + mid * L, out_c, 1, sd)
            in_c = out_c
    torch.save(sd, cache / BACKBONE_CKPTS["vovnet39"])


# ---------------- flax .npz families ----------------

def _augreg_npz(d, depth, heads, patch, img):
    n = (img // patch) ** 2
    w = {
        "cls": _fnp(1, 1, d),
        "Transformer/posembed_input/pos_embedding": _fnp(1, n + 1, d),
        "embedding/kernel": _fnp(patch, patch, 3, d),
        "embedding/bias": _fnp(d),
        "Transformer/encoder_norm/scale": _fnp(d),
        "Transformer/encoder_norm/bias": _fnp(d),
    }
    for i in range(depth):
        p = f"Transformer/encoderblock_{i}"
        for ln in ("LayerNorm_0", "LayerNorm_2"):
            w[f"{p}/{ln}/scale"], w[f"{p}/{ln}/bias"] = _fnp(d), _fnp(d)
        for nm in ("query", "key", "value"):
            w[f"{p}/MultiHeadDotProductAttention_1/{nm}/kernel"] = _fnp(d, heads, d // heads)
            w[f"{p}/MultiHeadDotProductAttention_1/{nm}/bias"] = _fnp(heads, d // heads)
        w[f"{p}/MultiHeadDotProductAttention_1/out/kernel"] = _fnp(heads, d // heads, d)
        w[f"{p}/MultiHeadDotProductAttention_1/out/bias"] = _fnp(d)
        w[f"{p}/MlpBlock_3/Dense_0/kernel"] = _fnp(d, 4 * d)
        w[f"{p}/MlpBlock_3/Dense_0/bias"] = _fnp(4 * d)
        w[f"{p}/MlpBlock_3/Dense_1/kernel"] = _fnp(4 * d, d)
        w[f"{p}/MlpBlock_3/Dense_1/bias"] = _fnp(d)
    return w


def plant_vit_s_16_augreg(cache):
    from vision_toolbox_tpu.models.pretrained import AUGREG_CKPTS

    np.savez(cache / AUGREG_CKPTS["vit_s_16"], **_augreg_npz(384, 12, 6, 16, 224))


def plant_vit_b_16_siglip(cache):
    from vision_toolbox_tpu.models.pretrained import SIGLIP_CKPTS

    d, depth, heads, patch, img = 768, 12, 12, 16, 224
    n = (img // patch) ** 2
    p0 = "params/img/"
    w = {
        p0 + "pos_embedding": _fnp(1, n, d),
        p0 + "embedding/kernel": _fnp(patch, patch, 3, d),
        p0 + "embedding/bias": _fnp(d),
        p0 + "Transformer/encoder_norm/scale": _fnp(d),
        p0 + "Transformer/encoder_norm/bias": _fnp(d),
        p0 + "MAPHead_0/probe": _fnp(1, 1, d),
        p0 + "MAPHead_0/LayerNorm_0/scale": _fnp(d),
        p0 + "MAPHead_0/LayerNorm_0/bias": _fnp(d),
        p0 + "MAPHead_0/MlpBlock_0/Dense_0/kernel": _fnp(d, 4 * d),
        p0 + "MAPHead_0/MlpBlock_0/Dense_0/bias": _fnp(4 * d),
        p0 + "MAPHead_0/MlpBlock_0/Dense_1/kernel": _fnp(4 * d, d),
        p0 + "MAPHead_0/MlpBlock_0/Dense_1/bias": _fnp(d),
    }
    for nm in ("query", "key", "value"):
        w[p0 + f"MAPHead_0/MultiHeadDotProductAttention_0/{nm}/kernel"] = _fnp(d, heads, d // heads)
        w[p0 + f"MAPHead_0/MultiHeadDotProductAttention_0/{nm}/bias"] = _fnp(heads, d // heads)
    w[p0 + "MAPHead_0/MultiHeadDotProductAttention_0/out/kernel"] = _fnp(heads, d // heads, d)
    w[p0 + "MAPHead_0/MultiHeadDotProductAttention_0/out/bias"] = _fnp(d)
    for i in range(depth):
        p = p0 + f"Transformer/encoderblock_{i}"
        for ln in ("LayerNorm_0", "LayerNorm_1"):
            w[f"{p}/{ln}/scale"], w[f"{p}/{ln}/bias"] = _fnp(d), _fnp(d)
        for nm in ("query", "key", "value"):
            w[f"{p}/MultiHeadDotProductAttention_0/{nm}/kernel"] = _fnp(d, heads, d // heads)
            w[f"{p}/MultiHeadDotProductAttention_0/{nm}/bias"] = _fnp(heads, d // heads)
        w[f"{p}/MultiHeadDotProductAttention_0/out/kernel"] = _fnp(heads, d // heads, d)
        w[f"{p}/MultiHeadDotProductAttention_0/out/bias"] = _fnp(d)
        w[f"{p}/MlpBlock_0/Dense_0/kernel"] = _fnp(d, 4 * d)
        w[f"{p}/MlpBlock_0/Dense_0/bias"] = _fnp(4 * d)
        w[f"{p}/MlpBlock_0/Dense_1/kernel"] = _fnp(4 * d, d)
        w[f"{p}/MlpBlock_0/Dense_1/bias"] = _fnp(d)
    np.savez(cache / SIGLIP_CKPTS[("vit_b_16", 224)], **w)


def plant_mixer_b_16(cache):
    from vision_toolbox_tpu.models.pretrained import MIXER_CKPTS

    d, n_layers, patch, img = 768, 12, 16, 224
    n_tokens = (img // patch) ** 2
    td, cd = d // 2, 4 * d
    w = {
        "stem/kernel": _fnp(patch, patch, 3, d),
        "stem/bias": _fnp(d),
        "pre_head_layer_norm/scale": _fnp(d),
        "pre_head_layer_norm/bias": _fnp(d),
    }
    for i in range(n_layers):
        p = f"MixerBlock_{i}"
        for ln in ("LayerNorm_0", "LayerNorm_1"):
            w[f"{p}/{ln}/scale"], w[f"{p}/{ln}/bias"] = _fnp(d), _fnp(d)
        w[f"{p}/token_mixing/Dense_0/kernel"] = _fnp(n_tokens, td)
        w[f"{p}/token_mixing/Dense_0/bias"] = _fnp(td)
        w[f"{p}/token_mixing/Dense_1/kernel"] = _fnp(td, n_tokens)
        w[f"{p}/token_mixing/Dense_1/bias"] = _fnp(n_tokens)
        w[f"{p}/channel_mixing/Dense_0/kernel"] = _fnp(d, cd)
        w[f"{p}/channel_mixing/Dense_0/bias"] = _fnp(cd)
        w[f"{p}/channel_mixing/Dense_1/kernel"] = _fnp(cd, d)
        w[f"{p}/channel_mixing/Dense_1/bias"] = _fnp(d)
    # cached_download keys by URL basename
    np.savez(cache / MIXER_CKPTS["mixer_b_16"].rsplit("/", 1)[-1], **w)


# ---------------- FB/MS official .pth families ----------------

def plant_deit_ti_16(cache):
    from vision_toolbox_tpu.models.pretrained import DEIT_CKPTS

    d, depth, n_patch = 192, 12, (224 // 16) ** 2
    sd = {
        "patch_embed.proj.weight": _f(d, 3, 16, 16),
        "patch_embed.proj.bias": _f(d),
        "pos_embed": _f(1, 2 + n_patch, d),
        "cls_token": _f(1, 1, d),
        "dist_token": _f(1, 1, d),
        "norm.weight": _f(d), "norm.bias": _f(d),
        "head.weight": _f(10, d), "head.bias": _f(10),
        "head_dist.weight": _f(10, d), "head_dist.bias": _f(10),
    }
    for i in range(depth):
        _vit_block_sd(sd, f"blocks.{i}", d)
    torch.save({"model": sd}, cache / DEIT_CKPTS[("deit_ti_16", 224)])


def plant_deit3_s_16(cache):
    from vision_toolbox_tpu.models.pretrained import DEIT3_CKPTS

    d, depth, n_patch = 384, 12, (224 // 16) ** 2
    sd = {
        "patch_embed.proj.weight": _f(d, 3, 16, 16),
        "patch_embed.proj.bias": _f(d),
        "pos_embed": _f(1, 1 + n_patch, d),
        "cls_token": _f(1, 1, d),
        "norm.weight": _f(d), "norm.bias": _f(d),
        "head.weight": _f(10, d), "head.bias": _f(10),
    }
    for i in range(depth):
        _vit_block_sd(sd, f"blocks.{i}", d, layer_scale=True)
    torch.save({"model": sd}, cache / DEIT3_CKPTS[("deit3_s_16", 224)])


def plant_cait_xxs_24(cache):
    from vision_toolbox_tpu.models.pretrained import CAIT_CKPTS

    d, sa_depth, heads, n_patch = 192, 24, 4, (224 // 16) ** 2
    sd = {
        "module.patch_embed.proj.weight": _f(d, 3, 16, 16),
        "module.patch_embed.proj.bias": _f(d),
        "module.pos_embed": _f(1, n_patch, d),
        "module.cls_token": _f(1, 1, d),
        "module.norm.weight": _f(d), "module.norm.bias": _f(d),
        "module.head.weight": _f(10, d), "module.head.bias": _f(10),
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


def plant_swin_t(cache):
    from vision_toolbox_tpu.models.pretrained import SWIN_CKPTS

    d_model, n_heads, depths, window = 96, 3, (2, 2, 6, 2), 7
    sd = {
        "patch_embed.proj.weight": _f(d_model, 3, 4, 4),
        "patch_embed.proj.bias": _f(d_model),
        "patch_embed.norm.weight": _f(d_model),
        "patch_embed.norm.bias": _f(d_model),
        "norm.weight": _f(8 * d_model), "norm.bias": _f(8 * d_model),
        "head.weight": _f(10, 8 * d_model), "head.bias": _f(10),
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


def plant_convnext_t(cache):
    from vision_toolbox_tpu import create_backbone
    from vision_toolbox_tpu.models.pretrained import CONVNEXT_CKPTS

    model = create_backbone("convnext_t")
    torch.save({"model": _convnext_sd(model.d_model, model.depths, v2=False)},
               cache / CONVNEXT_CKPTS["convnext_t"])


def plant_convnextv2_a(cache):
    from vision_toolbox_tpu import create_backbone
    from vision_toolbox_tpu.models.pretrained import CONVNEXT_CKPTS

    model = create_backbone("convnextv2_a")
    torch.save({"model": _convnext_sd(model.d_model, model.depths, v2=True)},
               cache / CONVNEXT_CKPTS["convnextv2_a"])


# ---------------- torchvision IMAGENET1K_V1 families ----------------

def _plant_tv_bottleneck_resnet(cache, name, width_of):
    """Shared torchvision Bottleneck builder (resnet50/resnext layouts differ
    only in the grouped-conv2 width)."""
    from vision_toolbox_tpu import create_backbone
    from vision_toolbox_tpu.models.pretrained import TORCHVISION_CKPTS

    model = create_backbone(name)
    groups = model.groups
    sd: dict = {}
    _cbn(sd, "conv1", "bn1", 64, 3, 7)
    in_c = 64
    for i, depth in enumerate(model.depths):
        out = 256 * 2**i
        width = width_of(i)
        for j in range(depth):
            p = f"layer{i+1}.{j}"
            _cbn(sd, f"{p}.conv1", f"{p}.bn1", width, in_c if j == 0 else out, 1)
            sd[f"{p}.conv2.weight"] = _f(width, width // groups, 3, 3)
            _bn(sd, f"{p}.bn2", width)
            _cbn(sd, f"{p}.conv3", f"{p}.bn3", out, width, 1)
            if j == 0:
                _cbn(sd, f"{p}.downsample.0", f"{p}.downsample.1", out, in_c, 1)
        in_c = out
    sd["fc.weight"], sd["fc.bias"] = _f(1000, in_c), _f(1000)
    torch.save(sd, cache / TORCHVISION_CKPTS[name])


def plant_resnet50(cache):
    _plant_tv_bottleneck_resnet(cache, "resnet50", lambda i: 64 * 2**i)


def plant_resnext50_32x4d(cache):
    # torchvision: width = int(planes * (4/64)) * 32 = 128 * 2**i
    _plant_tv_bottleneck_resnet(cache, "resnext50_32x4d", lambda i: 128 * 2**i)


def plant_mobilenet_v3_large(cache):
    from vision_toolbox_tpu.models.mbconv import make_divisible
    from vision_toolbox_tpu.models.mobilenet import _LARGE
    from vision_toolbox_tpu.models.pretrained import TORCHVISION_CKPTS

    sd: dict = {}
    _cbn(sd, "features.0.0", "features.0.1", 16, 3, 3)
    in_c = 16
    for i, (k, exp, out, use_se, _act, _s) in enumerate(_LARGE):
        p = f"features.{i+1}"
        idx = 0
        if exp != in_c:
            _cbn(sd, f"{p}.block.{idx}.0", f"{p}.block.{idx}.1", exp, in_c, 1)
            idx += 1
        sd[f"{p}.block.{idx}.0.weight"] = _f(exp, 1, k, k)
        _bn(sd, f"{p}.block.{idx}.1", exp)
        idx += 1
        if use_se:
            _se(sd, f"{p}.block.{idx}", exp, make_divisible(exp // 4))
            idx += 1
        _cbn(sd, f"{p}.block.{idx}.0", f"{p}.block.{idx}.1", out, exp, 1)
        in_c = out
    n = len(_LARGE) + 1
    _cbn(sd, f"features.{n}.0", f"features.{n}.1", 960, 160, 1)
    sd["classifier.0.weight"], sd["classifier.0.bias"] = _f(1280, 960), _f(1280)
    sd["classifier.3.weight"], sd["classifier.3.bias"] = _f(1000, 1280), _f(1000)
    torch.save(sd, cache / TORCHVISION_CKPTS["mobilenet_v3_large"])


def plant_efficientnet_b0(cache):
    from vision_toolbox_tpu import create_backbone
    from vision_toolbox_tpu.models.pretrained import TORCHVISION_CKPTS

    model = create_backbone("efficientnet_b0")
    stages = model._stages()
    sd: dict = {}
    _cbn(sd, "features.0.0", "features.0.1", 32, 3, 3)
    in_c = 32
    for si, (expand, k, _s, ch, n) in enumerate(stages):
        for j in range(n):
            p = f"features.{si+1}.{j}"
            exp = in_c * expand
            idx = 0
            if expand != 1:
                _cbn(sd, f"{p}.block.{idx}.0", f"{p}.block.{idx}.1", exp, in_c, 1)
                idx += 1
            sd[f"{p}.block.{idx}.0.weight"] = _f(exp, 1, k, k)
            _bn(sd, f"{p}.block.{idx}.1", exp)
            idx += 1
            _se(sd, f"{p}.block.{idx}", exp, max(1, in_c // 4))
            idx += 1
            _cbn(sd, f"{p}.block.{idx}.0", f"{p}.block.{idx}.1", ch, exp, 1)
            in_c = ch
    n = len(stages) + 1
    _cbn(sd, f"features.{n}.0", f"features.{n}.1", 1280, 320, 1)
    sd["classifier.1.weight"], sd["classifier.1.bias"] = _f(1000, 1280), _f(1000)
    torch.save(sd, cache / TORCHVISION_CKPTS["efficientnet_b0"])


def _plant_regnet(cache, name):
    from vision_toolbox_tpu import create_backbone
    from vision_toolbox_tpu.models.pretrained import TORCHVISION_CKPTS

    model = create_backbone(name)
    se = model.se_ratio is not None
    sd: dict = {}
    _cbn(sd, "stem.0", "stem.1", 32, 3, 3)
    in_c = 32
    for i, (w, n, g) in enumerate(model._stage_config):
        for j in range(n):
            p = f"trunk_output.block{i+1}.block{i+1}-{j}"
            _cbn(sd, f"{p}.f.a.0", f"{p}.f.a.1", w, in_c, 1)
            groups = max(1, w // g)
            sd[f"{p}.f.b.0.weight"] = _f(w, w // groups, 3, 3)
            _bn(sd, f"{p}.f.b.1", w)
            if se:
                _se(sd, f"{p}.f.se", w, max(1, int(in_c * model.se_ratio)))
            _cbn(sd, f"{p}.f.c.0", f"{p}.f.c.1", w, w, 1)
            if j == 0 or in_c != w:
                _cbn(sd, f"{p}.proj.0", f"{p}.proj.1", w, in_c, 1)
            in_c = w
    sd["fc.weight"], sd["fc.bias"] = _f(1000, in_c), _f(1000)
    torch.save(sd, cache / TORCHVISION_CKPTS[name])


def plant_regnet_y_400mf(cache):
    _plant_regnet(cache, "regnet_y_400mf")


def plant_regnet_x_400mf(cache):
    _plant_regnet(cache, "regnet_x_400mf")


# keys = (name, kwargs-tag) matching scripts/make_goldens.py GOLDEN_SPECS
PLANTERS = {
    "darknet19": plant_darknet19,
    "cspdarknet53": plant_cspdarknet53,
    "vovnet39": plant_vovnet39,
    "vit_s_16": plant_vit_s_16_augreg,
    "vit_b_16_siglip": plant_vit_b_16_siglip,
    "mixer_b_16": plant_mixer_b_16,
    "deit_ti_16": plant_deit_ti_16,
    "deit3_s_16": plant_deit3_s_16,
    "cait_xxs_24": plant_cait_xxs_24,
    "swin_t": plant_swin_t,
    "convnext_t": plant_convnext_t,
    "convnextv2_a": plant_convnextv2_a,
    "resnet50": plant_resnet50,
    "resnext50_32x4d": plant_resnext50_32x4d,
    "mobilenet_v3_large": plant_mobilenet_v3_large,
    "efficientnet_b0": plant_efficientnet_b0,
    "regnet_y_400mf": plant_regnet_y_400mf,
    "regnet_x_400mf": plant_regnet_x_400mf,
}


def plant(tag: str, cache) -> None:
    PLANTERS[tag](cache)
