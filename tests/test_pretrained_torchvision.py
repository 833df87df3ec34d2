"""load_pretrained for the torchvision-checkpoint families (ResNet/RegNet/
MobileNetV3/EfficientNet — the reference's extractor backbones load these via
pretrained=True, torchvision_models.py:23-55), offline: synthesize the
torchvision state-dict layout, save it into the download cache as a real
torch zip .pth, and run download→read→convert→apply with structure checks
against model.init."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vision_toolbox_tpu.utils.checkpoint import flatten_tree

rng = np.random.default_rng(0)


def _f(*shape):
    return torch.from_numpy(rng.standard_normal(shape, dtype=np.float32) * 0.05)


@pytest.fixture()
def cache(tmp_path, monkeypatch):
    monkeypatch.setenv("VTT_CACHE_DIR", str(tmp_path))
    return tmp_path


def _bn(sd, prefix, c):
    sd[f"{prefix}.weight"] = _f(c) + 1.0
    sd[f"{prefix}.bias"] = _f(c)
    sd[f"{prefix}.running_mean"] = _f(c)
    sd[f"{prefix}.running_var"] = torch.abs(_f(c)) + 0.5
    sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0)


def _cbn(sd, conv, bn, out_c, in_c, k):
    sd[f"{conv}.weight"] = _f(out_c, in_c, k, k)
    _bn(sd, bn, out_c)


def _se(sd, prefix, channels, squeeze):
    sd[f"{prefix}.fc1.weight"] = _f(squeeze, channels, 1, 1)
    sd[f"{prefix}.fc1.bias"] = _f(squeeze)
    sd[f"{prefix}.fc2.weight"] = _f(channels, squeeze, 1, 1)
    sd[f"{prefix}.fc2.bias"] = _f(channels)


def _run(name, img=64):
    from vision_toolbox_tpu import create_backbone
    from vision_toolbox_tpu.models.pretrained import load_pretrained

    model, variables = load_pretrained(name)
    init = create_backbone(name).init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, img, img, 3)), train=False
    )
    a = {k: v.shape for k, v in flatten_tree(variables).items()}
    b = {k: v.shape for k, v in flatten_tree(init).items()}
    assert a == b, (
        f"missing={sorted(set(b)-set(a))[:5]} extra={sorted(set(a)-set(b))[:5]} "
        f"mismatch={[(k, a[k], b[k]) for k in a.keys() & b.keys() if a[k] != b[k]][:5]}"
    )
    feats = model.apply(variables, jnp.zeros((2, img, img, 3)), train=False, method="get_feature_maps")
    assert len(feats) == len(model.out_channels_list)
    for f_, c in zip(feats, model.out_channels_list):
        assert f_.shape[-1] == c
    assert all(np.all(np.isfinite(np.asarray(f_, np.float32))) for f_ in feats)
    return model, variables


def test_load_pretrained_resnet18(cache):
    from vision_toolbox_tpu.models.pretrained import TORCHVISION_CKPTS

    sd: dict = {}
    _cbn(sd, "conv1", "bn1", 64, 3, 7)
    in_c = 64
    for i, depth in enumerate((2, 2, 2, 2)):
        out = 64 * 2**i
        for j in range(depth):
            p = f"layer{i+1}.{j}"
            _cbn(sd, f"{p}.conv1", f"{p}.bn1", out, in_c if j == 0 else out, 3)
            _cbn(sd, f"{p}.conv2", f"{p}.bn2", out, out, 3)
            if j == 0 and (i > 0):
                _cbn(sd, f"{p}.downsample.0", f"{p}.downsample.1", out, in_c, 1)
        in_c = out
    sd["fc.weight"], sd["fc.bias"] = _f(1000, 512), _f(1000)
    torch.save(sd, cache / TORCHVISION_CKPTS["resnet18"])
    _, variables = _run("resnet18")
    np.testing.assert_allclose(
        np.asarray(variables["params"]["stem"]["conv"]["kernel"]),
        sd["conv1.weight"].numpy().transpose(2, 3, 1, 0),
    )


def test_load_pretrained_resnet50(cache):
    from vision_toolbox_tpu.models.pretrained import TORCHVISION_CKPTS

    sd: dict = {}
    _cbn(sd, "conv1", "bn1", 64, 3, 7)
    in_c = 64
    for i, depth in enumerate((3, 4, 6, 3)):
        out = 256 * 2**i
        mid = out // 4
        for j in range(depth):
            p = f"layer{i+1}.{j}"
            _cbn(sd, f"{p}.conv1", f"{p}.bn1", mid, in_c if j == 0 else out, 1)
            _cbn(sd, f"{p}.conv2", f"{p}.bn2", mid, mid, 3)
            _cbn(sd, f"{p}.conv3", f"{p}.bn3", out, mid, 1)
            if j == 0:
                _cbn(sd, f"{p}.downsample.0", f"{p}.downsample.1", out, in_c, 1)
        in_c = out
    sd["fc.weight"], sd["fc.bias"] = _f(1000, 2048), _f(1000)
    torch.save(sd, cache / TORCHVISION_CKPTS["resnet50"])
    _run("resnet50")


def test_load_pretrained_mobilenet_v3_small(cache):
    from vision_toolbox_tpu.models.mbconv import make_divisible
    from vision_toolbox_tpu.models.mobilenet import _SMALL
    from vision_toolbox_tpu.models.pretrained import TORCHVISION_CKPTS

    sd: dict = {}
    _cbn(sd, "features.0.0", "features.0.1", 16, 3, 3)
    in_c = 16
    for i, (k, exp, out, use_se, _act, _s) in enumerate(_SMALL):
        p = f"features.{i+1}"
        idx = 0
        if exp != in_c:
            _cbn(sd, f"{p}.block.{idx}.0", f"{p}.block.{idx}.1", exp, in_c, 1)
            idx += 1
        sd[f"{p}.block.{idx}.0.weight"] = _f(exp, 1, k, k)  # depthwise
        _bn(sd, f"{p}.block.{idx}.1", exp)
        idx += 1
        if use_se:
            _se(sd, f"{p}.block.{idx}", exp, make_divisible(exp // 4))
            idx += 1
        _cbn(sd, f"{p}.block.{idx}.0", f"{p}.block.{idx}.1", out, exp, 1)
        in_c = out
    n = len(_SMALL) + 1
    _cbn(sd, f"features.{n}.0", f"features.{n}.1", 576, 96, 1)
    sd["classifier.0.weight"], sd["classifier.0.bias"] = _f(1024, 576), _f(1024)
    sd["classifier.3.weight"], sd["classifier.3.bias"] = _f(1000, 1024), _f(1000)
    torch.save(sd, cache / TORCHVISION_CKPTS["mobilenet_v3_small"])
    _run("mobilenet_v3_small")


def test_load_pretrained_efficientnet_b0(cache):
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
    _run("efficientnet_b0")


@pytest.mark.parametrize("name", ["regnet_x_400mf", "regnet_y_400mf"])
def test_load_pretrained_regnet(cache, name):
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
    _run(name)
