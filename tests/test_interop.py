"""Checkpoint interop tests: torch-free .pth reading, reference-layout →
JAX tree conversion (structure validated against model.init), flax .npz
ingestion, and npz save/load round-trip."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vision_toolbox_tpu import create_backbone
from vision_toolbox_tpu.utils.checkpoint import (
    extract_backbone,
    flatten_tree,
    load_params_npz,
    save_params_npz,
)
from vision_toolbox_tpu.utils.torch_pth import load_pth


def _tree_shapes(tree):
    return {k: v.shape for k, v in flatten_tree(tree).items()}


def _assert_same_structure(converted, initialized):
    a, b = _tree_shapes(converted), _tree_shapes(initialized)
    assert a == b, (
        f"missing={sorted(set(b) - set(a))[:6]} extra={sorted(set(a) - set(b))[:6]} "
        f"shape_mismatch={[(k, a[k], b[k]) for k in a.keys() & b.keys() if a[k] != b[k]][:6]}"
    )


# ---------------------------------------------------------------------------
# torch-free .pth reader
# ---------------------------------------------------------------------------

def test_load_pth_roundtrip(tmp_path):
    sd = {
        "a.weight": torch.randn(4, 3, 3, 3),
        "b.bias": torch.randn(7),
        "c.half": torch.randn(5).half(),
        "d.bf16": torch.randn(6).bfloat16(),
        "e.long": torch.arange(5),
        "f.noncontig": torch.randn(6, 8).t(),
        "g.scalar": torch.tensor(3.5),
    }
    path = tmp_path / "ckpt.pth"
    torch.save(sd, path)
    loaded = load_pth(str(path))
    assert set(loaded) == set(sd)
    for k in sd:
        ref = sd[k].float() if sd[k].dtype == torch.bfloat16 else sd[k]
        np.testing.assert_allclose(np.asarray(loaded[k]), ref.numpy(), rtol=0, atol=0)


def test_load_pth_nested(tmp_path):
    obj = {"model": {"x": torch.ones(2, 2)}, "epoch": 3}
    path = tmp_path / "nested.pth"
    torch.save(obj, path)
    loaded = load_pth(str(path))
    assert loaded["epoch"] == 3
    np.testing.assert_array_equal(loaded["model"]["x"], np.ones((2, 2)))


# ---------------------------------------------------------------------------
# reference-layout converters: structure must match model.init exactly
# ---------------------------------------------------------------------------

def _fake_cna(prefix, in_c, out_c, k, bias=False):
    rng = np.random.default_rng(abs(hash(prefix)) % 2**32)
    sd = {f"{prefix}.conv.weight": rng.standard_normal((out_c, in_c, k, k), dtype=np.float32)}
    sd[f"{prefix}.norm.weight"] = rng.standard_normal(out_c).astype(np.float32)
    sd[f"{prefix}.norm.bias"] = rng.standard_normal(out_c).astype(np.float32)
    sd[f"{prefix}.norm.running_mean"] = rng.standard_normal(out_c).astype(np.float32)
    sd[f"{prefix}.norm.running_var"] = rng.random(out_c).astype(np.float32) + 0.5
    sd[f"{prefix}.norm.num_batches_tracked"] = np.asarray(0)
    return sd


def test_convert_darknet19_structure():
    from vision_toolbox_tpu.models.darknet import _DARKNET_VARIANTS
    from vision_toolbox_tpu.utils.torch_interop import convert_darknet

    n_blocks_list, csp = _DARKNET_VARIANTS["darknet19"]
    stage_configs = tuple(zip(n_blocks_list, (64, 128, 256, 512, 1024)))
    sd = _fake_cna("stem", 3, 32, 3)
    in_c = 32
    for i, (n, out_c) in enumerate(stage_configs):
        if n == 0:
            sd.update(_fake_cna(f"stages.{i}", in_c, out_c, 3))
        else:
            sd.update(_fake_cna(f"stages.{i}.conv", in_c, out_c, 3))
            for j in range(n):
                mid = out_c // 2
                sd.update(_fake_cna(f"stages.{i}.blocks.{j}.conv1", out_c, mid, 1))
                sd.update(_fake_cna(f"stages.{i}.blocks.{j}.conv2", mid, out_c, 3))
        in_c = out_c

    converted = convert_darknet(sd, stage_configs, csp)
    model = create_backbone("darknet19")
    variables = model.init_variables(0, 64)
    _assert_same_structure(converted["params"], variables["params"])
    _assert_same_structure(converted["batch_stats"], variables["batch_stats"])

    # converted weights must actually run
    out = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, converted["params"]),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, converted["batch_stats"])},
        jnp.zeros((1, 64, 64, 3)),
    )
    assert out.shape == (1, 2, 2, 1024)


def test_convert_vovnet_structure():
    from vision_toolbox_tpu.models.vovnet import _VOVNET_TABLES
    from vision_toolbox_tpu.utils.torch_interop import convert_vovnet

    variant, slim, ese = 19, True, True
    mid_list = (64, 80, 96, 112)
    out_list = (128, 256, 384, 512)
    n_blocks_list, n_layers_list = _VOVNET_TABLES[variant]
    stage_configs = tuple(zip(n_blocks_list, mid_list, n_layers_list, out_list))

    rng = np.random.default_rng(0)
    sd = {}
    sd.update(_fake_cna("stem.0", 3, 64, 3))
    sd.update(_fake_cna("stem.1", 64, 64, 3))
    sd.update(_fake_cna("stem.2", 64, 128, 3))
    in_c = 128
    for i, (n, mid, L, out_c) in enumerate(stage_configs):
        for j in range(n):
            cin = in_c
            for k in range(L):
                sd.update(_fake_cna(f"stages.{i}.module_{j}.convs.{k}", cin, mid, 3))
                cin = mid
            cat = in_c + mid * L
            sd.update(_fake_cna(f"stages.{i}.module_{j}.out_conv", cat, out_c, 1))
            sd[f"stages.{i}.module_{j}.ese.linear.weight"] = rng.standard_normal(
                (out_c, out_c, 1, 1), dtype=np.float32)
            sd[f"stages.{i}.module_{j}.ese.linear.bias"] = rng.standard_normal(out_c).astype(np.float32)
            in_c = out_c

    converted = convert_vovnet(sd, stage_configs, ese)
    model = create_backbone("vovnet19_slim_ese")
    variables = model.init_variables(0, 64)
    _assert_same_structure(converted["params"], variables["params"])
    _assert_same_structure(converted["batch_stats"], variables["batch_stats"])


def test_convert_darknet_yolov5_structure():
    from vision_toolbox_tpu.models.darknet import _YOLOV5_VARIANTS
    from vision_toolbox_tpu.utils.torch_interop import convert_darknet

    depth_scale, width_scale = _YOLOV5_VARIANTS["n"]
    stage_configs = tuple(
        (int(d * depth_scale), int(w * width_scale))
        for d, w in zip((3, 6, 9, 3), (128, 256, 512, 1024))
    )
    stem = int(64 * width_scale)
    sd = _fake_cna("stem", 3, stem, 6)
    in_c = stem
    for i, (n, out_c) in enumerate(stage_configs):
        sd.update(_fake_cna(f"stages.{i}.conv", in_c, out_c, 3))
        half = out_c // 2
        sd.update(_fake_cna(f"stages.{i}.conv1", out_c, half, 1))
        sd.update(_fake_cna(f"stages.{i}.conv2", out_c, half, 1))
        sd.update(_fake_cna(f"stages.{i}.out_conv", out_c, out_c, 1))
        for j in range(n):
            sd.update(_fake_cna(f"stages.{i}.blocks.{j}.conv1", half, half, 1))
            sd.update(_fake_cna(f"stages.{i}.blocks.{j}.conv2", half, half, 3))
        in_c = out_c

    converted = convert_darknet(sd, stage_configs, csp=True, yolov5=True)
    model = create_backbone("darknet_yolov5n")
    variables = model.init_variables(0, 64)
    _assert_same_structure(converted["params"], variables["params"])
    _assert_same_structure(converted["batch_stats"], variables["batch_stats"])


def test_convert_swin_structure():
    from vision_toolbox_tpu.utils.torch_interop import convert_swin

    depths = (1, 1)
    window = 2
    d_model, n_heads = 8, 2
    rng = np.random.default_rng(1)
    f = lambda *s: rng.standard_normal(s, dtype=np.float32)
    sd = {
        "patch_embed.proj.weight": f(d_model, 3, 4, 4),
        "patch_embed.proj.bias": f(d_model),
        "patch_embed.norm.weight": f(d_model),
        "patch_embed.norm.bias": f(d_model),
        "norm.weight": f(2 * d_model),
        "norm.bias": f(2 * d_model),
    }
    for s, depth in enumerate(depths):
        d = d_model * 2**s
        h = n_heads * 2**s
        if s > 0:
            sd[f"layers.{s-1}.downsample.norm.weight"] = f(4 * d_model)
            sd[f"layers.{s-1}.downsample.norm.bias"] = f(4 * d_model)
            sd[f"layers.{s-1}.downsample.reduction.weight"] = f(2 * d_model, 4 * d_model)
        for b in range(depth):
            p = f"layers.{s}.blocks.{b}"
            sd[f"{p}.norm1.weight"] = f(d)
            sd[f"{p}.norm1.bias"] = f(d)
            sd[f"{p}.attn.qkv.weight"] = f(3 * d, d)
            sd[f"{p}.attn.qkv.bias"] = f(3 * d)
            sd[f"{p}.attn.proj.weight"] = f(d, d)
            sd[f"{p}.attn.proj.bias"] = f(d)
            sd[f"{p}.attn.relative_position_bias_table"] = f((2 * window - 1) ** 2, h)
            sd[f"{p}.attn.relative_position_index"] = np.zeros((window**2, window**2), np.int64)
            sd[f"{p}.norm2.weight"] = f(d)
            sd[f"{p}.norm2.bias"] = f(d)
            sd[f"{p}.mlp.fc1.weight"] = f(4 * d, d)
            sd[f"{p}.mlp.fc1.bias"] = f(4 * d)
            sd[f"{p}.mlp.fc2.weight"] = f(d, 4 * d)
            sd[f"{p}.mlp.fc2.bias"] = f(d, )

    converted = convert_swin(sd, depths)
    from vision_toolbox_tpu.models.swin import SwinTransformer

    model = SwinTransformer(
        img_size=16, d_model=d_model, n_heads=n_heads,
        depths=depths, window_sizes=(window, window),
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 16, 16, 3)), train=False)
    _assert_same_structure(converted["params"], variables["params"])


def test_flax_npz_vit_roundtrip(tmp_path):
    """Synthesize an AugReg-layout npz, load, check structure + cls fold."""
    import numpy as np

    from vision_toolbox_tpu.models.vit import ViT
    from vision_toolbox_tpu.utils.flax_ckpt import load_vit_npz

    d, depth, heads, patch, img = 16, 2, 2, 8, 32
    n = (img // patch) ** 2
    rng = np.random.default_rng(2)
    f = lambda *s: rng.standard_normal(s, dtype=np.float32)
    w = {
        "cls": f(1, 1, d),
        "Transformer/posembed_input/pos_embedding": f(1, n + 1, d),
        "embedding/kernel": f(patch, patch, 3, d),
        "embedding/bias": f(d),
        "Transformer/encoder_norm/scale": f(d),
        "Transformer/encoder_norm/bias": f(d),
    }
    for i in range(depth):
        p = f"Transformer/encoderblock_{i}"
        w[f"{p}/LayerNorm_0/scale"] = f(d)
        w[f"{p}/LayerNorm_0/bias"] = f(d)
        w[f"{p}/LayerNorm_2/scale"] = f(d)
        w[f"{p}/LayerNorm_2/bias"] = f(d)
        for nm in ("query", "key", "value"):
            w[f"{p}/MultiHeadDotProductAttention_1/{nm}/kernel"] = f(d, heads, d // heads)
            w[f"{p}/MultiHeadDotProductAttention_1/{nm}/bias"] = f(heads, d // heads)
        w[f"{p}/MultiHeadDotProductAttention_1/out/kernel"] = f(heads, d // heads, d)
        w[f"{p}/MultiHeadDotProductAttention_1/out/bias"] = f(d)
        w[f"{p}/MlpBlock_3/Dense_0/kernel"] = f(d, 4 * d)
        w[f"{p}/MlpBlock_3/Dense_0/bias"] = f(4 * d)
        w[f"{p}/MlpBlock_3/Dense_1/kernel"] = f(4 * d, d)
        w[f"{p}/MlpBlock_3/Dense_1/bias"] = f(d)

    path = tmp_path / "augreg.npz"
    np.savez(path, **w)
    params = load_vit_npz(str(path), depth)

    model = ViT(d_model=d, depth=depth, n_heads=heads, patch_size=patch, img_size=img)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, img, img, 3)), train=False)
    _assert_same_structure(params, variables["params"])
    # cls-token PE fold (vit.py:241-243)
    np.testing.assert_allclose(
        params["cls_token"],
        w["cls"] + w["Transformer/posembed_input/pos_embedding"][:, :1],
        rtol=1e-6,
    )
    out = model.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)}, jnp.zeros((1, img, img, 3)))
    assert out.shape == (1, d)


def test_npz_save_load_and_extract_backbone(tmp_path):
    from vision_toolbox_tpu.train import ImageClassifier

    model = ImageClassifier(backbone=create_backbone("darknet19"), num_classes=5)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 32, 3)), train=False)
    backbone_vars = extract_backbone(variables)
    assert "head" not in backbone_vars["params"]
    assert "stem" in backbone_vars["params"]

    path = save_params_npz(backbone_vars, "darknet19", str(tmp_path))
    assert "-" in path and path.endswith(".npz")
    loaded = load_params_npz(path)
    a = flatten_tree(backbone_vars)
    b = flatten_tree(loaded)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), b[k])
