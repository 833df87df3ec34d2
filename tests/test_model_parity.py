"""Full-model numerical parity: a pure-torch functional replica of the
reference CSPDarknet-53 (darknet.py:20-100 semantics) vs our model with the
same weights routed through the torch_interop converter. This exercises the
converter and the model end-to-end at fp32/CPU with BN in inference mode."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vision_toolbox_tpu import create_backbone
from vision_toolbox_tpu.models.darknet import _DARKNET_VARIANTS
from vision_toolbox_tpu.utils.torch_interop import convert_darknet


def _make_cna(rng, prefix, in_c, out_c, k, sd):
    sd[f"{prefix}.conv.weight"] = torch.from_numpy(
        (rng.standard_normal((out_c, in_c, k, k), dtype=np.float32)
         / np.float32(np.sqrt(in_c * k * k)))
    )
    sd[f"{prefix}.norm.weight"] = torch.from_numpy(rng.random(out_c, dtype=np.float32) + 0.5)
    sd[f"{prefix}.norm.bias"] = torch.from_numpy(rng.standard_normal(out_c, dtype=np.float32) * 0.1)
    sd[f"{prefix}.norm.running_mean"] = torch.from_numpy(rng.standard_normal(out_c, dtype=np.float32) * 0.1)
    sd[f"{prefix}.norm.running_var"] = torch.from_numpy(rng.random(out_c, dtype=np.float32) + 0.5)


def _cna(sd, prefix, x, k, stride):
    w = sd[f"{prefix}.conv.weight"]
    pad = int(np.ceil((k - stride) / 2))
    x = F.conv2d(x, w, stride=stride, padding=pad)
    x = F.batch_norm(
        x, sd[f"{prefix}.norm.running_mean"], sd[f"{prefix}.norm.running_var"],
        sd[f"{prefix}.norm.weight"], sd[f"{prefix}.norm.bias"], False, 0.1, 1e-5,
    )
    return F.relu(x)


def _darknet_block(sd, prefix, x, expansion):
    mid = _cna(sd, f"{prefix}.conv1", x, 1, 1)
    return x + _cna(sd, f"{prefix}.conv2", mid, 3, 1)


def test_cspdarknet53_full_parity():
    rng = np.random.default_rng(0)
    n_blocks_list, _csp = _DARKNET_VARIANTS["cspdarknet53"]
    widths = (64, 128, 256, 512, 1024)
    stage_configs = tuple(zip(n_blocks_list, widths))

    # build reference-layout state dict
    sd: dict = {}
    _make_cna(rng, "stem", 3, 32, 3, sd)
    in_c = 32
    for i, (n, out_c) in enumerate(stage_configs):
        _make_cna(rng, f"stages.{i}.conv", in_c, out_c, 3, sd)
        half = out_c // 2
        _make_cna(rng, f"stages.{i}.conv1", out_c, half, 1, sd)
        _make_cna(rng, f"stages.{i}.conv2", out_c, half, 1, sd)
        for j in range(n):
            _make_cna(rng, f"stages.{i}.blocks.{j}.conv1", half, half, 1, sd)
            _make_cna(rng, f"stages.{i}.blocks.{j}.conv2", half, half, 3, sd)
        _make_cna(rng, f"stages.{i}.out_conv", out_c, out_c, 1, sd)
        in_c = out_c

    # torch functional forward (reference semantics, darknet.py:39-87)
    x_np = rng.standard_normal((2, 3, 64, 64), dtype=np.float32)
    x = torch.from_numpy(x_np)
    with torch.no_grad():
        out = _cna(sd, "stem", x, 3, 1)
        ref_maps = []
        for i, (n, out_c) in enumerate(stage_configs):
            out = _cna(sd, f"stages.{i}.conv", out, 3, 2)
            a = _cna(sd, f"stages.{i}.conv1", out, 1, 1)
            b = _cna(sd, f"stages.{i}.conv2", out, 1, 1)
            for j in range(n):
                b = _darknet_block(sd, f"stages.{i}.blocks.{j}", b, 1.0)
            out = torch.cat([a, b], dim=1)
            out = _cna(sd, f"stages.{i}.out_conv", out, 1, 1)
            ref_maps.append(out.numpy())

    # ours via the converter
    sd_np = {k: v.numpy() for k, v in sd.items()}
    tree = convert_darknet(sd_np, stage_configs, csp=True)
    model = create_backbone("cspdarknet53")
    variables = jax.tree_util.tree_map(jnp.asarray, tree)
    maps = model.apply(variables, jnp.asarray(x_np.transpose(0, 2, 3, 1)), method="get_feature_maps")

    assert len(maps) == len(ref_maps)
    for ours, ref in zip(maps, ref_maps):
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 3, 1, 2), ref, rtol=5e-4, atol=5e-4
        )
