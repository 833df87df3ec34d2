"""VoVNet full-model parity: pure-torch functional replica of the reference
forward (vovnet.py:50-104 semantics — OSA concat aggregation, eSE gates,
3-conv stem, stage maxpools) vs our model through the converter."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vision_toolbox_tpu import create_backbone
from vision_toolbox_tpu.utils.torch_interop import convert_vovnet


def _make_cna(rng, prefix, in_c, out_c, k, sd):
    sd[f"{prefix}.conv.weight"] = torch.from_numpy(
        (rng.standard_normal((out_c, in_c, k, k), dtype=np.float32)
         / np.float32(np.sqrt(in_c * k * k)))
    )
    sd[f"{prefix}.norm.weight"] = torch.from_numpy(rng.random(out_c, dtype=np.float32) + 0.5)
    sd[f"{prefix}.norm.bias"] = torch.from_numpy(rng.standard_normal(out_c, dtype=np.float32) * 0.1)
    sd[f"{prefix}.norm.running_mean"] = torch.from_numpy(rng.standard_normal(out_c, dtype=np.float32) * 0.1)
    sd[f"{prefix}.norm.running_var"] = torch.from_numpy(rng.random(out_c, dtype=np.float32) + 0.5)


def _cna(sd, prefix, x, k=3, stride=1):
    pad = int(np.ceil((k - stride) / 2))
    x = F.conv2d(x, sd[f"{prefix}.conv.weight"], stride=stride, padding=pad)
    x = F.batch_norm(
        x, sd[f"{prefix}.norm.running_mean"], sd[f"{prefix}.norm.running_var"],
        sd[f"{prefix}.norm.weight"], sd[f"{prefix}.norm.bias"], False, 0.1, 1e-5,
    )
    return F.relu(x)


def test_vovnet_full_parity():
    rng = np.random.default_rng(7)
    stem_ch = 32
    stage_configs = ((1, 16, 3, 32), (2, 24, 3, 48))  # (blocks, mid, layers, out)

    sd: dict = {}
    _make_cna(rng, "stem.0", 3, stem_ch // 2, 3, sd)
    _make_cna(rng, "stem.1", stem_ch // 2, stem_ch // 2, 3, sd)
    _make_cna(rng, "stem.2", stem_ch // 2, stem_ch, 3, sd)
    in_c = stem_ch
    for i, (n, mid, L, out_c) in enumerate(stage_configs):
        for j in range(n):
            cin = in_c
            for k in range(L):
                _make_cna(rng, f"stages.{i}.module_{j}.convs.{k}", cin, mid, 3, sd)
                cin = mid
            _make_cna(rng, f"stages.{i}.module_{j}.out_conv", in_c + mid * L, out_c, 1, sd)
            sd[f"stages.{i}.module_{j}.ese.linear.weight"] = torch.from_numpy(
                rng.standard_normal((out_c, out_c, 1, 1), dtype=np.float32) * 0.1
            )
            sd[f"stages.{i}.module_{j}.ese.linear.bias"] = torch.from_numpy(
                rng.standard_normal(out_c, dtype=np.float32) * 0.1
            )
            in_c = out_c

    # torch functional forward
    x_np = rng.standard_normal((2, 3, 32, 32), dtype=np.float32)
    with torch.no_grad():
        x = torch.from_numpy(x_np)
        x = _cna(sd, "stem.0", x, 3, 2)
        x = _cna(sd, "stem.1", x)
        x = _cna(sd, "stem.2", x)
        ref_maps = [x.numpy()]
        in_c = stem_ch
        for i, (n, mid, L, out_c) in enumerate(stage_configs):
            x = F.max_pool2d(x, 3, 2, 1)
            for j in range(n):
                inp = x
                outs = [x]
                for k in range(L):
                    x = _cna(sd, f"stages.{i}.module_{j}.convs.{k}", x)
                    outs.append(x)
                x = _cna(sd, f"stages.{i}.module_{j}.out_conv", torch.cat(outs, 1), 1)
                gate = F.hardsigmoid(
                    F.conv2d(x.mean((2, 3), keepdim=True),
                             sd[f"stages.{i}.module_{j}.ese.linear.weight"],
                             sd[f"stages.{i}.module_{j}.ese.linear.bias"])
                )
                x = x * gate
                if inp.shape[1] == out_c:
                    x = x + inp
                in_c = out_c
            ref_maps.append(x.numpy())

    sd_np = {k: v.numpy() for k, v in sd.items()}
    tree = convert_vovnet(sd_np, stage_configs, ese=True)
    from vision_toolbox_tpu.models.vovnet import VoVNet

    model = VoVNet(stem_channels=stem_ch, stage_configs=stage_configs, ese=True)
    variables = jax.tree_util.tree_map(jnp.asarray, tree)
    maps = model.apply(variables, jnp.asarray(x_np.transpose(0, 2, 3, 1)), method="get_feature_maps")
    assert len(maps) == len(ref_maps)
    for ours, ref in zip(maps, ref_maps):
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 3, 1, 2), ref, rtol=5e-4, atol=5e-4
        )
