"""int8 serving path: quantized Linear/Dense interception (utils/int8_serving).

CPU correctness: the quantized apply must stay close to the fp32 reference
(symmetric per-channel weight int8 + per-row dynamic activation int8 keeps
relative error ~1e-2), hit every eligible projection, and leave the params
tree / model untouched."""

import jax
import jax.numpy as jnp
import numpy as np

from vision_toolbox_tpu import create_backbone
from vision_toolbox_tpu.utils.int8_serving import (
    _int8_matmul,
    quantize_params,
    quantized_apply,
)


def test_int8_matmul_accuracy():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (32, 256))
    w = jax.random.normal(jax.random.PRNGKey(1), (256, 128)) * 0.05
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    w8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    got = _int8_matmul(x, w8, scale)
    want = x @ w
    rel = np.abs(np.asarray(got - want)) / (np.abs(np.asarray(want)).mean() + 1e-9)
    assert rel.mean() < 0.02, rel.mean()


def test_quantize_params_selects_dense_kernels():
    model = create_backbone("vit_ti_16", img_size=64)
    v = model.init_variables(0, 64)
    qtree = quantize_params(v["params"])
    assert qtree, "no kernels quantized"
    # every ViT block contributes q/k/v, out_proj, and both MLP linears
    assert any(k.endswith("q_proj") for k in qtree)
    assert any(k.endswith("mlp/linear1") for k in qtree)
    # conv patch embed (4-D) must NOT be quantized
    assert not any("patch_embed" in k for k in qtree)


def test_quantized_apply_close_to_fp32():
    model = create_backbone("vit_ti_16", img_size=64)
    v = model.init_variables(0, 64)
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    want = np.asarray(model.apply(v, x, train=False), np.float32)
    qtree = quantize_params(v["params"])
    got = np.asarray(quantized_apply(model, qtree, v, x), np.float32)
    assert got.shape == want.shape
    # int8 path must actually change the numbers (interception happened)...
    assert not np.allclose(got, want)
    # ...but only within quantization tolerance
    denom = np.abs(want).mean() + 1e-9
    assert np.abs(got - want).mean() / denom < 0.05, np.abs(got - want).mean() / denom


def test_quantized_apply_jits():
    model = create_backbone("vit_ti_16", img_size=64)
    v = model.init_variables(0, 64)
    qtree = quantize_params(v["params"])
    f = jax.jit(lambda q, v, x: quantized_apply(model, q, v, x))
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 64, 3))
    out = f(qtree, v, x)
    assert np.all(np.isfinite(np.asarray(out, np.float32)))
