"""Fused transformer-block kernels (ops/block_mlp.py, ops/block_attention.py)
vs XLA oracles, in interpret mode on CPU.

Two tolerance regimes:
- kernel-level tests use a CAST-MATCHED oracle (same bf16 rounding points,
  same erf approximation) → tight f32 tolerances;
- module-level tests compare the fused ViTBlock path against the unfused
  XLA chain in f32 params → bf16-level tolerances (the kernels compute
  their matmuls in bf16 by design, exactly like the production dtype).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import vision_toolbox_tpu.ops.block_attention as ba
import vision_toolbox_tpu.ops.block_mlp as bm
from vision_toolbox_tpu.nn.attention import ViTBlock


def _ln(x, s, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu
    return (x - mu) * jax.lax.rsqrt(var + eps) * s + b


def _bdot(a, b):
    """bf16×bf16 matmul accumulating f32 — the kernels' rounding points."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((a.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


def mlp_oracle(x, lns, lnb, w1, b1, w2, b2, ls, dp, eps=1e-6):
    xf = x.astype(jnp.float32)
    y2 = _ln(xf, lns, lnb, eps).astype(jnp.bfloat16)
    h = (_bdot(y2, w1) + b1).astype(jnp.bfloat16)
    g = bm._gelu_f32(h.astype(jnp.float32)).astype(jnp.bfloat16)
    mlp = _bdot(g, w2) + b2
    scale = (dp[:, :, None] if dp is not None else 1.0) * (ls if ls is not None else 1.0)
    return (xf + scale * mlp).astype(x.dtype)


def attn_oracle(x, lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo, n_heads, ls, dp, eps=1e-6):
    B, T, D = x.shape
    hd = D // n_heads
    xf = x.astype(jnp.float32)
    y = _ln(xf, lns, lnb, eps).astype(jnp.bfloat16)
    q = (_bdot(y, wq) + bq).astype(jnp.bfloat16)
    k = (_bdot(y, wk) + bk).astype(jnp.bfloat16)
    v = (_bdot(y, wv) + bv).astype(jnp.bfloat16)
    outs = []
    for hidx in range(n_heads):
        sl = slice(hidx * hd, (hidx + 1) * hd)
        logits = jnp.einsum(
            "bth,bsh->bts",
            q[:, :, sl].astype(jnp.float32) * hd**-0.5,
            k[:, :, sl].astype(jnp.float32),
        )
        p = jax.nn.softmax(logits, axis=-1)
        outs.append(
            jnp.einsum(
                "bts,bsh->bth",
                p.astype(jnp.bfloat16).astype(jnp.float32),
                v[:, :, sl].astype(jnp.float32),
            )
        )
    o = jnp.concatenate(outs, axis=-1).astype(jnp.bfloat16)
    proj = _bdot(o, wo) + bo
    scale = (dp[:, :, None] if dp is not None else 1.0) * (ls if ls is not None else 1.0)
    return (xf + scale * proj).astype(x.dtype)


def _mlp_args(B=3, T=17, D=128, Dh=256, seed=0, ls=True, dp=True):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    a = {
        "x": jax.random.normal(ks[0], (B, T, D), jnp.float32),
        "lns": 1.0 + 0.1 * jax.random.normal(ks[1], (D,), jnp.float32),
        "lnb": 0.1 * jax.random.normal(ks[2], (D,), jnp.float32),
        "w1": jax.random.normal(ks[3], (D, Dh), jnp.float32) * D**-0.5,
        "b1": 0.1 * jax.random.normal(ks[4], (Dh,), jnp.float32),
        "w2": jax.random.normal(ks[5], (Dh, D), jnp.float32) * Dh**-0.5,
        "b2": 0.1 * jax.random.normal(ks[6], (D,), jnp.float32),
    }
    a["ls"] = 0.5 + 0.2 * jax.random.normal(ks[7], (D,), jnp.float32) if ls else None
    a["dp"] = (
        (jax.random.bernoulli(ks[7], 0.8, (B, 1)) / 0.8).astype(jnp.float32) if dp else None
    )
    return a


@pytest.mark.parametrize("ls,dp,group", [(True, True, 1), (False, False, 2), (True, False, 3)])
def test_fused_mlp_forward(ls, dp, group):
    a = _mlp_args(ls=ls, dp=dp)
    got = bm.fused_mlp_block(
        a["x"], a["lns"], a["lnb"], a["w1"], a["b1"], a["w2"], a["b2"],
        a["ls"], a["dp"], group=group,
    )
    want = mlp_oracle(a["x"], a["lns"], a["lnb"], a["w1"], a["b1"], a["w2"], a["b2"], a["ls"], a["dp"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_fused_mlp_row_chunking():
    # T > 512 triggers the free (B,T,D)->(B*k,T/k,D) re-bin; per-sample
    # drop-path must still apply to the right rows after the repeat
    assert bm._row_chunk(3136) == 7
    assert bm._row_chunk(197) == 1
    a = _mlp_args(B=2, T=784, D=32, Dh=64, seed=4, ls=True, dp=True)
    got = bm.fused_mlp_block(
        a["x"], a["lns"], a["lnb"], a["w1"], a["b1"], a["w2"], a["b2"],
        a["ls"], a["dp"],
    )
    want = mlp_oracle(a["x"], a["lns"], a["lnb"], a["w1"], a["b1"], a["w2"],
                      a["b2"], a["ls"], a["dp"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-2, atol=1e-2)


def test_fused_mlp_hidden_tiling():
    # Dh > 1536 exercises the inner hidden-tile grid axis (nj > 1)
    a = _mlp_args(B=2, T=9, D=256, Dh=2048, seed=3)
    got = bm.fused_mlp_block(
        a["x"], a["lns"], a["lnb"], a["w1"], a["b1"], a["w2"], a["b2"], a["ls"], a["dp"]
    )
    want = mlp_oracle(a["x"], a["lns"], a["lnb"], a["w1"], a["b1"], a["w2"], a["b2"], a["ls"], a["dp"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("ls", [True, False])
def test_fused_mlp_grads(ls):
    a = _mlp_args(B=2, T=13, D=128, Dh=384, seed=1, ls=ls)
    names = ["x", "lns", "lnb", "w1", "b1", "w2", "b2"] + (["ls"] if ls else [])
    w = jnp.cos(jnp.arange(128))

    def loss(fn):
        def f(*args):
            kw = dict(zip(names, args))
            out = fn(
                kw["x"], kw["lns"], kw["lnb"], kw["w1"], kw["b1"], kw["w2"], kw["b2"],
                kw.get("ls", None), a["dp"],
            )
            return jnp.sum(out * w)
        return f

    args = [a[n] for n in names]
    ga = jax.grad(loss(bm.fused_mlp_block), argnums=tuple(range(len(names))))(*args)
    gb = jax.grad(loss(mlp_oracle), argnums=tuple(range(len(names))))(*args)
    for n, x, y in zip(names, ga, gb):
        # backward matmuls run bf16 in-kernel; oracle's autodiff re-derives
        # them from the f32 graph → bf16-level agreement, normalized by the
        # grad's own magnitude (tiny elements of row-summed grads like dβ_ln
        # carry the full bf16 absolute error of their large siblings)
        scale = max(1.0, float(np.max(np.abs(np.asarray(y)))))
        np.testing.assert_allclose(
            np.asarray(x) / scale, np.asarray(y) / scale, atol=2e-2, err_msg=f"grad {n}"
        )


def _attn_args(B=3, T=19, D=128, H=4, seed=0, ls=True, dp=True):
    ks = jax.random.split(jax.random.PRNGKey(seed), 12)
    a = {"x": jax.random.normal(ks[0], (B, T, D), jnp.float32)}
    for i, n in enumerate(["wq", "wk", "wv", "wo"]):
        a[n] = jax.random.normal(ks[1 + i], (D, D), jnp.float32) * D**-0.5
    for i, n in enumerate(["bq", "bk", "bv", "bo"]):
        a[n] = 0.1 * jax.random.normal(ks[5 + i], (D,), jnp.float32)
    a["lns"] = 1.0 + 0.1 * jax.random.normal(ks[9], (D,), jnp.float32)
    a["lnb"] = 0.1 * jax.random.normal(ks[10], (D,), jnp.float32)
    a["ls"] = 0.5 + 0.2 * jax.random.normal(ks[11], (D,), jnp.float32) if ls else None
    a["dp"] = (
        (jax.random.bernoulli(ks[11], 0.8, (B, 1)) / 0.8).astype(jnp.float32) if dp else None
    )
    a["H"] = H
    return a


@pytest.mark.parametrize("ls,dp,group", [(True, True, 1), (False, False, 3)])
def test_fused_attn_forward(ls, dp, group):
    a = _attn_args(ls=ls, dp=dp)
    got = ba.fused_attention_block(
        a["x"], a["lns"], a["lnb"], a["wq"], a["bq"], a["wk"], a["bk"],
        a["wv"], a["bv"], a["wo"], a["bo"], a["H"], a["ls"], a["dp"], group=group,
    )
    want = attn_oracle(
        a["x"], a["lns"], a["lnb"], a["wq"], a["bq"], a["wk"], a["bk"],
        a["wv"], a["bv"], a["wo"], a["bo"], a["H"], a["ls"], a["dp"],
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("ls", [True, False])
def test_fused_attn_grads(ls):
    a = _attn_args(B=2, T=11, D=128, H=2, seed=1, ls=ls)
    names = ["x", "lns", "lnb", "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo"] + (
        ["ls"] if ls else []
    )
    w = jnp.sin(jnp.arange(128))

    def loss(fn):
        def f(*args):
            kw = dict(zip(names, args))
            out = fn(
                kw["x"], kw["lns"], kw["lnb"], kw["wq"], kw["bq"], kw["wk"], kw["bk"],
                kw["wv"], kw["bv"], kw["wo"], kw["bo"], a["H"], kw.get("ls", None), a["dp"],
            )
            return jnp.sum(out * w)
        return f

    args = [a[n] for n in names]
    ga = jax.grad(loss(ba.fused_attention_block), argnums=tuple(range(len(names))))(*args)
    gb = jax.grad(loss(attn_oracle), argnums=tuple(range(len(names))))(*args)
    for n, x, y in zip(names, ga, gb):
        scale = max(1.0, float(np.max(np.abs(np.asarray(y)))))
        np.testing.assert_allclose(
            np.asarray(x) / scale, np.asarray(y) / scale, atol=2e-2, err_msg=f"grad {n}"
        )


# ---------- module-level: ViTBlock fused path vs unfused XLA chain ----------


@pytest.fixture
def force_on(monkeypatch):
    monkeypatch.setattr(ba, "_FORCE_ON", True)
    monkeypatch.setattr(bm, "_FORCE_ON", True)


@pytest.mark.parametrize("ls_init", [None, 1e-6])
def test_vitblock_param_tree_identical(force_on, ls_init):
    """The fused branch must declare the exact same param tree (names,
    shapes, values from the same rng stream) — checkpoints are the interface."""
    blk = ViTBlock(128, 4, layer_scale_init=ls_init, stochastic_depth=0.1)
    x = jnp.zeros((2, 48, 128))
    v_fused = blk.init({"params": jax.random.PRNGKey(0)}, x)

    bm._FORCE_ON = ba._FORCE_ON = False
    v_plain = blk.init({"params": jax.random.PRNGKey(0)}, x)
    bm._FORCE_ON = ba._FORCE_ON = True

    pa = jax.tree_util.tree_leaves_with_path(v_fused)
    pb = jax.tree_util.tree_leaves_with_path(v_plain)
    assert [k for k, _ in pa] == [k for k, _ in pb]
    for (ka, la), (_, lb) in zip(pa, pb):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb), err_msg=str(ka))


@pytest.mark.parametrize("ls_init", [None, 0.1])
def test_vitblock_fused_matches_unfused(force_on, ls_init):
    blk = ViTBlock(128, 4, layer_scale_init=ls_init)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 48, 128))
    v = blk.init({"params": jax.random.PRNGKey(0)}, x)

    got = blk.apply(v, x)
    bm._FORCE_ON = ba._FORCE_ON = False
    want = blk.apply(v, x)
    bm._FORCE_ON = ba._FORCE_ON = True
    # fused kernels round y/q/k/v/h to bf16; the unfused f32 chain does not
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-2, atol=3e-2)

    def loss(v):
        return jnp.sum(blk.apply(v, x) ** 2)

    g_got = jax.grad(loss)(v)
    bm._FORCE_ON = ba._FORCE_ON = False
    g_want = jax.grad(loss)(v)
    bm._FORCE_ON = ba._FORCE_ON = True
    flat_a = jax.tree_util.tree_leaves_with_path(g_got)
    flat_b = jax.tree_util.tree_leaves_with_path(g_want)
    for (k, a), (_, b) in zip(flat_a, flat_b):
        scale = max(1.0, float(np.max(np.abs(np.asarray(b)))))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=3e-2, err_msg=str(k)
        )


def test_vitblock_droppath_rng_stream_matches(force_on):
    """Train-mode drop-path: the fused path samples (B,1) from the same rng
    stream the unfused path samples (B,1,1) from — same threefry bits."""
    blk = ViTBlock(128, 4, stochastic_depth=0.5)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 128))
    v = blk.init({"params": jax.random.PRNGKey(0)}, x)
    rngs = {"dropout": jax.random.PRNGKey(7)}

    got = blk.apply(v, x, train=True, rngs=rngs)
    bm._FORCE_ON = ba._FORCE_ON = False
    want = blk.apply(v, x, train=True, rngs=rngs)
    bm._FORCE_ON = ba._FORCE_ON = True
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-2, atol=3e-2)


def test_dispatch_rules():
    # CPU backend: dispatch stays off without _FORCE_ON
    assert not bm.use_fused_mlp(768, 3072, 197, 0.0)
    assert not ba.use_fused_attention(768, 12, 197, 0.0, True)
    bm._FORCE_ON = ba._FORCE_ON = True
    try:
        assert bm.use_fused_mlp(768, 3072, 197, 0.0)
        assert ba.use_fused_attention(768, 12, 197, 0.0, True)
        # ViT-L/H route through the split chains — measured +31.1% train on
        # chip (round 4), so the split flags default ON now
        assert bm.use_fused_mlp(1024, 4096, 197, 0.0)  # ViT-L: 2-call chain
        assert bm.use_fused_mlp(1280, 5120, 257, 0.0)  # ViT-H: 4-call chain
        assert ba.use_fused_attention(1024, 16, 197, 0.0, True)  # head-split
        bm._ALLOW_HIDDEN_SPLIT = ba._ALLOW_HEAD_SPLIT = False
        assert not bm.use_fused_mlp(1024, 4096, 197, 0.0)
        assert not ba.use_fused_attention(1024, 16, 197, 0.0, True)
        bm._ALLOW_HIDDEN_SPLIT = ba._ALLOW_HEAD_SPLIT = True
        # dropout, non-32-multiple width, long sequences stay on XLA
        assert not bm.use_fused_mlp(768, 3072, 197, 0.1)
        assert not bm.use_fused_mlp(100, 400, 197, 0.0)
        # Swin/ConvNeXt stage widths (96/192) dispatch since round 4
        assert bm.use_fused_mlp(96, 384, 56 * 56, 0.0)
        assert bm.use_fused_mlp(192, 768, 28 * 28, 0.0)
        assert not ba.use_fused_attention(768, 12, 1025, 0.0, True)
        assert not ba.use_fused_attention(768, 12, 197, 0.0, False)
        # no feasible split plan at any supported ns -> gate off
        assert not bm.use_fused_mlp(4096, 15360, 197, 0.0)
        # vit_b at 320px (T=401): the single-call saved-probs block blows the
        # per-program VMEM budget — admitted via the head-split chain now
        # that the splits default ON; falls back to XLA when disallowed
        assert ba.use_fused_attention(768, 12, 401, 0.0, True)
        ba._ALLOW_HEAD_SPLIT = False
        assert not ba.use_fused_attention(768, 12, 401, 0.0, True)
        ba._ALLOW_HEAD_SPLIT = True
    finally:
        bm._FORCE_ON = ba._FORCE_ON = False
        bm._ALLOW_HIDDEN_SPLIT = ba._ALLOW_HEAD_SPLIT = True  # module defaults


def test_production_train_step_with_fused_paths(force_on):
    """The PRODUCTION train step (augmentation + smoothed CE + SGD + BN-free
    transformer) must run with the fused kernels dispatched inside jit and
    track the unfused step: rng threading, donation, and the custom-vjp
    paths all compose."""
    import jax.numpy as jnp

    from vision_toolbox_tpu import create_backbone
    from vision_toolbox_tpu.train import (
        ImageClassifier, TrainState, make_train_step, sgd_with_param_groups,
    )

    def run():
        model = ImageClassifier(
            backbone=create_backbone("vit_ti_16", img_size=64),
            num_classes=10,
        )
        v = model.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3)), train=False)
        tx = sgd_with_param_groups(v["params"], 0.1, momentum=0.9, weight_decay=1e-4)
        state = TrainState.create(model.apply, v, tx)
        step = jax.jit(make_train_step(10, mixup_alpha=0.2, cutmix_alpha=1.0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (8, 64, 64, 3))
        y = jax.random.randint(jax.random.PRNGKey(2), (8,), 0, 10)
        losses = []
        for i in range(3):
            state, m = step(state, x, y, jax.random.PRNGKey(3))
            losses.append(float(m["loss"]))
        return losses, state

    fused_losses, fused_state = run()
    bm._FORCE_ON = ba._FORCE_ON = False
    plain_losses, plain_state = run()
    bm._FORCE_ON = ba._FORCE_ON = True

    np.testing.assert_allclose(fused_losses, plain_losses, rtol=3e-2, atol=3e-2)
    for (k, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(fused_state.params),
        jax.tree_util.tree_leaves_with_path(plain_state.params),
    ):
        scale = max(1.0, float(np.max(np.abs(np.asarray(b)))))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=3e-2, err_msg=str(k)
        )


def test_grad_tree_dtypes_match_params():
    """f32 callers must get f32 gradients back for EVERY leaf — the kernels
    bf16-cast the weights internally, but cotangent dtypes are part of the
    param-tree interface (regression: bias grads came back bfloat16)."""
    a = _mlp_args(B=2, T=13, D=128, Dh=384, seed=2)
    names = ["x", "lns", "lnb", "w1", "b1", "w2", "b2", "ls"]
    g = jax.grad(
        lambda *args: jnp.sum(bm.fused_mlp_block(*args, a["dp"])),
        argnums=tuple(range(len(names))),
    )(*[a[n] for n in names])
    for n, gi in zip(names, g):
        assert gi.dtype == jnp.float32, f"{n} grad dtype {gi.dtype}"

    b = _attn_args(B=2, T=9, D=128, H=4, seed=2)
    anames = ["x", "lns", "lnb", "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo", "ls"]
    g = jax.grad(
        lambda *args: jnp.sum(
            ba.fused_attention_block(args[0], *args[1:3], *args[3:11], 4, args[11], b["dp"])
        ),
        argnums=tuple(range(len(anames))),
    )(*[b[n] for n in anames])
    for n, gi in zip(anames, g):
        assert gi.dtype == jnp.float32, f"{n} grad dtype {gi.dtype}"


# ---------- hidden-split chain (ViT-L/H resident-weight overflow) ----------


def test_hidden_split_plan():
    assert bm._hidden_splits(768, 3072) == 1  # ViT-B: single call
    assert bm._hidden_splits(1024, 4096) == 2  # ViT-L: 16.8 MB resident
    assert bm._hidden_splits(1280, 5120) == 4  # ViT-H: 26.2 MB resident
    assert bm._hidden_splits(4096, 15360) == 0  # no feasible plan


@pytest.mark.parametrize("ls,dp", [(True, True), (False, False)])
def test_fused_mlp_hidden_split_matches_oracle(monkeypatch, ls, dp):
    """Force the 2-call hidden-split chain at test size: output and every
    gradient must match the oracle (and therefore the single-call kernel)."""
    a = _mlp_args(B=2, T=13, D=128, Dh=512, seed=7, ls=ls, dp=dp)
    # 2·128·512·2 = 256 KiB resident — cap the budget to force ns=2
    monkeypatch.setattr(bm, "_RESIDENT_BUDGET", 160 * 1024)
    assert bm._hidden_splits(128, 512) == 2

    got = bm.fused_mlp_block(
        a["x"], a["lns"], a["lnb"], a["w1"], a["b1"], a["w2"], a["b2"],
        a["ls"], a["dp"],
    )
    want = mlp_oracle(a["x"], a["lns"], a["lnb"], a["w1"], a["b1"], a["w2"],
                      a["b2"], a["ls"], a["dp"])
    # per-slice partials round through the out dtype between calls (f32 in
    # this test) and the two bf16 W2 matmuls accumulate in a different order
    # than the oracle's single contraction
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-2, atol=1e-2)

    names = ["x", "lns", "lnb", "w1", "b1", "w2", "b2"] + (["ls"] if ls else [])
    w = jnp.cos(jnp.arange(128))

    def loss(fn):
        def f(*args):
            kw = dict(zip(names, args))
            out = fn(
                kw["x"], kw["lns"], kw["lnb"], kw["w1"], kw["b1"], kw["w2"],
                kw["b2"], kw.get("ls", None), a["dp"],
            )
            return jnp.sum(out * w)
        return f

    args = [a[n] for n in names]
    ga = jax.grad(loss(bm.fused_mlp_block), argnums=tuple(range(len(names))))(*args)
    gb = jax.grad(loss(mlp_oracle), argnums=tuple(range(len(names))))(*args)
    for n, x, y in zip(names, ga, gb):
        assert x.dtype == jnp.float32, f"grad {n} dtype {x.dtype}"
        scale = max(1.0, float(np.max(np.abs(np.asarray(y)))))
        np.testing.assert_allclose(
            np.asarray(x) / scale, np.asarray(y) / scale, atol=2e-2, err_msg=f"grad {n}"
        )


def test_fused_mlp_hidden_split_with_residual(monkeypatch):
    """Split chain composed with a separate residual operand (the ConvNeXt
    shape class): d(res) must stay exactly the identity cotangent."""
    a = _mlp_args(B=2, T=9, D=128, Dh=512, seed=8, ls=True, dp=True)
    res = jax.random.normal(jax.random.PRNGKey(12), a["x"].shape, jnp.float32)
    monkeypatch.setattr(bm, "_RESIDENT_BUDGET", 160 * 1024)

    got = bm.fused_mlp_block(
        a["x"], a["lns"], a["lnb"], a["w1"], a["b1"], a["w2"], a["b2"],
        a["ls"], a["dp"], residual=res,
    )
    want = mlp_res_oracle(a["x"], res, a["lns"], a["lnb"], a["w1"], a["b1"],
                          a["w2"], a["b2"], a["ls"], a["dp"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-2, atol=1e-2)

    ga = jax.grad(lambda x, r: jnp.sum(bm.fused_mlp_block(
        x, a["lns"], a["lnb"], a["w1"], a["b1"], a["w2"], a["b2"],
        a["ls"], a["dp"], residual=r) ** 2), argnums=(0, 1))(a["x"], res)
    gb = jax.grad(lambda x, r: jnp.sum(mlp_res_oracle(
        x, r, a["lns"], a["lnb"], a["w1"], a["b1"], a["w2"], a["b2"],
        a["ls"], a["dp"]) ** 2), argnums=(0, 1))(a["x"], res)
    for n, x, y in zip(("dx", "dres"), ga, gb):
        scale = max(1.0, float(np.max(np.abs(np.asarray(y)))))
        np.testing.assert_allclose(
            np.asarray(x) / scale, np.asarray(y) / scale, atol=2e-2, err_msg=n
        )


# ------------------ head-split attention chain (ViT-L/H weight overflow) ---


def test_head_split_plan():
    assert ba._head_splits(768, 12, 197) == 1  # ViT-B @224: single call
    assert ba._head_splits(768, 12, 401) == 2  # ViT-B @320: T blocks overflow
    assert ba._head_splits(1024, 16, 197) == 2  # ViT-L: 8.4 MB resident
    # ViT-H: ns=2 overflows the T=257 program budget and ns=4's 320-lane
    # blocks break the 128 alignment the kernel is proven at -> XLA fallback
    assert ba._head_splits(1280, 16, 257) == 0
    assert ba._head_splits(8192, 3, 197) == 0  # no feasible plan (3 % 2 != 0)


@pytest.mark.parametrize("ls,dp", [(True, True), (False, False)])
def test_fused_attn_head_split_matches_oracle(monkeypatch, ls, dp):
    """Force the 2-call head-group chain at test size: output and every
    gradient must match the oracle (heads are independent; the out-proj
    distributes over head groups)."""
    a = _attn_args(B=2, T=11, D=128, H=4, seed=3, ls=ls, dp=dp)
    # 4·128² bf16 = 128 KiB resident — cap the budget to force ns=2
    monkeypatch.setattr(ba, "_RESIDENT_BUDGET", 100 * 1024)
    monkeypatch.setattr(ba, "_LANE_ALIGN", 64)  # Dq=64 at test size
    assert ba._head_splits(128, 4, 11) == 2

    names = ["x", "lns", "lnb", "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo"] + (
        ["ls"] if ls else []
    )

    got = ba.fused_attention_block(
        a["x"], a["lns"], a["lnb"], a["wq"], a["bq"], a["wk"], a["bk"],
        a["wv"], a["bv"], a["wo"], a["bo"], a["H"], a["ls"], a["dp"],
    )
    want = attn_oracle(
        a["x"], a["lns"], a["lnb"], a["wq"], a["bq"], a["wk"], a["bk"],
        a["wv"], a["bv"], a["wo"], a["bo"], a["H"], a["ls"], a["dp"],
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-2, atol=1e-2)

    w = jnp.sin(jnp.arange(128))

    def loss(fn):
        def f(*args):
            kw = dict(zip(names, args))
            out = fn(
                kw["x"], kw["lns"], kw["lnb"], kw["wq"], kw["bq"], kw["wk"], kw["bk"],
                kw["wv"], kw["bv"], kw["wo"], kw["bo"], a["H"], kw.get("ls", None), a["dp"],
            )
            return jnp.sum(out * w)
        return f

    args = [a[n] for n in names]
    ga = jax.grad(loss(ba.fused_attention_block), argnums=tuple(range(len(names))))(*args)
    gb = jax.grad(loss(attn_oracle), argnums=tuple(range(len(names))))(*args)
    for n, x, y in zip(names, ga, gb):
        assert x.dtype == jnp.float32, f"grad {n} dtype {x.dtype}"
        scale = max(1.0, float(np.max(np.abs(np.asarray(y)))))
        np.testing.assert_allclose(
            np.asarray(x) / scale, np.asarray(y) / scale, atol=2e-2, err_msg=f"grad {n}"
        )


def test_head_split_dispatch_rules():
    ba._FORCE_ON = True
    try:
        # head-split chain ON by default since its chip A/B (+13.1% attn arm)
        assert ba.use_fused_attention(1024, 16, 197, 0.0, True)  # ViT-L
        ba._ALLOW_HEAD_SPLIT = False
        assert not ba.use_fused_attention(1024, 16, 197, 0.0, True)
        ba._ALLOW_HEAD_SPLIT = True
        # ViT-H has no Mosaic-proven plan (alignment/budget) -> XLA fallback
        assert not ba.use_fused_attention(1280, 16, 257, 0.0, True)
    finally:
        ba._FORCE_ON = False
        ba._ALLOW_HEAD_SPLIT = True  # module default


# ---------- residual operand + Swin/ConvNeXt half-block dispatch ----------


def mlp_res_oracle(x, res, lns, lnb, w1, b1, w2, b2, ls, dp, eps=1e-6):
    """res + scale·mlp(LN(x)) — the ConvNeXt composition."""
    xf = x.astype(jnp.float32)
    y2 = _ln(xf, lns, lnb, eps).astype(jnp.bfloat16)
    h = (_bdot(y2, w1) + b1).astype(jnp.bfloat16)
    g = bm._gelu_f32(h.astype(jnp.float32)).astype(jnp.bfloat16)
    mlp = _bdot(g, w2) + b2
    scale = (dp[:, :, None] if dp is not None else 1.0) * (ls if ls is not None else 1.0)
    return (res.astype(jnp.float32) + scale * mlp).astype(x.dtype)


@pytest.mark.parametrize("ls,group", [(True, 1), (False, 2)])
def test_fused_mlp_separate_residual(ls, group):
    a = _mlp_args(B=2, T=13, D=96, Dh=384, seed=5, ls=ls)
    res = jax.random.normal(jax.random.PRNGKey(9), a["x"].shape, jnp.float32)
    got = bm.fused_mlp_block(
        a["x"], a["lns"], a["lnb"], a["w1"], a["b1"], a["w2"], a["b2"],
        a["ls"], a["dp"], residual=res, group=group,
    )
    want = mlp_res_oracle(a["x"], res, a["lns"], a["lnb"], a["w1"], a["b1"],
                          a["w2"], a["b2"], a["ls"], a["dp"])
    # bf16-level tolerance: the kernel and the oracle accumulate the D=96
    # contraction in different orders (~1e-6 f32 drift), which can flip an
    # h-element's bf16 rounding by one ulp near a tie
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-2, atol=1e-2)

    # gradients: d(res) must be identity·dout; d(x) the LN chain only
    w = jnp.cos(jnp.arange(96))

    def loss(fn):
        return lambda x, r: jnp.sum(
            fn(x, r, a["lns"], a["lnb"], a["w1"], a["b1"], a["w2"], a["b2"],
               a["ls"], a["dp"]) * w
        )

    fused = lambda x, r, *rest: bm.fused_mlp_block(
        x, *rest[:6], rest[6], rest[7], residual=r
    )
    ga = jax.grad(loss(fused), argnums=(0, 1))(a["x"], res)
    gb = jax.grad(loss(mlp_res_oracle), argnums=(0, 1))(a["x"], res)
    for n, x, y in zip(("dx", "dres"), ga, gb):
        scale = max(1.0, float(np.max(np.abs(np.asarray(y)))))
        np.testing.assert_allclose(
            np.asarray(x) / scale, np.asarray(y) / scale, atol=2e-2, err_msg=n
        )


def test_fused_mlp_residual_with_row_chunking():
    """ConvNeXt stage-1 shape class: separate residual AND the heavy-config
    row re-bin together (T=784 -> k=2 at target 512); per-sample drop-path
    must land on the right rows after both the repeat and the reshape."""
    a = _mlp_args(B=2, T=784, D=32, Dh=64, seed=6, ls=True, dp=True)
    res = jax.random.normal(jax.random.PRNGKey(11), a["x"].shape, jnp.float32)
    assert bm._chunk_plan(784, 32, heavy=True) == 2
    got = bm.fused_mlp_block(
        a["x"], a["lns"], a["lnb"], a["w1"], a["b1"], a["w2"], a["b2"],
        a["ls"], a["dp"], residual=res,
    )
    want = mlp_res_oracle(a["x"], res, a["lns"], a["lnb"], a["w1"], a["b1"],
                          a["w2"], a["b2"], a["ls"], a["dp"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-2, atol=1e-2)

    g_got = jax.grad(lambda r: jnp.sum(bm.fused_mlp_block(
        a["x"], a["lns"], a["lnb"], a["w1"], a["b1"], a["w2"], a["b2"],
        a["ls"], a["dp"], residual=r) ** 2))(res)
    g_want = jax.grad(lambda r: jnp.sum(mlp_res_oracle(
        a["x"], r, a["lns"], a["lnb"], a["w1"], a["b1"], a["w2"], a["b2"],
        a["ls"], a["dp"]) ** 2))(res)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("ls_init", [None, 0.1])
def test_swinblock_fused_mlp_matches_unfused(force_on, ls_init):
    from vision_toolbox_tpu.models.swin import SwinBlock

    blk = SwinBlock(input_size=8, d_model=32, n_heads=2, window_size=4,
                    shift=True, layer_scale_init=ls_init)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 32))
    v = blk.init({"params": jax.random.PRNGKey(0)}, x)

    got = blk.apply(v, x)
    bm._FORCE_ON = ba._FORCE_ON = False
    v_plain = blk.init({"params": jax.random.PRNGKey(0)}, x)
    want = blk.apply(v, x)
    bm._FORCE_ON = ba._FORCE_ON = True

    # identical param tree from the same rng stream
    pa = jax.tree_util.tree_leaves_with_path(v)
    pb = jax.tree_util.tree_leaves_with_path(v_plain)
    assert [k for k, _ in pa] == [k for k, _ in pb]
    for (ka, la), (_, lb) in zip(pa, pb):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb), err_msg=str(ka))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-2, atol=3e-2)

    def loss(v):
        return jnp.sum(blk.apply(v, x) ** 2)

    g_got = jax.grad(loss)(v)
    bm._FORCE_ON = ba._FORCE_ON = False
    g_want = jax.grad(loss)(v)
    bm._FORCE_ON = ba._FORCE_ON = True
    for (k, a_), (_, b_) in zip(
        jax.tree_util.tree_leaves_with_path(g_got),
        jax.tree_util.tree_leaves_with_path(g_want),
    ):
        scale = max(1.0, float(np.max(np.abs(np.asarray(b_)))))
        np.testing.assert_allclose(
            np.asarray(a_) / scale, np.asarray(b_) / scale, atol=3e-2, err_msg=str(k)
        )


def test_mixerblock_fused_channel_mixing_matches_unfused(force_on):
    from vision_toolbox_tpu.models.mlp_mixer import MixerBlock

    blk = MixerBlock(n_tokens=16, d_model=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32))
    v = blk.init({"params": jax.random.PRNGKey(0)}, x)

    got = blk.apply(v, x)
    bm._FORCE_ON = False
    v_plain = blk.init({"params": jax.random.PRNGKey(0)}, x)
    want = blk.apply(v, x)
    bm._FORCE_ON = True

    pa = jax.tree_util.tree_leaves_with_path(v)
    pb = jax.tree_util.tree_leaves_with_path(v_plain)
    assert [k for k, _ in pa] == [k for k, _ in pb]
    for (ka, la), (_, lb) in zip(pa, pb):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb), err_msg=str(ka))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-2, atol=3e-2)

    def loss(v):
        return jnp.sum(blk.apply(v, x) ** 2)

    g_got = jax.grad(loss)(v)
    bm._FORCE_ON = False
    g_want = jax.grad(loss)(v)
    bm._FORCE_ON = True
    for (k, a_), (_, b_) in zip(
        jax.tree_util.tree_leaves_with_path(g_got),
        jax.tree_util.tree_leaves_with_path(g_want),
    ):
        scale = max(1.0, float(np.max(np.abs(np.asarray(b_)))))
        np.testing.assert_allclose(
            np.asarray(a_) / scale, np.asarray(b_) / scale, atol=3e-2, err_msg=str(k)
        )


@pytest.mark.parametrize("v2", [False, True])
def test_convnextblock_fused_mlp_matches_unfused(force_on, v2):
    from vision_toolbox_tpu.models.convnext import ConvNeXtBlock

    # layer_scale_init=0.3 (not the 1e-6 default) so the bf16-tolerance
    # comparison sees a non-vanishing MLP contribution; the 1e-6 default is
    # exactly why the kernel takes the residual as a SEPARATE operand
    blk = ConvNeXtBlock(d_model=32, layer_scale_init=0.3, v2=v2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 32))
    v = blk.init({"params": jax.random.PRNGKey(0)}, x)

    got = blk.apply(v, x)
    bm._FORCE_ON = False
    v_plain = blk.init({"params": jax.random.PRNGKey(0)}, x)
    want = blk.apply(v, x)
    bm._FORCE_ON = True

    pa = jax.tree_util.tree_leaves_with_path(v)
    pb = jax.tree_util.tree_leaves_with_path(v_plain)
    assert [k for k, _ in pa] == [k for k, _ in pb]
    for (ka, la), (_, lb) in zip(pa, pb):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb), err_msg=str(ka))
    if v2:  # GRN path must stay byte-identical on XLA (no fused form)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    else:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-2, atol=3e-2)

        def loss(v):
            return jnp.sum(blk.apply(v, x) ** 2)

        g_got = jax.grad(loss)(v)
        bm._FORCE_ON = False
        g_want = jax.grad(loss)(v)
        bm._FORCE_ON = True
        for (k, a_), (_, b_) in zip(
            jax.tree_util.tree_leaves_with_path(g_got),
            jax.tree_util.tree_leaves_with_path(g_want),
        ):
            scale = max(1.0, float(np.max(np.abs(np.asarray(b_)))))
            np.testing.assert_allclose(
                np.asarray(a_) / scale, np.asarray(b_) / scale, atol=3e-2, err_msg=str(k)
            )
