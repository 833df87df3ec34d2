"""CaiT talking-head KERNEL path through the full TalkingHeadAttention module
(models/cait.py dispatch), forced on CPU via interpret mode: must match the
XLA einsum path bit-for-tolerance including param plumbing and dtype casts.
The kernel itself is unit-tested in test_cait_attention_kernel.py; this
covers the integration the TPU dispatch actually runs."""

import jax
import jax.numpy as jnp
import numpy as np

import vision_toolbox_tpu.ops.cait_attention as ca
from vision_toolbox_tpu.models.cait import TalkingHeadAttention


def test_module_kernel_path_matches_xla(monkeypatch):
    mod = TalkingHeadAttention(d_model=192, n_heads=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 192))
    v = mod.init({"params": jax.random.PRNGKey(1)}, x)

    want = mod.apply(v, x)  # CPU → dispatch off → XLA path

    monkeypatch.setattr(ca, "use_talking_head_kernel", lambda *a: True)
    orig = ca.talking_head_attention
    monkeypatch.setattr(
        ca, "talking_head_attention",
        lambda *args, **kw: orig(*args, **{**kw, "interpret": True}),
    )
    got = mod.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    # gradients through the module (params incl. the head mixes)
    def loss(path_v):
        return jnp.sum(mod.apply(path_v, x) ** 2)

    g_got = jax.grad(loss)(v)
    monkeypatch.undo()
    monkeypatch.undo()
    g_want = jax.grad(loss)(v)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        ),
        g_got, g_want,
    )
