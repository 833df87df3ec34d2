"""jax.export serving round-trip: serialize a model, reload without its
Python class, get identical outputs."""

import numpy as np

import jax
import jax.numpy as jnp

from vision_toolbox_tpu import create_backbone
from vision_toolbox_tpu.utils.export import export_model, load_exported


def test_export_roundtrip(tmp_path):
    model = create_backbone("darknet19")
    variables = model.init_variables(0, 32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    ref = np.asarray(model.apply(variables, x))

    blob = export_model(model, variables, (2, 32, 32, 3))
    assert isinstance(blob, bytes) and len(blob) > 1000
    path = tmp_path / "model.stablehlo"
    path.write_bytes(blob)

    fn = load_exported(path.read_bytes())
    out = np.asarray(fn(x))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

    # v2 layout: weights ride NEXT TO the StableHLO module as call arguments
    # (baking them in as constants blew the remote-compile request limit at
    # ViT-B scale). The composition path threads them explicitly so a larger
    # jitted program (e.g. the serving chain) never inlines parameter bytes.
    assert blob.startswith(b"VTTX0002")
    assert fn.variables is not None
    out2 = np.asarray(jax.jit(fn.call)(fn.variables, x))
    np.testing.assert_allclose(out2, ref, rtol=1e-6, atol=1e-6)


def test_export_legacy_weights_baked_blob():
    """Round ≤4 artifacts (no magic header) must still rehydrate."""
    from jax import export as jax_export

    model = create_backbone("darknet19")
    variables = model.init_variables(0, 32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    ref = np.asarray(model.apply(variables, x))

    def f(x):
        return model.apply(variables, x, train=False)

    legacy = bytes(
        jax_export.export(jax.jit(f))(jax.ShapeDtypeStruct((2, 32, 32, 3), jnp.float32)).serialize()
    )
    assert not legacy.startswith(b"VTTX0002")
    fn = load_exported(legacy)
    np.testing.assert_allclose(np.asarray(fn(x)), ref, rtol=1e-6, atol=1e-6)
