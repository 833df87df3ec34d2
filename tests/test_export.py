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
