"""Test config: force CPU with 8 virtual devices so multi-chip sharding
(data-parallel train step, cross-replica BN) is exercised without TPU hardware.

Runs before any test imports jax. Note: the TPU tunnel plugin in this
environment overrides JAX_PLATFORMS, so we must also set the config flag
programmatically.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (prev + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
