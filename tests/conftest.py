"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run without TPU hardware (the driver's multi-chip dry-run uses the same
mechanism).

Note: this environment's site hook (axon TPU tunnel) force-sets
``jax_platforms="axon,cpu"`` via jax.config at interpreter startup, which
overrides JAX_PLATFORMS from the environment — so we must reset it through
jax.config, before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
