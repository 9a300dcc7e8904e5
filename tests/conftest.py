"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run without TPU hardware (the driver's multi-chip dry-run uses the same
mechanism).

This machine's axon TPU-tunnel plugin is registered by a sitecustomize hook
(PYTHONPATH=/root/.axon_site) whenever ``PALLAS_AXON_POOL_IPS`` is set, and
by conftest-import time that registration has already happened.  Selecting
the CPU platform anyway needs ``jax.config.update("jax_platforms", "cpu")``
(the env var alone is read at jax-import time, which is too late to set
here).  XLA_FLAGS still takes effect because no backend has been
initialized yet when this file runs.

(An earlier version re-exec'd the whole pytest process with os.execv to get
the env vars in before interpreter start.  That silently destroyed all
pytest output: the re-exec happens after pytest's capture plugin has
pointed fd 1/2 at its capture tempfiles, and the exec'd process inherits
those fds, so every report went into a discarded capture file.)
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# native-u64 Goldilocks path on the CPU backend (field/gl.py _use_u64):
# ~5x fewer ops per field multiply -> much faster XLA:CPU compiles and
# virtual-mesh execution; bit-identical values
jax.config.update("jax_enable_x64", True)

# persistent XLA compile cache: phase-program compiles on this box cost
# 10s-300s each (2-core LLVM); the cache makes them one-time across the
# whole suite and across runs
from tpu_acir_prover.utils.jaxcfg import setup_jax_cache  # noqa: E402

setup_jax_cache()
