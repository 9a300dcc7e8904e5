"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run without TPU hardware (the driver's multi-chip dry-run uses the same
mechanism).

CRITICAL: the CPU platform must be selected in the PROCESS environment
before the interpreter starts.  This machine's axon TPU-tunnel plugin is
registered by a sitecustomize hook (PYTHONPATH=/root/.axon_site) whenever
``PALLAS_AXON_POOL_IPS`` is set, and once registered it wins the platform
selection even over ``JAX_PLATFORMS=cpu`` — every "cpu" test then silently
runs over the network tunnel to the one real TPU chip (a full-suite run
went from ~10 min to >60 min when that happened).  So if the suite isn't
already on the CPU platform we re-exec the whole pytest process with the
axon registration disabled and the 8-device virtual CPU flag set.
"""

import os
import sys

_needs_reexec = (os.environ.get("JAX_PLATFORMS") != "cpu"
                 or os.environ.get("PALLAS_AXON_POOL_IPS"))
if _needs_reexec and "pytest" in sys.modules:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    # empty (not unset): the sitecustomize gates on truthiness
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.execv(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:])

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# persistent XLA compile cache: phase-program compiles on this box cost
# 10s-300s each (2-core LLVM); the cache makes them one-time across the
# whole suite and across runs
from tpu_acir_prover.utils.jaxcfg import setup_jax_cache  # noqa: E402

setup_jax_cache()
