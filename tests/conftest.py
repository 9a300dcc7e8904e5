"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run without TPU hardware (the driver's multi-chip dry-run uses the same
mechanism).

CRITICAL: JAX_PLATFORMS=cpu must be in the PROCESS environment before the
interpreter starts.  This machine's axon TPU-tunnel plugin registers jax
hooks at interpreter startup that override both an in-process
``os.environ`` assignment and ``jax.config.update("jax_platforms", "cpu")``
— and with those hooks installed, the "cpu" backend executes deep
elementwise graphs with exponential-in-depth runtime (a 28-deep Goldilocks
mul chain ran 200ms per 128 lanes; the same program on a clean local CPU
backend runs in microseconds).  So if the variable is missing we re-exec
the whole pytest process with it set.
"""

import os
import sys

if os.environ.get("JAX_PLATFORMS") != "cpu" and "pytest" in sys.modules:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.execv(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:])

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
