"""Weak-scaling sweep of the sharded SPMD prover on a virtual CPU mesh.

Fixed rows-per-shard, sp = 1/2/4/8 shards (jax Mesh over
xla_force_host_platform_device_count devices): measures steady-state
prove_sharded wall time and reports parallel efficiency
t(sp=1) / t(sp=N) (1.0 = perfect weak scaling).  This is the honest
stand-in for BASELINE.md's "ops/s efficiency at 1 chip -> N hosts" until
real multi-chip hardware is attached; on the virtual mesh all shards
timeshare the host cores, so the ideal value is bounded by the host's
core count, not 1.0 — the curve's value is catching regressions in the
collective schedule (an extra gather/permute shows up directly).

Prints one JSON line per sweep point and a final summary line.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_enable_x64", True)
    from jax.sharding import Mesh
    from tpu_acir_prover.prover.config import TEST_CONFIG
    from tpu_acir_prover.parallel.prove import (ShardedProvingKey,
                                                prove_sharded)
    from tpu_acir_prover.utils.bench_circuits import mul_chain_circuit

    log_per_shard = int(os.environ.get("SCALING_LOG_PER_SHARD", "10"))
    reps = int(os.environ.get("SCALING_REPS", "2"))
    devs = jax.devices("cpu")
    results = {}
    ext = np.array([], dtype=np.uint64)
    for sp in (1, 2, 4, 8):
        if sp > len(devs):
            break
        n_log = log_per_shard + sp.bit_length() - 1
        cc = mul_chain_circuit(n_log)
        mesh = Mesh(np.array(devs[:sp]), ("sp",))
        t0 = time.perf_counter()
        spk = ShardedProvingKey(cc, TEST_CONFIG, mesh=mesh)
        proof = prove_sharded(spk, ext)  # compile + warmup
        warm = time.perf_counter() - t0
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            proof = prove_sharded(spk, ext)
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        results[sp] = dt
        print(f"  sp={sp} n=2^{n_log} warmup={warm:.1f}s steady={dt:.3f}s",
              file=sys.stderr, flush=True)
        del proof, spk
    if not results:
        return 1
    base = results.get(1)
    eff = {sp: round(base / dt, 3) for sp, dt in results.items()}
    curve = {f"sp{sp}": round(dt, 3) for sp, dt in results.items()}
    max_sp = max(results)
    print(json.dumps({
        "metric": f"sharded_weak_scaling_efficiency_sp{max_sp} "
                  f"(2^{log_per_shard} rows/shard, virtual CPU mesh) "
                  f"curve={curve}",
        "value": eff[max_sp],
        "unit": "t(sp1)/t(spN)",
        "vs_baseline": eff[max_sp],
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
