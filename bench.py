"""Benchmark harness: Goldilocks NTT throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: radix-2 NTT butterflies/s/chip over a (2^20, 6) batch — the hot
kernel of LDE/FRI proving (BASELINE.md: the reference publishes no numbers;
its analog is the plonky2 fork's rayon FFT).  vs_baseline is the ratio to a
single-core Rust plonky2 FFT estimate of ~175e6 butterflies/s (2^20-point
forward FFT in ~60 ms/column on a modern x86 core), the "single-core Rust"
yardstick named in BASELINE.json.
"""

import json
import os
import sys
import time

import numpy as np

LOG_N = int(os.environ.get("BENCH_LOG_N", "20"))
COLS = int(os.environ.get("BENCH_COLS", "6"))
REPS = int(os.environ.get("BENCH_REPS", "5"))
MODE = os.environ.get("BENCH_MODE", "prove")  # "prove" | "ntt" | "ecdsa"
RUST_SINGLE_CORE_BUTTERFLIES_PER_S = 175e6
# single-core Rust plonky2 end-to-end prove estimate at 2^20 rows
# (plonky2 README-class numbers extrapolated to one core): ~20 s
RUST_SINGLE_CORE_PROVE_S = 20.0


def bench_prove():
    """End-to-end prover wall time at 2^LOG_N rows (steady state, compile
    cached in the ProvingKey)."""
    from tpu_acir_prover.prover.config import STANDARD_CONFIG
    from tpu_acir_prover.prover.prove import ProvingKey, prove
    from tpu_acir_prover.utils.bench_circuits import mul_chain_circuit

    from tpu_acir_prover.utils.timing import env_timer

    # fused single-program prover up to 2^18 rows; above that the one
    # program's full oracle liveness exceeds a v5e chip's 16G HBM (measured:
    # 16.64G at 2^20), so large traces use the per-phase path whose
    # inter-phase temps are freed between programs
    fused_default = "1" if LOG_N <= 18 else "0"
    if os.environ.get("BENCH_FUSED", fused_default) != "0":
        from tpu_acir_prover.prover.fused import prove_fused as prove

    cc = mul_chain_circuit(LOG_N)
    t0 = time.perf_counter()
    pk = ProvingKey(cc, STANDARD_CONFIG)
    print(f"  pk_build: {time.perf_counter() - t0:.2f}s", file=sys.stderr)
    ext = np.array([], dtype=np.uint64)
    t0 = time.perf_counter()
    prove(pk, ext, timer=env_timer())  # warmup: compiles every phase
    print(f"  warmup_prove: {time.perf_counter() - t0:.2f}s", file=sys.stderr)
    reps = max(1, REPS // 2)
    t0 = time.perf_counter()
    for _ in range(reps):
        timer = env_timer()
        proof = prove(pk, ext, timer=timer)
        if timer.enabled:
            timer.report()
    dt = (time.perf_counter() - t0) / reps
    del proof
    print(json.dumps({
        "metric": f"prover_wall_time_2pow{LOG_N}_rows",
        "value": round(dt, 3),
        "unit": "s",
        "vs_baseline": round(RUST_SINGLE_CORE_PROVE_S / dt, 2),
    }))


def bench_ecdsa():
    """End-to-end ECDSA prove+verify wall time (the reference's flagship
    workload, test_precompiled.rs:7-44) at STANDARD_CONFIG."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    import factories
    from tpu_acir_prover.acir.translator import translate_program
    from tpu_acir_prover.circuit.compile import compile_circuit
    from tpu_acir_prover.prover.config import STANDARD_CONFIG
    from tpu_acir_prover.prover.fused import prove_fused
    from tpu_acir_prover.prover.prove import ProvingKey
    from tpu_acir_prover.prover.verify import verify

    prog, wm = factories.ecdsa_secp256k1()
    t0 = time.perf_counter()
    tr = translate_program(prog)
    cc = compile_circuit(tr.builder)
    print(f"  translate+compile: {time.perf_counter() - t0:.2f}s "
          f"({cc.n} rows)", file=sys.stderr)
    t0 = time.perf_counter()
    pk = ProvingKey(cc, STANDARD_CONFIG)
    print(f"  pk_build: {time.perf_counter() - t0:.2f}s", file=sys.stderr)
    ext = tr.external_values(wm)
    t0 = time.perf_counter()
    proof = prove_fused(pk, ext)
    print(f"  warmup_prove: {time.perf_counter() - t0:.2f}s", file=sys.stderr)
    verify(pk.vk, proof)
    reps = max(1, REPS // 2)
    t0 = time.perf_counter()
    for _ in range(reps):
        proof = prove_fused(pk, ext)
    dt = (time.perf_counter() - t0) / reps
    verify(pk.vk, proof)
    print(json.dumps({
        "metric": f"ecdsa_prover_wall_time_2pow{cc.log_n}_rows",
        "value": round(dt, 3),
        "unit": "s",
        "vs_baseline": round(RUST_SINGLE_CORE_PROVE_S / dt, 2),
    }))


def main():
    from tpu_acir_prover.utils.jaxcfg import setup_jax_cache
    setup_jax_cache()
    if MODE == "prove":
        return bench_prove()
    if MODE == "ecdsa":
        return bench_ecdsa()
    import jax
    import jax.numpy as jnp
    from tpu_acir_prover.field.gl import make_gl, P
    from tpu_acir_prover.prover.ntt import ntt

    G = make_gl(jnp)
    n = 1 << LOG_N
    rng = np.random.default_rng(0)
    vals = rng.integers(0, P, size=(n, COLS), dtype=np.uint64)
    lo = jnp.asarray((vals & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    hi = jnp.asarray((vals >> np.uint64(32)).astype(np.uint32))

    fn = jax.jit(lambda a, b: ntt(G, (a, b)))
    out = fn(lo, hi)
    out[0].block_until_ready()  # compile + warmup

    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(lo, hi)
    out[0].block_until_ready()
    dt = (time.perf_counter() - t0) / REPS

    butterflies = COLS * (n // 2) * LOG_N
    rate = butterflies / dt
    print(json.dumps({
        "metric": f"goldilocks_ntt_butterflies_per_s_chip (2^{LOG_N} x {COLS})",
        "value": round(rate, 1),
        "unit": "butterflies/s",
        "vs_baseline": round(rate / RUST_SINGLE_CORE_BUTTERFLIES_PER_S, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
