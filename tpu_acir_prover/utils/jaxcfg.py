"""Central JAX configuration: persistent compilation cache.

The prover compiles O(log n) distinct XLA programs per circuit shape
(Merkle levels, FRI layers). On a TPU behind a network tunnel each
compile costs 5-30 s, so a cold 2^20-row prove would spend tens of
minutes in the compiler. The persistent cache (keyed by HLO hash) makes
every compile a one-time cost across *processes*: prime once, then every
CLI invocation / bench run / test reuses the on-disk executable.

The reference has no analog (its Rust plonky2 fork compiles nothing at
runtime); this is the TPU-native replacement for "the circuit is a
static Rust binary".
"""

from __future__ import annotations

import os

_DONE = False


def setup_jax_cache() -> None:
    """Enable JAX's persistent compilation cache (idempotent).

    Cache dir: $TPU_ACIR_JAX_CACHE, else <repo-root>/.jax_cache, else
    ~/.cache/tpu_acir_prover/jax. Set TPU_ACIR_JAX_CACHE=off to disable.
    """
    global _DONE
    if _DONE:
        return
    _DONE = True
    path = os.environ.get("TPU_ACIR_JAX_CACHE")
    if path == "off":
        return
    if not path:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        path = os.path.join(repo, ".jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        path = os.path.expanduser("~/.cache/tpu_acir_prover/jax")
        os.makedirs(path, exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def setup_jax() -> None:
    """Full JAX setup for prover entry points: persistent compile cache +
    the native-u64 Goldilocks path on the CPU backend (field/gl.py
    _use_u64 — ~5x fewer ops per field multiply, bit-identical values).
    x64 is never enabled on TPU (no 64-bit integer lanes)."""
    setup_jax_cache()
    import jax
    try:
        if jax.default_backend() == "cpu" and not jax.config.jax_enable_x64:
            jax.config.update("jax_enable_x64", True)
    except Exception:  # pragma: no cover - backend probing is best-effort
        pass
