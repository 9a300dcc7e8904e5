"""Fused single-program prover parity: prove_fused must produce
byte-identical serialized proofs to the per-phase prove() and pass the host
verifier, across circuits with and without lookups (the LogUp Z columns and
quotient terms take different code paths).

The whole-prover XLA program is a one-time multi-minute compile per
circuit shape on this 2-core CPU host (cached in .jax_cache afterwards),
so the default suite runs one circuit; RUN_SLOW=1 adds the lookup and
random-access shapes."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

import factories
from tpu_acir_prover.acir.translator import translate_program
from tpu_acir_prover.circuit.compile import compile_circuit
from tpu_acir_prover.prover.config import TEST_CONFIG
from tpu_acir_prover.prover.fused import prove_fused
from tpu_acir_prover.prover.prove import ProvingKey, prove
from tpu_acir_prover.prover.serialization import serialize_proof
from tpu_acir_prover.prover.verify import verify


# range_33 exercises the LogUp lookup path; memory_write the one-hot
# mux/random-access path; fibonacci the plain AssertZero path.
CIRCUITS = ["fibonacci"]
if os.environ.get("RUN_SLOW") == "1":
    CIRCUITS += ["range_33", "memory_write"]


@pytest.mark.parametrize("name", CIRCUITS)
def test_fused_matches_per_phase(name):
    prog, wm = factories.ALL_SMALL[name]()
    tr = translate_program(prog)
    cc = compile_circuit(tr.builder)
    ext = tr.external_values(wm)

    pk = ProvingKey(cc, TEST_CONFIG, xp=jnp)
    proof_phase = prove(pk, ext)
    proof_fused = prove_fused(pk, ext)
    verify(pk.vk, proof_fused)
    assert serialize_proof(proof_fused) == serialize_proof(proof_phase)


def test_fused_bad_witness_rejected():
    # fibonacci: reuses the compiled fused program from the parity test
    # (same circuit shape), so this adds no extra multi-minute XLA compile
    prog, wm = factories.fibonacci()
    tr = translate_program(prog)
    cc = compile_circuit(tr.builder)
    pk = ProvingKey(cc, TEST_CONFIG, xp=jnp)
    bad = dict(wm)
    bad[2] = (bad[2] + 1) % (2**64)
    proof = prove_fused(pk, tr.external_values(bad))
    with pytest.raises(AssertionError):
        verify(pk.vk, proof)
