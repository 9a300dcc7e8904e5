"""Backend parity: the jitted jax prover path produces proofs the host
verifier accepts, identical in transcript to the numpy path."""

import numpy as np

import jax.numpy as jnp

from tpu_acir_prover.circuit.builder import CircuitBuilder
from tpu_acir_prover.circuit.compile import compile_circuit
from tpu_acir_prover.prover.config import TEST_CONFIG
from tpu_acir_prover.prover.prove import ProvingKey, prove
from tpu_acir_prover.prover.serialization import serialize_proof
from tpu_acir_prover.prover.verify import verify


def test_jax_prove_matches_numpy_and_verifies():
    b = CircuitBuilder()
    x = b.add_external()
    y = b.add_external()
    b.register_public_input(x)
    s = b.lincomb([(2, b.mul(y, y)), (3, y)], 1)
    b.assert_equal(s, x)
    cc = compile_circuit(b)
    ext = np.array([2 * 25 + 3 * 5 + 1, 5], dtype=np.uint64)

    pk_np = ProvingKey(cc, TEST_CONFIG, xp=np)
    proof_np = prove(pk_np, ext)
    verify(pk_np.vk, proof_np)

    pk_j = ProvingKey(cc, TEST_CONFIG, xp=jnp)
    assert pk_j.vk.constants_cap == pk_np.vk.constants_cap
    proof_j = prove(pk_j, ext)
    verify(pk_j.vk, proof_j)
    # deterministic pipeline -> byte-identical proofs across backends
    assert serialize_proof(proof_j) == serialize_proof(proof_np)
