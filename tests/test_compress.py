"""Compressed proofs: path pruning round-trips through bytes and still
verifies; tampering is caught.  Analog of the reference's compressed-proof
boundary (prove_action.rs:64-79, verify_action.rs:14-16)."""

import numpy as np
import pytest

import factories
from tpu_acir_prover.acir.translator import translate_program
from tpu_acir_prover.circuit.compile import compile_circuit
from tpu_acir_prover.prover.compress import compress_proof, decompress_proof
from tpu_acir_prover.prover.config import TEST_CONFIG
from tpu_acir_prover.prover.prove import ProvingKey, prove
from tpu_acir_prover.prover.serialization import (
    deserialize_compressed_proof, serialize_compressed_proof,
    serialize_proof)
from tpu_acir_prover.prover.verify import VerificationError, verify


def _prove(name):
    prog, wm = factories.ALL_SMALL[name]()
    tr = translate_program(prog)
    cc = compile_circuit(tr.builder)
    pk = ProvingKey(cc, TEST_CONFIG, xp=np)
    proof = prove(pk, tr.external_values(wm))
    return pk.vk, proof


@pytest.mark.parametrize("name", ["assert_x_equals_5", "fibonacci"])
def test_compress_roundtrip_verifies(name):
    vk, proof = _prove(name)
    cp = compress_proof(vk, proof)
    data = serialize_compressed_proof(cp)
    cp2 = deserialize_compressed_proof(data)
    restored = decompress_proof(vk, cp2)
    verify(vk, restored)
    # the restored proof is byte-identical to the original
    assert serialize_proof(restored) == serialize_proof(proof)


def test_compression_shrinks_proof():
    vk, proof = _prove("fibonacci")
    full = serialize_proof(proof)
    comp = serialize_compressed_proof(compress_proof(vk, proof))
    assert len(comp) < len(full)
    pruned = sum(len(s) for s in
                 compress_proof(vk, proof).pruned_paths)
    total = sum(len(o.path) for q in proof.fri_queries for o in q.initial)
    total += sum(len(s.path) for q in proof.fri_queries for s in q.steps)
    assert pruned < total  # something was actually pruned


def test_tampered_compressed_proof_fails():
    vk, proof = _prove("assert_x_equals_5")
    cp = compress_proof(vk, proof)
    cp.pruned_paths[1][0] = tuple((x + 1) % (2**64 - 2**32 + 1)
                                  for x in cp.pruned_paths[1][0])
    with pytest.raises(AssertionError):
        verify(vk, decompress_proof(vk, cp))


def test_tampered_row_fails():
    vk, proof = _prove("assert_x_equals_5")
    cp = compress_proof(vk, proof)
    cp.query_rows[0][1][0] = (cp.query_rows[0][1][0] + 1) % (2**64 - 2**32 + 1)
    with pytest.raises(AssertionError):
        verify(vk, decompress_proof(vk, cp))
