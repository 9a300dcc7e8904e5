"""End-to-end proof-system tests: build circuit -> prove -> verify.

Mirrors the reference's universal test oracle (SURVEY.md §4: every test
proves a real small circuit and verifies it), plus negative cases.
"""

import numpy as np
import pytest

from tpu_acir_prover.circuit.builder import CircuitBuilder
from tpu_acir_prover.circuit.compile import compile_circuit
from tpu_acir_prover.field.gl import P
from tpu_acir_prover.prover.config import TEST_CONFIG
from tpu_acir_prover.prover.prove import ProvingKey, prove
from tpu_acir_prover.prover.verify import verify, VerificationError


def build_square_circuit():
    """public x, private y, constraint y*y == x (x = 25, y = 5)."""
    b = CircuitBuilder()
    x = b.add_external()
    y = b.add_external()
    b.register_public_input(x)
    sq = b.mul(y, y)
    b.assert_equal(sq, x)
    return b, [x, y]


def test_witness_generation_and_constraints():
    b, _ = build_square_circuit()
    cc = compile_circuit(b)
    vals = cc.generate_witness(np.array([25, 5], dtype=np.uint64))
    assert cc.check_constraints(vals) is None
    bad = cc.generate_witness(np.array([26, 5], dtype=np.uint64))
    assert cc.check_constraints(bad) is not None


def test_prove_verify_roundtrip():
    b, _ = build_square_circuit()
    cc = compile_circuit(b)
    pk = ProvingKey(cc, TEST_CONFIG, xp=np)
    proof = prove(pk, np.array([25, 5], dtype=np.uint64), check_constraints=True)
    assert proof.public_inputs == [25]
    verify(pk.vk, proof)


def test_verify_rejects_wrong_public_input():
    b, _ = build_square_circuit()
    cc = compile_circuit(b)
    pk = ProvingKey(cc, TEST_CONFIG, xp=np)
    proof = prove(pk, np.array([25, 5], dtype=np.uint64))
    proof.public_inputs = [26]
    with pytest.raises(AssertionError):
        verify(pk.vk, proof)


def test_verify_rejects_tampered_opening():
    b, _ = build_square_circuit()
    cc = compile_circuit(b)
    pk = ProvingKey(cc, TEST_CONFIG, xp=np)
    proof = prove(pk, np.array([25, 5], dtype=np.uint64))
    w0 = proof.openings.wires[0]
    proof.openings.wires[0] = ((w0[0] + 1) % P, w0[1])
    with pytest.raises(AssertionError):
        verify(pk.vk, proof)


def test_verify_rejects_tampered_query_row():
    b, _ = build_square_circuit()
    cc = compile_circuit(b)
    pk = ProvingKey(cc, TEST_CONFIG, xp=np)
    proof = prove(pk, np.array([25, 5], dtype=np.uint64))
    row = proof.fri_queries[0].initial[1].row
    row[0] = (row[0] + 1) % P
    with pytest.raises(AssertionError):
        verify(pk.vk, proof)


def test_unsatisfiable_witness_caught():
    b, _ = build_square_circuit()
    cc = compile_circuit(b)
    pk = ProvingKey(cc, TEST_CONFIG, xp=np)
    with pytest.raises(AssertionError):
        prove(pk, np.array([24, 5], dtype=np.uint64), check_constraints=True)


def test_richer_gadgets_roundtrip():
    b = CircuitBuilder()
    a = b.add_external()
    c = b.add_external()
    b.register_public_input(a)
    # mix of gadgets: lincomb, select, bits, xor, is_equal, div
    s = b.lincomb([(3, a), (5, c)], 7)
    bits = b.split_le(a, 8)
    x = b.bit_xor(bits[0], bits[1])
    y = b.bit_and(bits[2], bits[3])
    sel = b.select(x, s, y)
    eq = b.is_equal(a, c)
    d = b.div(s, a)
    b.assert_bool(eq)
    b.assert_zero(b.mul(eq, b.sub(a, c)))  # consistent: eq*(a-c) == 0
    _ = d, sel
    cc = compile_circuit(b)
    pk = ProvingKey(cc, TEST_CONFIG, xp=np)
    proof = prove(pk, np.array([173, 91], dtype=np.uint64),
                  check_constraints=True)
    verify(pk.vk, proof)
