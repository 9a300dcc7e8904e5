"""LogUp lookup-argument tests: range checks via the preprocessed table.

Capability analog of the reference's range-check gate tests
(plonky2-backend/src/plonky2_ecdsa/biguint/gates/range_check_u32.rs:236-251
and test_blackbox.rs RANGE cases), exercised against this framework's
LogUp argument instead of 2-bit-limb constraint gates.
"""

import numpy as np
import pytest

from tpu_acir_prover.circuit.builder import CircuitBuilder, NUM_WIRES
from tpu_acir_prover.circuit.compile import compile_circuit
from tpu_acir_prover.prover.config import TEST_CONFIG
from tpu_acir_prover.prover.prove import ProvingKey, prove
from tpu_acir_prover.prover.verify import verify, VerificationError


def _prove_verify(builder, ext_vals):
    cc = compile_circuit(builder)
    pk = ProvingKey(cc, TEST_CONFIG, xp=np)
    proof = prove(pk, np.array(ext_vals, dtype=np.uint64),
                  check_constraints=True)
    verify(pk.vk, proof)
    return cc, pk, proof


def test_lookup_range_ok():
    b = CircuitBuilder(lookup_bits=8)
    x = b.add_external()
    b.range_check(x, 8)
    y = b.add_external()
    b.range_check(y, 5)       # sub-width: dual lookup
    z = b.add_external()
    b.range_check(z, 19)      # multi-limb: hinted decomposition
    cc, pk, proof = _prove_verify(b, [200, 31, (1 << 19) - 3])
    assert cc.lookup_bits == 8
    assert cc.n >= 256


def test_lookup_value_out_of_range_rejected():
    b = CircuitBuilder(lookup_bits=8)
    x = b.add_external()
    b.range_check(x, 8)
    cc = compile_circuit(b)
    pk = ProvingKey(cc, TEST_CONFIG, xp=np)
    with pytest.raises(AssertionError):
        prove(pk, np.array([256], dtype=np.uint64), check_constraints=True)


def test_lookup_subwidth_overflow_rejected():
    """Value fits the table but not the narrower width: the scaled lookup
    must push it out of range."""
    b = CircuitBuilder(lookup_bits=8)
    x = b.add_external()
    b.range_check(x, 5)
    cc = compile_circuit(b)
    pk = ProvingKey(cc, TEST_CONFIG, xp=np)
    with pytest.raises(AssertionError):
        prove(pk, np.array([37], dtype=np.uint64), check_constraints=True)


def test_lookup_rows_packing():
    """W+1 lookups need exactly two lookup rows."""
    b = CircuitBuilder(lookup_bits=8)
    xs = [b.add_external() for _ in range(NUM_WIRES + 1)]
    for x in xs:
        b.lookup(x)
    cc = compile_circuit(b)
    assert cc.lookup_rows.shape[0] == 2
    pk = ProvingKey(cc, TEST_CONFIG, xp=np)
    proof = prove(pk, np.arange(NUM_WIRES + 1, dtype=np.uint64),
                  check_constraints=True)
    verify(pk.vk, proof)


def test_lookup_forged_multiplicity_fails():
    """Tampering with an opened value must break verification."""
    b = CircuitBuilder(lookup_bits=8)
    x = b.add_external()
    b.range_check(x, 8)
    cc, pk, proof = _prove_verify(b, [77])
    bad = proof
    ow = list(bad.openings.wires)
    ow[-1] = ((ow[-1][0] + 1) % (2**64 - 2**32 + 1), ow[-1][1])
    bad.openings.wires = ow
    with pytest.raises(AssertionError):
        verify(pk.vk, bad)


def test_no_lookup_circuit_has_no_table():
    b = CircuitBuilder()  # lookup_bits = 0
    x = b.add_external()
    b.range_check(x, 4)   # falls back to bit decomposition
    cc = compile_circuit(b)
    assert cc.lookup_bits == 0 and cc.table is None
    pk = ProvingKey(cc, TEST_CONFIG, xp=np)
    proof = prove(pk, np.array([9], dtype=np.uint64), check_constraints=True)
    verify(pk.vk, proof)
