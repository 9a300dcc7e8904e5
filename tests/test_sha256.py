"""SHA-256 compression gadget vs a pure-python reference implementation
(analog of the reference's test_sha256_internal.rs unit + e2e tests)."""

import os

import numpy as np
import pytest

from tpu_acir_prover.acir import ir
from tpu_acir_prover.acir.translator import translate_program
from tpu_acir_prover.circuit.builder import CircuitBuilder
from tpu_acir_prover.circuit.compile import compile_circuit
from tpu_acir_prover.ops.sha256 import K, sha256_compress, word_from_var
from tpu_acir_prover.prover.config import TEST_CONFIG
from tpu_acir_prover.prover.prove import ProvingKey, prove
from tpu_acir_prover.prover.verify import verify

H0 = [0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
      0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19]


def ref_compress(msg, state):
    """Pure-python SHA-256 compression (spec reference)."""
    M32 = 0xFFFFFFFF

    def rotr(x, r):
        return ((x >> r) | (x << (32 - r))) & M32

    w = list(msg)
    for i in range(16, 64):
        s0 = rotr(w[i - 15], 7) ^ rotr(w[i - 15], 18) ^ (w[i - 15] >> 3)
        s1 = rotr(w[i - 2], 17) ^ rotr(w[i - 2], 19) ^ (w[i - 2] >> 10)
        w.append((w[i - 16] + s0 + w[i - 7] + s1) & M32)
    a, b, c, d, e, f, g, h = state
    for i in range(64):
        S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = (h + S1 + ch + K[i] + w[i]) & M32
        S0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = (S0 + maj) & M32
        h, g, f, e, d, c, b, a = g, f, e, (d + t1) & M32, c, b, a, (t1 + t2) & M32
    return [(s + v) & M32 for s, v in zip(state, [a, b, c, d, e, f, g, h])]


def test_ref_compress_against_hashlib():
    """Sanity: compressing the padded block of b'' yields sha256(b'')."""
    import hashlib
    block = b"\x80" + b"\x00" * 55 + (0).to_bytes(8, "big")
    msg = [int.from_bytes(block[i * 4:(i + 1) * 4], "big") for i in range(16)]
    out = ref_compress(msg, H0)
    digest = b"".join(x.to_bytes(4, "big") for x in out)
    assert digest == hashlib.sha256(b"").digest()


@pytest.mark.skipif(os.environ.get("RUN_SLOW") != "1",
                    reason="2^16-row prove on the numpy path; RUN_SLOW=1")
def test_sha256_opcode_prove_verify():
    rng = np.random.default_rng(3)
    msg = [int(x) for x in rng.integers(0, 1 << 32, size=16)]
    state = list(H0)
    out = ref_compress(msg, state)

    op = ir.BlackBoxSha256Compression(
        tuple(ir.FunctionInput(i, 32) for i in range(16)),
        tuple(ir.FunctionInput(16 + i, 32) for i in range(8)),
        tuple(range(24, 32)))
    circ = ir.Circuit(32, [op], None, tuple(range(24)), (), tuple(range(24, 32)))
    prog = ir.Program([circ])
    wm = {i: v for i, v in enumerate(msg)}
    wm.update({16 + i: v for i, v in enumerate(state)})
    wm.update({24 + i: v for i, v in enumerate(out)})

    tr = translate_program(prog)
    cc = compile_circuit(tr.builder)
    pk = ProvingKey(cc, TEST_CONFIG, xp=np)
    proof = prove(pk, tr.external_values(wm), check_constraints=True)
    verify(pk.vk, proof)

    # negative: wrong output word
    bad = dict(wm)
    bad[24] ^= 1
    with pytest.raises(AssertionError):
        prove(pk, tr.external_values(bad), check_constraints=True)


def test_sha256_multiblock_witness():
    """sha256_long analog (chained compressions): witness-level check of
    the 2-block factory through the translator (fast; the prove variant is
    slow-marked below)."""
    import factories
    prog, wm = factories.sha256_multiblock(num_blocks=2)
    tr = translate_program(prog)
    cc = compile_circuit(tr.builder)
    vals = cc.generate_witness(tr.external_values(wm))
    assert cc.check_constraints(vals) is None
    from tpu_acir_prover.acir.translator import check_linked_outputs
    check_linked_outputs(tr, cc, prog.functions[0])


@pytest.mark.skipif(os.environ.get("RUN_SLOW") != "1",
                    reason="2^17-row prove; RUN_SLOW=1")
def test_sha256_multiblock_prove_verify():
    import factories
    prog, wm = factories.sha256_multiblock(num_blocks=2)
    tr = translate_program(prog)
    cc = compile_circuit(tr.builder)
    pk = ProvingKey(cc, TEST_CONFIG, xp=np)
    proof = prove(pk, tr.external_values(wm), check_constraints=True)
    verify(pk.vk, proof)


def test_gadget_matches_reference_directly():
    """Witness-level check without proving (fast row-count sanity too)."""
    rng = np.random.default_rng(5)
    msg = [int(x) for x in rng.integers(0, 1 << 32, size=16)]
    out_ref = ref_compress(msg, H0)
    b = CircuitBuilder()
    msg_vars = [b.add_external() for _ in range(16)]
    state_vars = [b.constant(v) for v in H0]
    words = sha256_compress(b, [word_from_var(b, v) for v in msg_vars],
                            [word_from_var(b, v) for v in state_vars])
    cc = compile_circuit(b)
    vals = cc.generate_witness(np.array(msg, dtype=np.uint64))
    assert cc.check_constraints(vals) is None
    got = [int(vals[w.value]) for w in words]
    assert got == out_ref
