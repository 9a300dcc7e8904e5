"""End-to-end ACIR tests: factory program -> translate -> prove -> verify,
the universal oracle the reference uses for every opcode (SURVEY.md §4),
plus the full file-based CLI flow (nargo-artifact in, proof/vk files out)."""

import subprocess
import sys

import numpy as np
import pytest

import factories
from tpu_acir_prover.acir import codec, ir
from tpu_acir_prover.acir.translator import translate_program
from tpu_acir_prover.circuit.compile import compile_circuit
from tpu_acir_prover.field.gl import P
from tpu_acir_prover.prover.config import TEST_CONFIG
from tpu_acir_prover.prover.prove import ProvingKey, prove
from tpu_acir_prover.prover.verify import verify


def run_e2e(name, tamper=None):
    prog, wm = factories.ALL_SMALL[name]()
    tr = translate_program(prog)
    cc = compile_circuit(tr.builder)
    pk = ProvingKey(cc, TEST_CONFIG, xp=np)
    if tamper:
        wm = dict(wm)
        tamper(wm)
    ext = tr.external_values(wm)
    proof = prove(pk, ext, check_constraints=True)
    verify(pk.vk, proof)
    return tr, cc, proof


@pytest.mark.parametrize("name", sorted(factories.ALL_SMALL))
def test_prove_verify(name):
    run_e2e(name)


def test_public_inputs_exposed():
    _, _, proof = run_e2e("assert_x_equals_5")
    assert proof.public_inputs == [5]
    _, _, proof = run_e2e("fibonacci")
    assert proof.public_inputs == [144]  # w11 of the chain 1,1,2,...


def test_bad_witness_rejected():
    with pytest.raises(AssertionError):
        run_e2e("assert_x_equals_5", tamper=lambda wm: wm.update({0: 6}))
    with pytest.raises(AssertionError):
        run_e2e("xor_32", tamper=lambda wm: wm.update({2: wm[2] ^ 1}))
    with pytest.raises(AssertionError):
        # witness 8 is the read-back value of the write-then-read program
        run_e2e("memory_write", tamper=lambda wm: wm.update({8: 999}))


def test_range_overflow_rejected():
    prog, _ = factories.range_check(8, value=256)
    tr = translate_program(prog)
    cc = compile_circuit(tr.builder)
    pk = ProvingKey(cc, TEST_CONFIG, xp=np)
    with pytest.raises(AssertionError):
        prove(pk, tr.external_values({0: 256}), check_constraints=True)


def test_range_34_bits_panics():
    """>33-bit RANGE must be rejected at translation (mod.rs:131-134)."""
    prog, _ = factories.range_check(34, value=1)
    with pytest.raises(AssertionError, match="33 bits"):
        translate_program(prog)


def test_memory_out_of_range_index_rejected():
    # block of 5 (padded to 8): reading index 6 must be unsatisfiable
    prog, wm = factories.memory_write_then_read(values=(1, 2, 3, 4, 5),
                                                windex=1, wvalue=42, rindex=1)
    tr = translate_program(prog)
    cc = compile_circuit(tr.builder)
    pk = ProvingKey(cc, TEST_CONFIG, xp=np)
    wm = dict(wm)
    wm[7] = 6   # read index witness
    wm[8] = 0   # claimed read value
    with pytest.raises(AssertionError):
        prove(pk, tr.external_values(wm), check_constraints=True)


def test_cli_happy_path(tmp_path):
    """make verification_happy_path analog (Makefile:38-54): artifact +
    witness files -> prove -> write_vk -> verify via the CLI."""
    prog, wm = factories.fibonacci()
    bc = tmp_path / "circuit.json"
    wit = tmp_path / "witness.gz"
    codec.save_program_artifact(str(bc), prog)
    codec.save_witness_stack(
        str(wit), ir.WitnessStack([ir.StackItem(0, wm)]))
    proof_p = tmp_path / "proof"
    vk_p = tmp_path / "vk"

    def cli(*args):
        return subprocess.run(
            [sys.executable, "-m", "tpu_acir_prover.cli", *args],
            capture_output=True, text=True,
            env={"PATH": "/usr/bin:/bin", "TPU_ACIR_BACKEND": "numpy",
                 "PYTHONPATH": "/root/repo",
                 "JAX_PLATFORMS": "cpu"})

    r = cli("prove", "-b", str(bc), "-w", str(wit), "-o", str(proof_p),
            "--test-config")
    assert r.returncode == 0, r.stderr
    r = cli("write_vk", "-b", str(bc), "-o", str(vk_p), "--test-config")
    assert r.returncode == 0, r.stderr
    r = cli("verify", "-k", str(vk_p), "-p", str(proof_p))
    assert r.returncode == 0, r.stderr
    assert r.stdout == ""  # success = empty output (README.md:63)

    # corrupted proof -> nonzero exit
    data = bytearray(proof_p.read_bytes())
    data[60] ^= 1
    (tmp_path / "bad_proof").write_bytes(bytes(data))
    r = cli("verify", "-k", str(vk_p), "-p", str(tmp_path / "bad_proof"))
    assert r.returncode == 1
    assert "error" in r.stderr
