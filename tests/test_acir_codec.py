"""Round-trip tests for the ACIR 0.47 wire-format codec.

The reference consumes nargo artifacts at its serialization boundary
(/root/reference/plonky2-backend/src/noir_and_plonky2_serialization.rs:42-64);
since the forked nargo is unavailable here, these tests assert that our own
encoder/decoder pair is self-consistent over every opcode shape the backend
handles (SURVEY.md §2 C6-C11) plus the opaque ones it ignores.
"""

import os

from tpu_acir_prover.acir import codec, ir
from tpu_acir_prover.field.gl import P


def roundtrip_program(p: ir.Program) -> ir.Program:
    data = codec.serialize_program(p)
    p2 = codec.deserialize_program(data)
    assert codec.serialize_program(p2) == data
    return p2


def expr(mul=(), lin=(), q_c=0):
    return ir.Expression(tuple(mul), tuple(lin), q_c)


def test_expression_roundtrip():
    e = expr(mul=[(3, 0, 1), (P - 1, 2, 2)], lin=[(7, 4)], q_c=P - 5)
    c = ir.Circuit(5, [ir.AssertZero(e)], None, (4,), (0, 1, 2), (4,))
    p2 = roundtrip_program(ir.Program([c]))
    op = p2.functions[0].opcodes[0]
    assert isinstance(op, ir.AssertZero)
    assert op.expr == e
    assert p2.functions[0].public_parameters == (0, 1, 2)
    assert p2.functions[0].private_parameters == (4,)


def test_blackbox_roundtrip():
    ops = [
        ir.BlackBoxRange(ir.FunctionInput(3, 32)),
        ir.BlackBoxAnd(ir.FunctionInput(0, 8), ir.FunctionInput(1, 8), 2),
        ir.BlackBoxXor(ir.FunctionInput(0, 16), ir.FunctionInput(1, 16), 2),
        ir.BlackBoxSha256Compression(
            tuple(ir.FunctionInput(i, 32) for i in range(16)),
            tuple(ir.FunctionInput(16 + i, 32) for i in range(8)),
            tuple(range(24, 32))),
        ir.BlackBoxEcdsaSecp256k1(
            tuple(ir.FunctionInput(i, 8) for i in range(32)),
            tuple(ir.FunctionInput(32 + i, 8) for i in range(32)),
            tuple(ir.FunctionInput(64 + i, 8) for i in range(64)),
            tuple(ir.FunctionInput(128 + i, 8) for i in range(32)), 160),
    ]
    c = ir.Circuit(161, ops)
    p2 = roundtrip_program(ir.Program([c]))
    assert [type(o) for o in p2.functions[0].opcodes] == [type(o) for o in ops]
    assert p2.functions[0].opcodes == ops


def test_memory_and_brillig_roundtrip():
    ops = [
        ir.MemoryInit(0, (1, 2, 3), 0, 0),
        ir.MemoryOp(0, ir.MemOp(expr(q_c=0), expr(lin=[(1, 4)]),
                                expr(lin=[(1, 5)])), None),
        ir.MemoryOp(0, ir.MemOp(expr(q_c=1), expr(q_c=2),
                                expr(lin=[(1, 6)])), expr(q_c=1)),
        ir.BrilligCall(7, (("single", expr(q_c=9)),
                           ("array", (expr(lin=[(1, 0)]), expr(q_c=2))),
                           ("memory", 3)),
                       (("simple", 8), ("array", (9, 10))), expr(q_c=1)),
        ir.Directive(expr(lin=[(1, 0)]), (1, 2), 256),
        ir.Call(1, (0, 1), (2,), None),
    ]
    c = ir.Circuit(11, ops)
    p2 = roundtrip_program(ir.Program([c]))
    assert p2.functions[0].opcodes == ops


def test_unknown_blackbox_carried_opaquely():
    bb = ir.BlackBoxOther(0, b"")
    w = codec.Writer()
    # AES128Encrypt with empty vecs and zeroed 16-byte arrays
    w.u32(0)
    w.seq_len(0)
    for _ in range(32):
        codec.write_function_input(w, ir.FunctionInput(0, 8))
    w.seq_len(0)
    payload = w.bytes_out()[4:]
    bb = ir.BlackBoxOther(0, payload)
    c = ir.Circuit(1, [bb])
    p2 = roundtrip_program(ir.Program([c]))
    op = p2.functions[0].opcodes[0]
    assert isinstance(op, ir.BlackBoxOther)
    assert op.variant == 0 and op.raw == payload


def test_witness_stack_roundtrip():
    ws = ir.WitnessStack([ir.StackItem(0, {0: 5, 3: P - 1, 7: 0})])
    data = codec.serialize_witness_stack(ws)
    ws2 = codec.deserialize_witness_stack(data)
    assert ws2.peek().witness == {0: 5, 3: P - 1, 7: 0}
    assert codec.serialize_witness_stack(ws2) == data


def test_file_artifacts(tmp_path):
    c = ir.Circuit(3, [ir.AssertZero(expr(mul=[(1, 0, 1)], lin=[(P - 1, 2)]))],
                   None, (0, 1), (), (2,))
    p = ir.Program([c])
    path = os.path.join(tmp_path, "circuit.json")
    codec.save_program_artifact(path, p)
    p2 = codec.load_program_artifact(path)
    assert p2.functions[0].opcodes == p.functions[0].opcodes

    ws = ir.WitnessStack([ir.StackItem(0, {0: 2, 1: 3, 2: 6})])
    wpath = os.path.join(tmp_path, "witness.gz")
    codec.save_witness_stack(wpath, ws)
    ws2 = codec.load_witness_stack(wpath)
    assert ws2.peek().witness == {0: 2, 1: 3, 2: 6}
