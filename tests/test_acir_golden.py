"""Golden byte-exact ACIR vectors + decoder truncation fuzz.

The round-trip tests in test_acir_codec.py can't catch a systematic
misreading of the bincode wire format (encoder and decoder would agree on
the wrong layout).  These vectors are hand-assembled from the acir 0.47
bincode rules (little-endian fixint, u64 sequence lengths, u32 enum
discriminants / witness indices, u8 bools, FieldElement as a
length-prefixed lowercase hex string) — the layout the reference consumes
at noir_and_plonky2_serialization.rs:42-64."""

import struct

import pytest

from tpu_acir_prover.acir import codec, ir
from tpu_acir_prover.acir.codec import AcirDecodeError
from tpu_acir_prover.field.gl import P


def u32(v):
    return struct.pack("<I", v)


def u64(v):
    return struct.pack("<Q", v)


def field(v):
    s = f"{v % P:016x}".encode()
    return u64(len(s)) + s


def circuit_tail(private=(), public=(), ret=()):
    """expression_width None + param groups + no assert_messages + not
    recursive."""
    out = u32(0)  # ExpressionWidth::Unbounded
    for group in (private, public, ret):
        out += u64(len(group)) + b"".join(u32(w) for w in group)
    out += u64(0)   # assert_messages: empty vec
    out += b"\x00"  # recursive: false
    return out


def program_bytes(cwi, opcode_bytes, **tail_kw):
    return (u64(1)                    # one function
            + u32(cwi)                # current_witness_index
            + u64(1) + opcode_bytes   # one opcode
            + circuit_tail(**tail_kw)
            + u64(0))                 # empty unconstrained-functions vec


def test_golden_assert_zero():
    """assert(x - 5 == 0): AssertZero { mul: [], lin: [(1, w0)], q_c: -5 }."""
    op = (u32(0)                      # Opcode::AssertZero
          + u64(0)                    # mul_terms: empty
          + u64(1) + field(1) + u32(0)  # linear: (1, w0)
          + field(P - 5))             # q_c = -5 mod p
    data = program_bytes(1, op, public=(0,))
    prog = codec.deserialize_program(data)
    c = prog.functions[0]
    assert c.opcodes == [ir.AssertZero(
        ir.Expression((), ((1, 0),), P - 5))]
    assert c.public_parameters == (0,)
    assert codec.serialize_program(prog) == data


def test_golden_range():
    """RANGE(w3, 32 bits): BlackBoxFuncCall::RANGE, discriminant 3."""
    op = (u32(1)          # Opcode::BlackBoxFuncCall
          + u32(3)        # BlackBox variant: RANGE
          + u32(3)        # FunctionInput.witness = w3
          + u32(32))      # FunctionInput.num_bits
    data = program_bytes(4, op, private=(3,))
    prog = codec.deserialize_program(data)
    assert prog.functions[0].opcodes == [
        ir.BlackBoxRange(ir.FunctionInput(3, 32))]
    assert codec.serialize_program(prog) == data


def test_golden_memory_init_and_op():
    """MemoryInit(block 0, [w0, w1]) + MemoryOp read at w2 -> w3."""
    init = (u32(4)                    # Opcode::MemoryInit
            + u32(0)                  # block_id
            + u64(2) + u32(0) + u32(1)  # init witnesses
            + u32(0))                 # BlockType::Memory
    zero_expr = u64(0) + u64(0) + field(0)
    # Expression { mul: [], lin: [(1, w)], q_c: 0 }
    lin1 = lambda w: u64(0) + u64(1) + field(1) + u32(w) + field(0)  # noqa: E731
    memop = (u32(3)                   # Opcode::MemoryOp
             + u32(0)                 # block_id
             + zero_expr              # operation = 0 (read)
             + lin1(2)                # index = w2
             + lin1(3)                # value = w3
             + b"\x00")               # predicate: None
    data = (u64(1) + u32(4)
            + u64(2) + init + memop
            + circuit_tail(private=(0, 1, 2), ret=(3,))
            + u64(0))
    prog = codec.deserialize_program(data)
    ops = prog.functions[0].opcodes
    assert ops[0] == ir.MemoryInit(0, (0, 1))
    assert isinstance(ops[1], ir.MemoryOp)
    assert ops[1].op.index.linear_combinations == ((1, 2),)
    assert codec.serialize_program(prog) == data


def test_golden_witness_value_field_is_hex():
    """FieldElement wire form is a length-prefixed lowercase hex string."""
    assert field(255) == u64(16) + b"00000000000000ff"


def test_truncation_fuzz():
    """Every truncation inside the functions section must raise
    AcirDecodeError; truncations in the opaque Brillig tail must not."""
    import factories
    prog, _ = factories.memory_write_then_read()
    data = codec.serialize_program(prog)
    tail_len = len(prog.unconstrained_raw)
    funcs_len = len(data) - tail_len
    for cut in range(funcs_len):
        with pytest.raises(AcirDecodeError):
            codec.deserialize_program(data[:cut])
    # cutting the whole tail still parses (empty = no unconstrained fns)...
    codec.deserialize_program(data[:funcs_len])
    # ...but a PARTIAL tail (truncated count / trailing garbage) must not
    # round-trip silently
    for cut in range(funcs_len + 1, len(data)):
        with pytest.raises(AcirDecodeError):
            codec.deserialize_program(data[:cut])
    with pytest.raises(AcirDecodeError):
        codec.deserialize_program(data + b"\x99")
