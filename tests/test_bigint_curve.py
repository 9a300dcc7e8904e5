"""Witness-level tests of the biguint / nonnative / curve gadget stack
(analog of the reference's vendored-library unit tests, SURVEY.md §4 tier 4:
biguint add/sub/mul/cmp with random inputs, nonnative ops, curve gadgets)."""

import os

import numpy as np
import pytest

from tpu_acir_prover.circuit.builder import CircuitBuilder
from tpu_acir_prover.circuit.compile import compile_circuit
from tpu_acir_prover.ops import bigint as bg
from tpu_acir_prover.ops import secp256k1 as sec

RNG = np.random.default_rng(11)


def rand256():
    return int.from_bytes(RNG.bytes(32), "big")


def run_witness(b, external_vals=()):
    cc = compile_circuit(b)
    vals = cc.generate_witness(np.array(external_vals, dtype=np.uint64))
    bad = cc.check_constraints(vals)
    assert bad is None, f"constraint violated at row {bad}"
    return cc, vals


def ext_bytes(b, v: int, n=32):
    """External byte vars for a big-endian integer."""
    data = v.to_bytes(n, "big")
    vars_ = [b.add_external() for _ in range(n)]
    return vars_, list(data)


def test_big_mul_add_random():
    b = CircuitBuilder()
    x, y = rand256(), rand256()
    bx = bg.big_constant(b, x, 16)
    by = bg.big_constant(b, y, 16)
    prod = bg.big_mul(b, bx, by)
    s = bg.big_add(b, bx, by)
    cc, vals = run_witness(b)
    got_p = sum(int(vals[v]) << (16 * i) for i, v in enumerate(prod.limbs))
    got_s = sum(int(vals[v]) << (16 * i) for i, v in enumerate(s.limbs))
    assert got_p == x * y
    assert got_s == x + y


def test_big_le_and_lt():
    b = CircuitBuilder()
    x, y = rand256(), rand256()
    lo, hi = min(x, y), max(x, y)
    blo = bg.big_constant(b, lo, 16)
    bhi = bg.big_constant(b, hi, 16)
    bg.big_assert_le(b, blo, bhi)
    bg.big_assert_le(b, blo, blo)
    lt = bg.big_lt_bool(b, blo, bhi)
    le = bg.big_le_bool(b, bhi, bhi)
    nlt = bg.big_lt_bool(b, bhi, blo)
    cc, vals = run_witness(b)
    assert int(vals[lt]) == 1
    assert int(vals[le]) == 1
    assert int(vals[nlt]) == 0


def test_nn_mul_inv_add_sub():
    b = CircuitBuilder()
    x, y = rand256() % sec.Q, rand256() % sec.Q
    nx = sec.nn_constant(b, x)
    ny = sec.nn_constant(b, y)
    prod = sec.nn_mul(b, nx, ny)
    s = sec.nn_add(b, nx, ny)
    d = sec.nn_sub(b, nx, ny)
    inv = sec.nn_inv(b, nx)
    cc, vals = run_witness(b)

    def val(nn):
        return sum(int(vals[v]) << (16 * i) for i, v in enumerate(nn.big.limbs))

    assert val(prod) == x * y % sec.Q
    assert val(s) == (x + y) % sec.Q
    assert val(d) == (x - y) % sec.Q
    assert val(inv) == pow(x, -1, sec.Q)


def test_point_add_double_on_curve():
    b = CircuitBuilder()
    g = (sec.GX, sec.GY)
    p2 = sec._mult(2, g)
    p3 = sec._mult(3, g)
    pg = sec.point_constant(b, g)
    pg2 = sec.point_constant(b, p2)
    sec.point_assert_on_curve(b, pg)
    added = sec.point_add(b, pg, pg2)       # = 3G
    doubled = sec.point_double(b, pg)       # = 2G
    cc, vals = run_witness(b)

    def val(nn):
        return sum(int(vals[v]) << (16 * i) for i, v in enumerate(nn.big.limbs))

    assert (val(added.x), val(added.y)) == p3
    assert (val(doubled.x), val(doubled.y)) == p2


def test_scalar_mul_small():
    b = CircuitBuilder()
    g = (sec.GX, sec.GY)
    k = 0b10110101  # 181
    expect = sec._mult(k, g)
    bits = [b.constant((k >> i) & 1) for i in range(8)]
    pg = sec.point_constant(b, g)
    out = sec.scalar_mul(b, pg, bits)
    outf = sec.fixed_base_mul(b, g, bits)
    outw = sec.windowed_scalar_mul(b, pg, bits)
    cc, vals = run_witness(b)

    def val(nn):
        return sum(int(vals[v]) << (16 * i) for i, v in enumerate(nn.big.limbs))

    assert (val(out.x), val(out.y)) == expect
    assert (val(outf.x), val(outf.y)) == expect
    assert (val(outw.x), val(outw.y)) == expect


def test_windowed_scalar_mul_unaligned_width():
    """Bit width not a multiple of the window (top window short)."""
    b = CircuitBuilder()
    g = (sec.GX, sec.GY)
    k = 0b1_0110_1101  # 9 bits
    expect = sec._mult(k, g)
    bits = [b.constant((k >> i) & 1) for i in range(9)]
    outw = sec.windowed_scalar_mul(b, sec.point_constant(b, g), bits)
    cc, vals = run_witness(b)

    def val(nn):
        return sum(int(vals[v]) << (16 * i) for i, v in enumerate(nn.big.limbs))

    assert (val(outw.x), val(outw.y)) == expect


def _sign(msg_hash: int, priv: int, k: int):
    n = sec.N_SCALAR
    R = sec._mult(k, (sec.GX, sec.GY))
    r = R[0] % n
    s = pow(k, -1, n) * (msg_hash + r * priv) % n
    return r, s


@pytest.mark.skipif(os.environ.get("RUN_SLOW") != "1",
                    reason="full ECDSA witness check is slow; RUN_SLOW=1")
def test_ecdsa_full_witness():
    from tpu_acir_prover.ops.ecdsa import verify_ecdsa_in_circuit
    priv = 0xC0FFEE1234567890C0FFEE1234567890C0FFEE1234567890C0FFEE1234567890
    pk = sec._mult(priv, (sec.GX, sec.GY))
    h = rand256() % sec.N_SCALAR
    r, s = _sign(h, priv, k=0xDEADBEEF)

    b = CircuitBuilder()
    ext_vals = []
    groups = []
    for v, ln in ((pk[0], 32), (pk[1], 32), ((r << 256) | s, 64), (h, 32)):
        vars_, data = ext_bytes(b, v, ln)
        groups.append(vars_)
        ext_vals.extend(data)
    res = verify_ecdsa_in_circuit(b, groups[0], groups[1], groups[2], groups[3])
    cc, vals = run_witness(b, ext_vals)
    assert int(vals[res]) == 1
    print("ECDSA circuit rows:", cc.n)
