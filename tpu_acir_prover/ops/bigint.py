"""Big-unsigned-integer gadgets over 16-bit limbs (LSB first).

Capability analog of the reference's vendored BigUint stack (SURVEY.md
C19-C20: biguint/biguint.rs add/sub/mul/cmp/div_rem).  Design differs by
construction: the reference drives custom U32 gates (mul_add/add_many/
subtraction with 2-bit-limb range constraints); on a universal PLONK gate
the cheap primitive is "field-accumulate then re-split", so limbs are 16
bits (schoolbook limb products stay far below the Goldilocks modulus) and
every carry/borrow certificate is a hint + range-checked decomposition —
the same hint+check pattern the reference uses for div_rem
(BigUintDivRemGenerator, biguint.rs:316-360).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

from ..circuit.builder import CircuitBuilder
from ..field.gl import P

LIMB_BITS = 16
LIMB_BASE = 1 << LIMB_BITS
LIMB_MASK = LIMB_BASE - 1


@dataclass
class BigUintTarget:
    """Normalized big integer: limbs[i] in [0, 2^16), value = sum limb_i b^i.
    Limbs are range-checked at construction."""
    limbs: List[int]  # circuit vars, LSB first

    def num_limbs(self):
        return len(self.limbs)


def limbs_of_int(v: int, n_limbs: int) -> List[int]:
    return [(v >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n_limbs)]


def big_constant(b: CircuitBuilder, v: int, n_limbs: int) -> BigUintTarget:
    return BigUintTarget([b.constant(x) for x in limbs_of_int(v, n_limbs)])


def big_from_vars(b: CircuitBuilder, limb_vars: Sequence[int],
                  range_check: bool = True) -> BigUintTarget:
    if range_check:
        for v in limb_vars:
            b.range_check(v, LIMB_BITS)
    return BigUintTarget(list(limb_vars))


def big_from_bytes_be(b: CircuitBuilder, byte_vars: Sequence[int],
                      range_check_bytes: bool = True) -> BigUintTarget:
    """32 big-endian byte vars -> 16 limbs (the ECDSA input conversion,
    ecdsa_secp256k1_translator.rs:95-121 does bytes -> u32 limbs)."""
    if range_check_bytes:
        for v in byte_vars:
            b.range_check(v, 8)
    le = list(reversed(list(byte_vars)))
    limbs = [b.lincomb([(1, le[2 * i]), (256, le[2 * i + 1])])
             for i in range(len(le) // 2)]
    return BigUintTarget(limbs)


def big_value_hint(vals: List[int], n_limbs: int) -> int:
    return sum(v << (LIMB_BITS * i) for i, v in enumerate(vals[:n_limbs]))


def _split_loose(b: CircuitBuilder, loose: List[int], slack_bits: int,
                 out_limbs: int) -> BigUintTarget:
    """Carry-normalize 'loose' limb vars (each < 2^(16+slack)) into a
    normalized BigUintTarget of out_limbs limbs.  One split per limb."""
    out = []
    carry = b.zero
    for i in range(out_limbs):
        t = loose[i] if i < len(loose) else b.zero
        s = b.add(t, carry) if carry is not b.zero else t
        bits = b.split_le(s, LIMB_BITS + slack_bits)
        limb = b.le_sum_vars(bits[:LIMB_BITS])
        carry = b.le_sum_vars(bits[LIMB_BITS:])
        out.append(limb)
    b.assert_zero(carry)  # no overflow past the output width
    return BigUintTarget(out)


def big_add(b: CircuitBuilder, x: BigUintTarget, y: BigUintTarget) -> BigUintTarget:
    n = max(x.num_limbs(), y.num_limbs())
    loose = []
    for i in range(n):
        xi = x.limbs[i] if i < x.num_limbs() else b.zero
        yi = y.limbs[i] if i < y.num_limbs() else b.zero
        loose.append(b.add(xi, yi))
    return _split_loose(b, loose, 2, n + 1)


def big_mul(b: CircuitBuilder, x: BigUintTarget, y: BigUintTarget) -> BigUintTarget:
    """Schoolbook product (biguint.rs:183-207 analog): column sums stay
    < 32 * 2^32 << p, then one carry normalization pass."""
    nx, ny = x.num_limbs(), y.num_limbs()
    cols = [[] for _ in range(nx + ny - 1)]
    for i in range(nx):
        for j in range(ny):
            cols[i + j].append(b.mul(x.limbs[i], y.limbs[j]))
    loose = [b.lincomb([(1, v) for v in col]) if len(col) > 1 else col[0]
             for col in cols]
    # column value < min(nx,ny) * 2^32: slack = 32 - 16 + ceil(log2 nlimbs)
    slack = LIMB_BITS + max(nx, ny).bit_length()
    return _split_loose(b, loose, slack, nx + ny)


def big_assert_eq(b: CircuitBuilder, x: BigUintTarget, y: BigUintTarget):
    n = max(x.num_limbs(), y.num_limbs())
    for i in range(n):
        xi = x.limbs[i] if i < x.num_limbs() else b.zero
        yi = y.limbs[i] if i < y.num_limbs() else b.zero
        b.assert_equal(xi, yi)


def big_assert_le(b: CircuitBuilder, x: BigUintTarget, y: BigUintTarget):
    """x <= y: hint d = y - x, range-check d, check x + d == y
    (role of the reference's ComparisonGate chain, C18/C20)."""
    n = max(x.num_limbs(), y.num_limbs())

    def fn(vals):
        xv = big_value_hint(vals[:x.num_limbs()], x.num_limbs())
        yv = big_value_hint(vals[x.num_limbs():], y.num_limbs())
        return limbs_of_int(max(0, yv - xv), n)

    d_vars = b.hint(list(x.limbs) + list(y.limbs), n, fn)
    d = big_from_vars(b, d_vars)
    s = big_add(b, x, d)
    big_assert_eq(b, s, y)


def big_lt_bool(b: CircuitBuilder, x: BigUintTarget, y: BigUintTarget) -> int:
    """Boolean var: x < y (for the ECDSA r <= R.x quirk we also need le)."""
    # hint the bool and the absolute difference, then check both branches:
    # lt=1: x + 1 + d == y ; lt=0: y + d == x   <=>  x + lt + d' == y + (1-lt)*?
    # simpler: hint lt; if lt: assert x+1 <= y else assert y <= x.
    # branchless: s = lt ? (x, y) : (y, x); assert s0 + lt <= s1 ... to stay
    # simple and sound we hint lt and d with d = (lt ? y-x-1 : x-y):
    n = max(x.num_limbs(), y.num_limbs())

    def fn(vals):
        xv = big_value_hint(vals[:x.num_limbs()], x.num_limbs())
        yv = big_value_hint(vals[x.num_limbs():], y.num_limbs())
        lt = 1 if xv < yv else 0
        d = (yv - xv - 1) if lt else (xv - yv)
        return [lt] + limbs_of_int(d, n)

    outs = b.hint(list(x.limbs) + list(y.limbs), 1 + n, fn)
    lt = outs[0]
    b.assert_bool(lt)
    d = big_from_vars(b, outs[1:])
    # check: x + d + lt == y  (lt=1)  OR  y + d == x (lt=0)
    # fold into one equation over values? widths differ; do per-branch with
    # select on each limb of both sides:
    xd = big_add(b, x, d)           # n+1 limbs
    # xd + lt should equal y when lt=1 -> add lt to limb 0 then normalize
    lhs1 = _split_loose(b, [b.add(xd.limbs[0], lt)] + xd.limbs[1:], 2,
                        xd.num_limbs())
    yd = big_add(b, y, d)           # y + d == x when lt=0
    for i in range(n + 1):
        yi = y.limbs[i] if i < n and i < y.num_limbs() else b.zero
        xi = x.limbs[i] if i < n and i < x.num_limbs() else b.zero
        want = b.select(lt, yi, xi)
        got = b.select(lt, lhs1.limbs[i], yd.limbs[i])
        b.assert_equal(got, want)
    return lt


def big_le_bool(b: CircuitBuilder, x: BigUintTarget, y: BigUintTarget) -> int:
    """Boolean var: x <= y  ==  not (y < x)."""
    return b.bit_not(big_lt_bool(b, y, x))
