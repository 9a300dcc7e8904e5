"""secp256k1 nonnative field + curve gadgets over the 16-bit-limb BigUint.

Capability analog of the reference's vendored nonnative/curve stack
(SURVEY.md C21 nonnative.rs, C22 curve.rs): every modular operation is a
host hint plus an algebraic certificate (x*y = k*q + r with r, k
range-checked — the same overflow-quotient pattern as nonnative.rs:312-341),
and curve arithmetic is affine with hinted slopes (3 modular mults per add,
4 per double, no in-circuit inversions).

Like the reference's gadgets (curve.rs:181-197 "add assuming p != q"),
point addition is INCOMPLETE: honest witnesses never hit x1 == x2 thanks to
the fixed blinding offset in scalar_mul (the reference seeds with hardcoded
random points, glv.rs:310-384 — same technique, our own constants).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

from ..circuit.builder import CircuitBuilder
from .bigint import (BigUintTarget, big_add, big_assert_eq, big_assert_le,
                     big_constant, big_from_vars, big_mul, big_value_hint,
                     limbs_of_int, LIMB_BITS)

NLIMBS = 16  # 256 bits

# secp256k1 parameters
Q = 2**256 - 2**32 - 977                      # base field
N_SCALAR = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
GX = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
GY = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8


@dataclass
class NNTarget:
    """Nonnative field element mod `modulus`: a normalized BigUint < mod."""
    big: BigUintTarget
    modulus: int


@dataclass
class PointTarget:
    x: NNTarget
    y: NNTarget


def nn_constant(b: CircuitBuilder, v: int, modulus: int = Q) -> NNTarget:
    return NNTarget(big_constant(b, v % modulus, NLIMBS), modulus)


def nn_from_big(b: CircuitBuilder, big: BigUintTarget, modulus: int = Q,
                reduce: bool = True) -> NNTarget:
    """Wrap a BigUint as a field element, reducing mod `modulus` via the
    hint+check pattern if requested."""
    if not reduce:
        return NNTarget(big, modulus)
    m = modulus
    nk = max(1, big.num_limbs() - NLIMBS + 1)

    def fn(vals):
        v = big_value_hint(vals, big.num_limbs())
        return limbs_of_int(v // m, nk) + limbs_of_int(v % m, NLIMBS)

    outs = b.hint(list(big.limbs), nk + NLIMBS, fn)
    k = big_from_vars(b, outs[:nk])
    r = big_from_vars(b, outs[nk:])
    # big == k*m + r  and  r <= m-1
    km = big_mul(b, k, big_constant(b, m, NLIMBS))
    big_assert_eq(b, big_add(b, km, r), big)
    big_assert_le(b, r, big_constant(b, m - 1, NLIMBS))
    return NNTarget(r, m)


def nn_mul(b: CircuitBuilder, x: NNTarget, y: NNTarget) -> NNTarget:
    """r = x*y mod m via certificate x*y = k*m + r (nonnative.rs:312-341)."""
    m = x.modulus
    assert y.modulus == m

    def fn(vals):
        xv = big_value_hint(vals[:NLIMBS], NLIMBS)
        yv = big_value_hint(vals[NLIMBS:], NLIMBS)
        p = xv * yv
        return limbs_of_int(p // m, NLIMBS + 1) + limbs_of_int(p % m, NLIMBS)

    outs = b.hint(list(x.big.limbs) + list(y.big.limbs), 2 * NLIMBS + 1, fn)
    k = big_from_vars(b, outs[:NLIMBS + 1])
    r = big_from_vars(b, outs[NLIMBS + 1:])
    lhs = big_mul(b, x.big, y.big)
    rhs = big_add(b, big_mul(b, k, big_constant(b, m, NLIMBS)), r)
    big_assert_eq(b, lhs, rhs)
    big_assert_le(b, r, big_constant(b, m - 1, NLIMBS))
    return NNTarget(r, m)


def nn_mul_const(b: CircuitBuilder, x: NNTarget, c: int) -> NNTarget:
    return nn_mul(b, x, nn_constant(b, c % x.modulus, x.modulus))


def _linear_mod(b: CircuitBuilder, terms: List[Tuple[int, NNTarget]],
                modulus: int) -> NNTarget:
    """r = sum(sign_i * x_i) mod m for sign in {+1,-1}: certificate
    sum(pos) + k*m = sum(neg) + r with small k (covers add_mod/sub_mod)."""
    pos = [x for s, x in terms if s > 0]
    neg = [x for s, x in terms if s < 0]
    m = modulus
    kmax_limbs = 1

    def fn(vals):
        vs = [big_value_hint(vals[i * NLIMBS:(i + 1) * NLIMBS], NLIMBS)
              for i in range(len(terms))]
        total = 0
        for (s, _), v in zip(terms, vs):
            total += s * v
        r = total % m
        k = (total - r) // m  # may be negative
        # rewrite: sum(pos) = k*m + r ; with negs moved: sum(pos) =
        # sum(neg) + k'*m + r where k' >= 0 because we add |neg|*m slack
        kp = k + len(neg)
        return limbs_of_int(kp, kmax_limbs) + limbs_of_int(r, NLIMBS)

    inp = []
    for _, x in terms:
        inp.extend(x.big.limbs)
    outs = b.hint(inp, kmax_limbs + NLIMBS, fn)
    k = big_from_vars(b, outs[:kmax_limbs])
    r = big_from_vars(b, outs[kmax_limbs:])
    big_assert_le(b, r, big_constant(b, m - 1, NLIMBS))
    # lhs = sum(pos) + len(neg)*m ; rhs = sum(neg) + k*m + r
    lhs = big_constant(b, len(neg) * m, NLIMBS + 1)
    for x in pos:
        lhs = big_add(b, lhs, x.big)
    rhs = big_add(b, big_mul(b, k, big_constant(b, m, NLIMBS)), r)
    for x in neg:
        rhs = big_add(b, rhs, x.big)
    big_assert_eq(b, lhs, rhs)
    return NNTarget(r, m)


def nn_add(b, x: NNTarget, y: NNTarget) -> NNTarget:
    return _linear_mod(b, [(1, x), (1, y)], x.modulus)


def nn_sub(b, x: NNTarget, y: NNTarget) -> NNTarget:
    return _linear_mod(b, [(1, x), (-1, y)], x.modulus)


def nn_inv(b: CircuitBuilder, x: NNTarget) -> NNTarget:
    """r = x^-1 mod m: hint + check x*r == 1 (nonnative.rs:365-389)."""
    m = x.modulus

    def fn(vals):
        xv = big_value_hint(vals, NLIMBS) % m
        return limbs_of_int(pow(xv, -1, m) if xv else 0, NLIMBS)

    outs = b.hint(list(x.big.limbs), NLIMBS, fn)
    r = NNTarget(big_from_vars(b, outs), m)
    prod = nn_mul(b, x, r)
    big_assert_eq(b, prod.big, big_constant(b, 1, NLIMBS))
    return r


def nn_select(b: CircuitBuilder, bit: int, x: NNTarget, y: NNTarget) -> NNTarget:
    limbs = [b.select(bit, xi, yi) for xi, yi in zip(x.big.limbs, y.big.limbs)]
    return NNTarget(BigUintTarget(limbs), x.modulus)


def point_select(b, bit: int, p1: PointTarget, p2: PointTarget) -> PointTarget:
    return PointTarget(nn_select(b, bit, p1.x, p2.x),
                       nn_select(b, bit, p1.y, p2.y))


def point_constant(b, xy: Tuple[int, int]) -> PointTarget:
    return PointTarget(nn_constant(b, xy[0]), nn_constant(b, xy[1]))


def point_add(b: CircuitBuilder, p: PointTarget, q: PointTarget) -> PointTarget:
    """Affine add assuming p != +-q (curve.rs:181-197 semantics), hinted
    slope: s*(x2-x1) == y2-y1; x3 = s^2-x1-x2; y3 = s*(x1-x3)-y1."""
    m = p.x.modulus

    def slope_fn(vals):
        x1 = big_value_hint(vals[0:NLIMBS], NLIMBS)
        y1 = big_value_hint(vals[NLIMBS:2 * NLIMBS], NLIMBS)
        x2 = big_value_hint(vals[2 * NLIMBS:3 * NLIMBS], NLIMBS)
        y2 = big_value_hint(vals[3 * NLIMBS:], NLIMBS)
        dx = (x2 - x1) % m
        s = ((y2 - y1) % m) * pow(dx, -1, m) % m if dx else 0
        return limbs_of_int(s, NLIMBS)

    outs = b.hint(list(p.x.big.limbs) + list(p.y.big.limbs) +
                  list(q.x.big.limbs) + list(q.y.big.limbs), NLIMBS, slope_fn)
    s = NNTarget(big_from_vars(b, outs), m)
    dx = nn_sub(b, q.x, p.x)
    dy = nn_sub(b, q.y, p.y)
    big_assert_eq(b, nn_mul(b, s, dx).big, dy.big)
    s2 = nn_mul(b, s, s)
    x3 = nn_sub(b, nn_sub(b, s2, p.x), q.x)
    y3 = nn_sub(b, nn_mul(b, s, nn_sub(b, p.x, x3)), p.y)
    return PointTarget(x3, y3)


def point_double(b: CircuitBuilder, p: PointTarget) -> PointTarget:
    """s = 3x^2 / 2y hinted: s*2y == 3x^2 (curve.rs:147-169 semantics)."""
    m = p.x.modulus

    def slope_fn(vals):
        x = big_value_hint(vals[0:NLIMBS], NLIMBS)
        y = big_value_hint(vals[NLIMBS:], NLIMBS)
        s = (3 * x * x) % m * pow((2 * y) % m, -1, m) % m if y else 0
        return limbs_of_int(s, NLIMBS)

    outs = b.hint(list(p.x.big.limbs) + list(p.y.big.limbs), NLIMBS, slope_fn)
    s = NNTarget(big_from_vars(b, outs), m)
    x2 = nn_mul(b, p.x, p.x)
    two_y = nn_add(b, p.y, p.y)
    three_x2 = _linear_mod(b, [(1, x2), (1, x2), (1, x2)], m)
    big_assert_eq(b, nn_mul(b, s, two_y).big, three_x2.big)
    s2 = nn_mul(b, s, s)
    x3 = nn_sub(b, nn_sub(b, s2, p.x), p.x)
    y3 = nn_sub(b, nn_mul(b, s, nn_sub(b, p.x, x3)), p.y)
    return PointTarget(x3, y3)


def point_assert_on_curve(b: CircuitBuilder, p: PointTarget):
    """y^2 == x^3 + 7 (curve.rs:118-130)."""
    y2 = nn_mul(b, p.y, p.y)
    x2 = nn_mul(b, p.x, p.x)
    x3 = nn_mul(b, x2, p.x)
    rhs = nn_add(b, x3, nn_constant(b, 7))
    big_assert_eq(b, y2.big, rhs.big)


def _add_const(p1, p2):
    if p1 is None:
        return p2
    (x1, y1), (x2, y2) = p1, p2
    if x1 == x2 and (y1 + y2) % Q == 0:
        return None
    if p1 == p2:
        s = 3 * x1 * x1 * pow(2 * y1, -1, Q) % Q
    else:
        s = (y2 - y1) * pow(x2 - x1, -1, Q) % Q
    x3 = (s * s - x1 - x2) % Q
    return (x3, (s * (x1 - x3) - y1) % Q)


# Blinding offset for incomplete-add avoidance: D = 31337 * G (the role of
# the hardcoded seed points at glv.rs:310-384; a known multiple is fine —
# it only needs to be distinct from intermediate values for honest runs).
def _mult(k, point):
    """Host-side scalar mul for precomputed constants."""
    acc = None
    base = point
    while k:
        if k & 1:
            acc = _add_const(acc, base)
        base = _add_const(base, base)
        k >>= 1
    return acc


D_POINT = _mult(31337, (GX, GY))


def scalar_mul(b: CircuitBuilder, p: PointTarget, scalar_bits: List[int],
               blind: Tuple[int, int] = None) -> PointTarget:
    """Double-and-add over little-endian scalar bits with a constant
    blinding accumulator seed (dodges the incomplete-add identity cases
    for honest witnesses, like curve.rs:218-258)."""
    nb = len(scalar_bits)
    blind = blind or D_POINT
    acc = point_constant(b, blind)
    for bit in reversed(scalar_bits):
        acc = point_double(b, acc)
        added = point_add(b, acc, p)
        acc = point_select(b, bit, added, acc)
    # subtract blind * 2^nb
    unblind = _mult(pow(2, nb, N_SCALAR), blind)
    neg_unblind = (unblind[0], (Q - unblind[1]) % Q)
    return point_add(b, acc, point_constant(b, neg_unblind))


def fixed_base_mul(b: CircuitBuilder, point_xy: Tuple[int, int],
                   scalar_bits: List[int], window: int = 4) -> PointTarget:
    """Fixed-base windowed scalar mul (no in-circuit doublings; the
    fixed-base analog of the reference GLV windowing, glv.rs:175-255):
    table_w[j] = (j * 2^(w*window)) * P + D, so every window adds exactly
    one table point and the total offset (num_windows + 1) * D is a
    known constant subtracted at the end."""
    nb = len(scalar_bits)
    acc = point_constant(b, D_POINT)
    num_windows = 0
    for w0 in range(0, nb, window):
        bits = scalar_bits[w0:w0 + window]
        base = _mult(1 << w0, point_xy)
        table = []
        for j in range(1 << len(bits)):
            pt = _mult(j, base)
            table.append(_add_const(pt, D_POINT))
        cur = [point_constant(b, t) for t in table]
        for bit in bits:
            cur = [point_select(b, bit, cur[2 * i + 1], cur[2 * i])
                   for i in range(len(cur) // 2)]
        acc = point_add(b, acc, cur[0])
        num_windows += 1
    offset = _mult(num_windows + 1, D_POINT)
    neg = (offset[0], (Q - offset[1]) % Q)
    return point_add(b, acc, point_constant(b, neg))


