"""Goldilocks base/extension field tests: limb algorithms vs python ints.

Mirrors the testing idea of the reference's vendored gadget unit tests
(random-input round trips, SURVEY.md §4 tier 4), applied to our field layer.
"""

import random

import numpy as np
import pytest

from tpu_acir_prover.field import gl, ext

P = gl.P
G = gl.make_gl(np)
E = ext.make_ext(G)

EDGE = [0, 1, 2, P - 1, P - 2, (1 << 32) - 1, 1 << 32, (1 << 32) + 1, 1 << 63, P >> 1]


def _rand(n, seed):
    rng = random.Random(seed)
    return [rng.randrange(P) for _ in range(n)]


@pytest.fixture(scope="module")
def pairs():
    xs = np.array(_rand(500, 10) + EDGE, dtype=np.uint64)
    ys = np.array(_rand(500, 20) + list(reversed(EDGE)), dtype=np.uint64)
    return xs, ys


def test_add_sub_mul(pairs):
    xs, ys = pairs
    a, b = G.from_u64(xs), G.from_u64(ys)
    got = G.to_u64(G.add(a, b))
    exp = np.array([(int(x) + int(y)) % P for x, y in zip(xs, ys)], dtype=np.uint64)
    np.testing.assert_array_equal(got, exp)
    got = G.to_u64(G.sub(a, b))
    exp = np.array([(int(x) - int(y)) % P for x, y in zip(xs, ys)], dtype=np.uint64)
    np.testing.assert_array_equal(got, exp)
    got = G.to_u64(G.mul(a, b))
    exp = np.array([(int(x) * int(y)) % P for x, y in zip(xs, ys)], dtype=np.uint64)
    np.testing.assert_array_equal(got, exp)


def test_neg_inv(pairs):
    xs, _ = pairs
    a = G.from_u64(xs)
    got = G.to_u64(G.neg(a))
    exp = np.array([(-int(x)) % P for x in xs], dtype=np.uint64)
    np.testing.assert_array_equal(got, exp)
    nz = np.array([x for x in xs if x != 0], dtype=np.uint64)
    an = G.from_u64(nz)
    np.testing.assert_array_equal(G.to_u64(G.mul(G.inv(an), an)),
                                  np.ones(len(nz), dtype=np.uint64))


def test_generator_facts():
    pm1 = P - 1
    for q in [2, 3, 5, 17, 257, 65537]:
        assert pow(7, pm1 // q, P) != 1
    g = gl.POWER_OF_TWO_GENERATOR
    assert pow(g, 1 << 32, P) == 1 and pow(g, 1 << 31, P) != 1
    # W = 7 is a non-residue (required for the quadratic extension)
    assert pow(ext.W, (P - 1) // 2, P) == P - 1


def test_extension_ops():
    rng = random.Random(3)
    for _ in range(50):
        x = (rng.randrange(P), rng.randrange(P))
        y = (rng.randrange(P), rng.randrange(P))
        xa = E.from_u64(np.array([x[0]], dtype=np.uint64), np.array([x[1]], dtype=np.uint64))
        ya = E.from_u64(np.array([y[0]], dtype=np.uint64), np.array([y[1]], dtype=np.uint64))
        m = E.to_u64(E.mul(xa, ya))
        exp = ext.e_mul(x, y)
        assert (int(m[0][0]), int(m[1][0])) == exp
        if x != (0, 0):
            iv = E.to_u64(E.mul(E.inv(xa), xa))
            assert (int(iv[0][0]), int(iv[1][0])) == (1, 0)
            assert ext.e_mul(ext.e_inv(x), x) == (1, 0)


def test_jax_backend_matches_numpy():
    import jax
    import jax.numpy as jnp
    Gj = gl.make_gl(jnp)
    xs = np.array(_rand(64, 7) + EDGE, dtype=np.uint64)
    ys = np.array(_rand(64 + len(EDGE), 8), dtype=np.uint64)
    a, b = G.from_u64(xs), G.from_u64(ys)
    aj, bj = Gj.from_u64(xs), Gj.from_u64(ys)

    @jax.jit
    def all_ops(x, y):
        return Gj.add(x, y), Gj.sub(x, y), Gj.mul(x, y)

    add_j, sub_j, mul_j = all_ops(aj, bj)
    np.testing.assert_array_equal(G.to_u64(G.add(a, b)), Gj.to_u64(add_j))
    np.testing.assert_array_equal(G.to_u64(G.sub(a, b)), Gj.to_u64(sub_j))
    np.testing.assert_array_equal(G.to_u64(G.mul(a, b)), Gj.to_u64(mul_j))
