"""Poseidon, Merkle tree, NTT and challenger tests (SURVEY.md §4 tier-4 analog)."""

import random

import numpy as np

from tpu_acir_prover.field import gl
from tpu_acir_prover.field.poseidon import make_poseidon, permute_ints, WIDTH
from tpu_acir_prover.prover import ntt as nttm
from tpu_acir_prover.prover import merkle
from tpu_acir_prover.prover.challenger import Challenger

P = gl.P
G = gl.make_gl(np)
H = make_poseidon(G)


def _state_from_u64(vals):
    """(12, batch) uint64 -> stacked (lo, hi)."""
    return G.from_u64(np.asarray(vals, dtype=np.uint64))


def test_poseidon_permutation_batched_consistent():
    rng = random.Random(0)
    batch = 5
    vals = np.array([[rng.randrange(P) for _ in range(batch)] for _ in range(WIDTH)],
                    dtype=np.uint64)
    out_u64 = np.asarray(G.to_u64(H.permute(_state_from_u64(vals))))
    for b in range(batch):
        single = H.permute(_state_from_u64(vals[:, b:b + 1]))
        np.testing.assert_array_equal(np.asarray(G.to_u64(single))[:, 0], out_u64[:, b])
    assert (out_u64 < P).all()
    assert (out_u64 != vals).any()


def test_scalar_permute_matches_vectorized():
    rng = random.Random(9)
    ints = [rng.randrange(P) for _ in range(WIDTH)]
    vals = np.array(ints, dtype=np.uint64).reshape(WIDTH, 1)
    out_vec = [int(x) for x in np.asarray(G.to_u64(H.permute(_state_from_u64(vals))))[:, 0]]
    assert out_vec == permute_ints(ints)


def test_poseidon_jax_matches_numpy():
    import jax
    import jax.numpy as jnp
    Gj = gl.make_gl(jnp)
    Hj = make_poseidon(Gj)
    rng = random.Random(1)
    vals = np.array([[rng.randrange(P)] for _ in range(WIDTH)], dtype=np.uint64)
    on = np.asarray(G.to_u64(H.permute(G.from_u64(vals))))
    oj = np.asarray(Gj.to_u64(jax.jit(Hj.permute)(Gj.from_u64(vals))))
    np.testing.assert_array_equal(on, oj)


def test_ntt_matches_naive():
    rng = random.Random(2)
    log_n = 5
    n = 1 << log_n
    vals = np.array([rng.randrange(P) for _ in range(n)], dtype=np.uint64)
    got = G.to_u64(nttm.ntt(G, G.from_u64(vals)))
    w = gl.root_of_unity(log_n)
    exp = np.array([sum(int(vals[i]) * pow(w, i * k, P) for i in range(n)) % P
                    for k in range(n)], dtype=np.uint64)
    np.testing.assert_array_equal(got, exp)
    rt = G.to_u64(nttm.intt(G, nttm.ntt(G, G.from_u64(vals))))
    np.testing.assert_array_equal(rt, vals)


def test_coset_lde_roundtrip():
    rng = random.Random(3)
    n, rb = 16, 3
    vals = np.array([rng.randrange(P) for _ in range(n)], dtype=np.uint64)
    lde = nttm.coset_lde(G, G.from_u64(vals.reshape(n, 1)), rb)
    back = G.to_u64(nttm.coset_intt(G, lde))
    np.testing.assert_array_equal(back[:n, 0], vals)
    assert (back[n:] == 0).all()


def test_merkle_commit_and_verify_paths():
    rng = random.Random(4)
    m, c, cap_h = 32, 5, 2
    mat = np.array([[rng.randrange(P) for _ in range(c)] for _ in range(m)],
                   dtype=np.uint64)
    tree = merkle.merkle_commit(G, H, G.from_u64(mat), cap_h)
    cap = tree.cap_u64()
    assert cap.shape == (1 << cap_h, 4)
    for idx in [0, 1, 7, 31]:
        row, path = tree.open_row(idx)
        np.testing.assert_array_equal(row, mat[idx])
        assert merkle.verify_merkle_path(row, idx, path, cap)
        bad = row.copy()
        bad[0] = (int(bad[0]) + 1) % P
        assert not merkle.verify_merkle_path(bad, idx, path, cap)


def test_challenger_deterministic_and_sensitive():
    a, b = Challenger(), Challenger()
    for ch in (a, b):
        ch.observe_many([1, 2, 3])
    assert a.get_challenge() == b.get_challenge()
    c = Challenger()
    c.observe_many([1, 2, 4])
    a2 = Challenger()
    a2.observe_many([1, 2, 3])
    assert a2.get_challenge() != c.get_challenge()
    d = Challenger()
    d.observe(42)
    xs = d.get_challenges(40)
    assert all(0 <= x < P for x in xs)
    assert len(set(xs)) > 35
