"""Sharded wire-commit (INTT -> LDE -> Merkle cap) vs single-device path."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tpu_acir_prover.field.gl import make_gl, P
from tpu_acir_prover.field.poseidon import hash_no_pad_ints, two_to_one_ints
from tpu_acir_prover.prover.ntt import intt, coset_lde
from tpu_acir_prover.parallel.pipeline import (make_sharded_wire_commit,
                                               leaf_permutation)

GNP = make_gl(np)


def host_reference_caps(wires_u64, rate_bits, d):
    """Single-device LDE + permuted-leaf subtree roots (python ints)."""
    n, c = wires_u64.shape
    lo = (wires_u64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (wires_u64 >> np.uint64(32)).astype(np.uint32)
    coeffs = intt(GNP, (lo, hi))
    lde = coset_lde(GNP, coeffs, rate_bits)
    evals = np.asarray(GNP.to_u64(lde))  # (m, c)
    m = evals.shape[0]
    perm = leaf_permutation(m, d)
    leaves = evals[perm]
    digests = [hash_no_pad_ints([int(v) for v in row]) for row in leaves]
    caps = []
    block = m // d
    for s in range(d):
        level = digests[s * block:(s + 1) * block]
        while len(level) > 1:
            level = [two_to_one_ints(level[2 * i], level[2 * i + 1])
                     for i in range(len(level) // 2)]
        caps.append(level[0])
    return caps


def test_sharded_commit_matches_reference():
    devs = jax.devices()
    mesh = Mesh(np.array(devs[:8]).reshape(2, 4), ("dp", "sp"))
    n, c, rate_bits, bt = 64, 3, 3, 2
    rng = np.random.default_rng(7)
    wires = rng.integers(0, P, size=(bt, n, c), dtype=np.uint64)
    run = make_sharded_wire_commit(mesh, n, c, rate_bits)
    lo = jnp.asarray((wires & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    hi = jnp.asarray((wires >> np.uint64(32)).astype(np.uint32))
    with mesh:
        caps_lo, caps_hi, _, _ = run(lo, hi)
    got = np.asarray(make_gl(jnp).to_u64((caps_lo, caps_hi)))  # (bt, d, 4)
    for b in range(bt):
        expect = host_reference_caps(wires[b], rate_bits, 4)
        for s in range(4):
            assert tuple(int(x) for x in got[b, s]) == expect[s], (b, s)
