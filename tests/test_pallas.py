"""Pallas Poseidon kernels (kernels/poseidon_pallas.py): interpret-mode
bit-identity against the XLA sponge/compression path, plus the full
Merkle-level build routed through the kernels.

The kernels run compiled only on a real TPU; here they execute in the
Pallas interpreter on CPU — same program, same values."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_acir_prover.field.gl import make_gl, P
from tpu_acir_prover.field.poseidon import make_poseidon
from tpu_acir_prover.kernels import poseidon_pallas as kp
from tpu_acir_prover.prover.merkle import merkle_levels


@pytest.fixture(scope="module")
def ctx():
    G = make_gl(jnp)
    H = make_poseidon(G)
    return G, H


def _rand_pair(shape, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.integers(0, P, size=shape, dtype=np.uint64)
    return (jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            jnp.asarray((v >> np.uint64(32)).astype(np.uint32)))


def test_leaf_hash_matches_sponge(ctx):
    G, H = ctx
    for C in (4, 12, 17):
        lo, hi = _rand_pair((C, 256), seed=C)
        ref = H.hash_no_pad((lo, hi))
        out = kp.leaf_hash((lo, hi), tile=128, interpret=True)
        assert out is not None
        assert bool(jnp.all(ref[0] == out[0]) & jnp.all(ref[1] == out[1]))


def test_two_to_one_matches(ctx):
    G, H = ctx
    l = _rand_pair((4, 256), seed=1)
    r = _rand_pair((4, 256), seed=2)
    ref = H.two_to_one(l, r)
    out = kp.two_to_one_level(l, r, tile=128, interpret=True)
    assert out is not None
    assert bool(jnp.all(ref[0] == out[0]) & jnp.all(ref[1] == out[1]))


def test_merkle_levels_via_pallas(ctx, monkeypatch):
    """Full level build with the kernels enabled (interpret mode) equals
    the XLA heap-loop build."""
    G, H = ctx
    leaf = _rand_pair((4, 1 << 12), seed=3)
    ref = merkle_levels(H, leaf, 16)
    monkeypatch.setenv("TPU_ACIR_PALLAS", "interp")
    monkeypatch.setattr(kp, "BULK_CHUNK", 256)
    import tpu_acir_prover.prover.merkle as mk
    monkeypatch.setattr(mk, "_PALLAS_MIN_LEVEL", 256)
    out = merkle_levels(H, leaf, 16)
    assert len(out) == len(ref)
    for a, b in zip(ref, out):
        assert bool(jnp.all(a[0] == b[0]) & jnp.all(a[1] == b[1]))
