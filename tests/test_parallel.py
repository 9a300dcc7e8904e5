"""Multi-chip sharding tests on the 8-device virtual CPU mesh (conftest)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tpu_acir_prover.field.gl import make_gl, P
from tpu_acir_prover.prover.ntt import ntt
from tpu_acir_prover.parallel.mesh import (four_step_ntt_reference,
                                           make_sharded_ntt)

GNP = make_gl(np)
GJ = make_gl(jnp)


def rand_values(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.integers(0, P, size=n, dtype=np.uint64)
    return v


def to_pair(xp, v):
    return (xp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            xp.asarray((v >> np.uint64(32)).astype(np.uint32)))


@pytest.mark.parametrize("inverse", [False, True])
def test_four_step_matches_plain_ntt(inverse):
    n, a, b = 256, 16, 16
    v = rand_values(n)
    plain = ntt(GNP, to_pair(np, v), inverse=inverse)
    four = four_step_ntt_reference(GNP, to_pair(np, v), a, b, inverse=inverse)
    assert np.array_equal(GNP.to_u64(plain), GNP.to_u64(four))


@pytest.mark.parametrize("inverse", [False, True])
def test_sharded_ntt_matches_plain(inverse):
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must force 8 virtual devices"
    mesh = Mesh(np.array(devs[:8]), ("sp",))
    n, a, b = 1024, 32, 32
    v = rand_values(n, seed=1)
    plain = GNP.to_u64(ntt(GNP, to_pair(np, v), inverse=inverse))
    run = make_sharded_ntt(mesh, "sp", a, b, inverse=inverse)
    lo, hi = to_pair(jnp, v)
    with mesh:
        out = run((lo.reshape(a, b), hi.reshape(a, b)))
    got = GJ.to_u64((out[0].reshape(-1), out[1].reshape(-1)))
    assert np.array_equal(plain, np.asarray(got))
