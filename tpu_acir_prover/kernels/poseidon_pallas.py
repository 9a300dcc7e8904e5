"""Pallas TPU kernels for the Poseidon2 Merkle sweep — the prover's
dominant cost.

Merkle commitment hashes every LDE row of every oracle (leaf sponge) and
every internal tree node (two_to_one), ~10^8 permutations per 2^20-row
proof.  The XLA path (field/poseidon.py) runs the rounds as lax.scans of
(lo, hi) uint32 limb ops; these kernels run the same permutation inside
Pallas with the whole working tile resident in VMEM:

  - ``leaf_hash``: grid over row tiles; each tile absorbs its (C, T) block
    through the sponge and writes (4, T) digests.  One HBM read of the
    matrix, one HBM write of the digests — no per-round round trips.
  - ``merkle_bulk``: ALL internal tree levels with >= chunk nodes as ONE
    grid-sequential kernel over a heap buffer (node i's children at
    2i/2i+1).  Step k hashes the descending chunk [s, s+c): its children
    [2s, 2s+2c) were written by earlier steps (manual DMA with explicit
    waits keeps the ordering exact).  Replaces log2(M) separate level
    programs with one kernel.

The permutation body reuses the exact limb algorithms from field/gl.py and
the Poseidon2 external matrix as its paper add-chain (same matrix as the
XLA path's f32 einsum — field ops are exact, so digests are bit-identical
to the XLA path; asserted in tests/test_pallas.py).

Reference analog: the plonky2 fork's rayon-parallel Merkle hashing
(SURVEY.md §2.3 "LDE + Merkle commitment"); here the parallelism is VPU
lanes and the memory hierarchy is managed explicitly.
"""

from __future__ import annotations

import functools
import os

import numpy as np

from ..field import gl as _gl
from ..field import poseidon as _pz

WIDTH = _pz.WIDTH
RATE = _pz.RATE
DIGEST = _pz.DIGEST

# grid-step tile sizes (lanes per step); multiples of 128 (VREG lane width)
LEAF_TILE = 1 << 10
BULK_CHUNK = 1 << 12


def pallas_enabled() -> bool:
    """Use the Pallas kernels in the Merkle path?  OPT-IN via
    TPU_ACIR_PALLAS=1 (TPU backend only unless =interp).

    Measured on a v5e chip (round 5): the rolled-rounds kernels run the
    2M-leaf two_to_one sweep in ~398 ms vs ~220 ms for the XLA scan path —
    the per-round SMEM constant rebuild and fori overhead outweigh the
    VMEM-residency win at this tile size — and the straight-line-rounds
    variant compiles for >20 min under Mosaic.  They are kept as a correct,
    tested baseline for further kernel tuning, not as the default."""
    env = os.environ.get("TPU_ACIR_PALLAS")
    if env not in ("1", "interp"):
        return False
    if env == "interp":
        return True
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _interp() -> bool:
    return os.environ.get("TPU_ACIR_PALLAS") == "interp"


# ---------------------------------------------------------------------------
# In-kernel permutation body (operates on (12, T) jnp value pairs)


def _sbox(G, x):
    x2 = G.mul(x, x)
    x3 = G.mul(x2, x)
    x6 = G.mul(x3, x3)
    return G.mul(x6, x)


def _m4_chain(G, x0, x1, x2, x3):
    """M4 = [[5,7,1,3],[4,6,1,1],[1,3,5,7],[1,1,4,6]] via the Poseidon2
    paper's add chain (exact field adds -> same values as a matmul)."""
    t0 = G.add(x0, x1)
    t1 = G.add(x2, x3)
    t2 = G.add(G.add(x1, x1), t1)
    t3 = G.add(G.add(x3, x3), t0)
    d1 = G.add(t1, t1)
    t4 = G.add(G.add(d1, d1), t3)
    d0 = G.add(t0, t0)
    t5 = G.add(G.add(d0, d0), t2)
    t6 = G.add(t3, t5)
    t7 = G.add(t2, t4)
    return t6, t5, t7, t4


def _external_matrix(G, xp, state):
    """M_E = circ(2*M4, M4, M4) on a (12, T) pair."""
    lo, hi = state

    def rows(a, r):
        return (lo[4 * a + r], hi[4 * a + r])

    blocks = []
    for a in range(3):
        blocks.append(_m4_chain(G, *[rows(a, r) for r in range(4)]))
    # s_r = sum over blocks of v[block][r]; out[block][r] = v[block][r] + s_r
    out_lo, out_hi = [], []
    s = [G.add(G.add(blocks[0][r], blocks[1][r]), blocks[2][r])
         for r in range(4)]
    for a in range(3):
        for r in range(4):
            v = G.add(blocks[a][r], s[r])
            out_lo.append(v[0])
            out_hi.append(v[1])
    return (xp.stack(out_lo, axis=0), xp.stack(out_hi, axis=0))


def _internal_matrix(G, xp, state, dm1):
    """out_i = sum_j x_j + (mu_i - 1) * x_i on a (12, T) pair."""
    lo, hi = state
    s = (lo[0], hi[0])
    for i in range(1, WIDTH):
        s = G.add(s, (lo[i], hi[i]))
    dx = G.mul(dm1, state)
    return G.add(dx, (s[0][None], s[1][None]))


def _const_arrays():
    """Round-constant operands (numpy), consumed from SMEM as scalars
    (Mosaic cannot dynamic-slice the 128-lane axis, and kernels cannot
    capture array constants): ext (8,12)x2, int (22,1)x2, diag-1 (12,1)x2."""
    def split(a):
        a = np.asarray(a, dtype=np.uint64)
        return ((a & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                (a >> np.uint64(32)).astype(np.uint32))

    e_lo, e_hi = split(_pz.ROUND_CONSTANTS)
    i_lo, i_hi = split(_pz.INTERNAL_CONSTANTS.reshape(-1, 1))
    d_lo, d_hi = split(_pz.DIAG_M1.reshape(-1, 1))
    return (e_lo, e_hi, i_lo, i_hi, d_lo, d_hi)


def _const_specs():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    return [pl.BlockSpec(memory_space=pltpu.SMEM)] * 6


def permute_tile(G, state, consts, unroll=False):
    """Full Poseidon2 permutation of a (12, T) (lo, hi) pair; `consts` are
    the _const_arrays SMEM refs.  unroll=False (default) rolls the rounds
    as three fori_loops — the straight-line variant takes Mosaic >20 min
    to compile at width 12.  Bit-identical to
    field.poseidon.make_poseidon(...).permute."""
    import jax.numpy as jnp
    from jax import lax
    xp = jnp
    ext_lo, ext_hi, int_lo, int_hi, dm1_lo, dm1_hi = consts
    dm1 = (jnp.stack([dm1_lo[i, 0] for i in range(WIDTH)]).reshape(WIDTH, 1),
           jnp.stack([dm1_hi[i, 0] for i in range(WIDTH)]).reshape(WIDTH, 1))
    half = _pz.EXTERNAL_ROUNDS // 2

    def ext_round(r, st):
        rc = (jnp.stack([ext_lo[r, i] for i in range(WIDTH)])
              .reshape(WIDTH, 1),
              jnp.stack([ext_hi[r, i] for i in range(WIDTH)])
              .reshape(WIDTH, 1))
        st = G.add(st, rc)
        st = _sbox(G, st)
        return _external_matrix(G, xp, st)

    def int_round(r, st):
        lo, hi = st
        l0 = (lo[0:1], hi[0:1])
        l0 = G.add(l0, (int_lo[r, 0].reshape(1, 1),
                        int_hi[r, 0].reshape(1, 1)))
        s0 = _sbox(G, l0)
        st = (xp.concatenate([s0[0], lo[1:]], axis=0),
              xp.concatenate([s0[1], hi[1:]], axis=0))
        return _internal_matrix(G, xp, st, dm1)

    state = _external_matrix(G, xp, state)
    if unroll:
        for r in range(half):
            state = ext_round(r, state)
        for r in range(_pz.INTERNAL_ROUNDS):
            state = int_round(r, state)
        for r in range(half, _pz.EXTERNAL_ROUNDS):
            state = ext_round(r, state)
        return state
    state = lax.fori_loop(0, half, ext_round, state)
    state = lax.fori_loop(0, _pz.INTERNAL_ROUNDS, int_round, state)
    state = lax.fori_loop(half, _pz.EXTERNAL_ROUNDS, ext_round, state)
    return state


# ---------------------------------------------------------------------------
# Kernels


def _leaf_kernel(G, C, elo, ehi, ilo, ihi, dlo, dhi,
                 lo_ref, hi_ref, out_lo_ref, out_hi_ref):
    import jax.numpy as jnp
    consts = (elo, ehi, ilo, ihi, dlo, dhi)
    T = lo_ref.shape[1]
    z = jnp.zeros((WIDTH, T), jnp.uint32)
    state = (z, z)
    for off in range(0, C, RATE):
        k = min(RATE, C - off)
        state = (jnp.concatenate([lo_ref[off:off + k], state[0][k:]], axis=0),
                 jnp.concatenate([hi_ref[off:off + k], state[1][k:]], axis=0))
        state = permute_tile(G, state, consts)
    out_lo_ref[:] = state[0][:DIGEST]
    out_hi_ref[:] = state[1][:DIGEST]


@functools.lru_cache(maxsize=None)
def _leaf_call(C: int, M: int, tile: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ..field.gl import make_gl
    G = make_gl(jnp, force_u32=True)

    kern = functools.partial(_leaf_kernel, G, C)
    return pl.pallas_call(
        kern,
        grid=(M // tile,),
        in_specs=_const_specs() + [
            pl.BlockSpec((C, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec((DIGEST, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((DIGEST, M), jnp.uint32)] * 2,
        interpret=interpret,
    )


def leaf_hash(matrix_t, tile: int = LEAF_TILE, interpret: bool = False):
    """Sponge-hash every column of a (C, M) stacked (lo, hi) pair into
    (DIGEST, M) digests.  Returns None if the shape doesn't tile."""
    import jax.numpy as jnp
    lo, hi = matrix_t
    C, M = lo.shape
    if M % tile or M < tile:
        return None
    fn = _leaf_call(C, M, tile, interpret)
    consts = tuple(jnp.asarray(a) for a in _const_arrays())
    return tuple(fn(*consts, lo, hi))


def _two_to_one_kernel(G, elo, ehi, ilo, ihi, dlo, dhi,
                       llo_ref, lhi_ref, rlo_ref, rhi_ref,
                       out_lo_ref, out_hi_ref):
    import jax.numpy as jnp
    consts = (elo, ehi, ilo, ihi, dlo, dhi)
    T = llo_ref.shape[1]
    z = jnp.zeros((WIDTH - RATE, T), jnp.uint32)
    state = (jnp.concatenate([llo_ref[:], rlo_ref[:], z], axis=0),
             jnp.concatenate([lhi_ref[:], rhi_ref[:], z], axis=0))
    state = permute_tile(G, state, consts)
    out_lo_ref[:] = state[0][:DIGEST]
    out_hi_ref[:] = state[1][:DIGEST]


@functools.lru_cache(maxsize=None)
def _two_to_one_call(N: int, tile: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ..field.gl import make_gl
    G = make_gl(jnp, force_u32=True)

    kern = functools.partial(_two_to_one_kernel, G)
    return pl.pallas_call(
        kern,
        grid=(N // tile,),
        in_specs=_const_specs() + [
            pl.BlockSpec((DIGEST, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec((DIGEST, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((DIGEST, N), jnp.uint32)] * 2,
        interpret=interpret,
    )


def two_to_one_level(left, right, tile: int = BULK_CHUNK,
                     interpret: bool = False):
    """One Merkle level: compress N (DIGEST, N) left/right digest pairs
    into (DIGEST, N) parents.  Returns None if N doesn't tile."""
    import jax.numpy as jnp
    llo, lhi = left
    rlo, rhi = right
    D, N = llo.shape
    t = min(tile, N)
    if N % t:
        return None
    fn = _two_to_one_call(N, t, interpret)
    consts = tuple(jnp.asarray(a) for a in _const_arrays())
    return tuple(fn(*consts, llo, lhi, rlo, rhi))
