"""Poseidon permutation over Goldilocks, width 12 — our own instantiation.

Role: the algebraic hash used for Merkle commitments and the Fiat-Shamir
challenger, the TPU-native analog of plonky2's internal Poseidon hasher
(reference config at /root/reference/plonky2-backend/src/lib.rs:11-13).

Instantiation (deliberately NOT plonky2's constants — we are not targeting
byte-compatibility this round; see docs/DESIGN.md):
  - width t = 12, rate 8, capacity 4
  - sbox x^7  (gcd(7, p-1) = 1)
  - 8 full rounds (4 + 4) and 22 partial rounds, the standard parameter
    choice for t=12, alpha=7 at 128-bit security
  - round constants derived from SHA-256 in counter mode (nothing up our
    sleeves), reduced mod p
  - MDS matrix: Cauchy matrix M[i][j] = 1/(x_i + y_j) with x_i = i,
    y_j = 12 + j, which is provably MDS over any prime field where all
    x_i + y_j are nonzero (true here: 12..34 < p)

TPU-first layout: the state is a single stacked (12, *batch) (lo, hi)
uint32 pair, rounds run under lax.scan on the JAX backend (tiny jaxpr,
fast compiles), and hashing N Merkle leaves is N parallel VPU lanes.
"""

from __future__ import annotations

import hashlib

import numpy as np

from . import gl as _gl

WIDTH = 12
RATE = 8
CAP = 4
DIGEST = 4
FULL_ROUNDS = 8
PARTIAL_ROUNDS = 22
N_ROUNDS = FULL_ROUNDS + PARTIAL_ROUNDS
ALPHA = 7


def _derive_round_constants():
    rc = np.zeros((N_ROUNDS, WIDTH), dtype=np.uint64)
    for r in range(N_ROUNDS):
        for i in range(WIDTH):
            h = hashlib.sha256(f"tpu-acir-prover.poseidon.rc.{r}.{i}".encode()).digest()
            rc[r, i] = int.from_bytes(h[:8], "little") % _gl.P
    return rc


def _derive_mds():
    m = np.zeros((WIDTH, WIDTH), dtype=np.uint64)
    for i in range(WIDTH):
        for j in range(WIDTH):
            m[i, j] = _gl.s_inv(i + j + 12)
    return m


ROUND_CONSTANTS = _derive_round_constants()  # (30, 12) uint64
MDS = _derive_mds()  # (12, 12) uint64


def make_poseidon(G):
    """Poseidon ops over a field namespace ``G = make_gl(xp)``.

    States/digests are stacked (lo, hi) uint32 array pairs with a leading
    lane axis: state shape (12, *batch), digest shape (4, *batch).
    """
    xp = G.xp
    is_jax = "jax" in getattr(xp, "__name__", "")

    rc_lo_np = (ROUND_CONSTANTS & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    rc_hi_np = (ROUND_CONSTANTS >> np.uint64(32)).astype(np.uint32)
    mds_lo_np = (MDS & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    mds_hi_np = (MDS >> np.uint64(32)).astype(np.uint32)

    def _bshape(extra_rank):
        return (WIDTH,) + (1,) * extra_rank

    def _mds_layer_py(state):
        """out[i] = sum_j MDS[i, j] * state[j], via 12 broadcast mul-adds."""
        lo, hi = state
        extra = lo.ndim - 1
        acc = None
        for j in range(WIDTH):
            col = (xp.asarray(mds_lo_np[:, j]).reshape(_bshape(extra)),
                   hp_asarray(mds_hi_np[:, j]).reshape(_bshape(extra)))
            sj = (lo[j:j + 1], hi[j:j + 1])  # (1, *batch) broadcasts against (12, 1..)
            term = G.mul(col, sj)
            acc = term if acc is None else G.add(acc, term)
        return acc

    hp_asarray = xp.asarray

    if is_jax:
        from jax import lax as _lax

        def _mds_layer(state):
            """Scan over the 12 MDS columns: ~12x smaller jaxpr than the
            unrolled loop (keeps whole-prover jit compiles fast)."""
            lo, hi = state
            extra = lo.ndim - 1
            cols_lo = xp.asarray(mds_lo_np.T).reshape((WIDTH,) + _bshape(extra))
            cols_hi = xp.asarray(mds_hi_np.T).reshape((WIDTH,) + _bshape(extra))

            def body(acc, xs):
                clo, chi, sl, sh = xs
                term = G.mul((clo, chi), (sl[None], sh[None]))
                return (G.add(acc, term)), None

            z = xp.zeros_like(lo)
            (acc, _) = _lax.scan(body, (z, z), (cols_lo, cols_hi, lo, hi))
            return acc
    else:
        _mds_layer = _mds_layer_py

    def _sbox(x):
        x2 = G.mul(x, x)
        x3 = G.mul(x2, x)
        x6 = G.mul(x3, x3)
        return G.mul(x6, x)

    def _add_rc(state, rc):
        # rc: (lo, hi) of shape (12,), broadcast over batch
        extra = state[0].ndim - 1
        return G.add(state, (rc[0].reshape(_bshape(extra)), rc[1].reshape(_bshape(extra))))

    def _full_round(state, rc):
        state = _add_rc(state, rc)
        state = _sbox(state)
        return _mds_layer(state)

    def _partial_round(state, rc):
        state = _add_rc(state, rc)
        lo, hi = state
        s0 = _sbox((lo[0:1], hi[0:1]))
        state = (xp.concatenate([s0[0], lo[1:]], axis=0),
                 xp.concatenate([s0[1], hi[1:]], axis=0))
        return _mds_layer(state)

    def _permute_python(state):
        r = 0
        for _ in range(FULL_ROUNDS // 2):
            state = _full_round(state, (xp.asarray(rc_lo_np[r]), xp.asarray(rc_hi_np[r])))
            r += 1
        for _ in range(PARTIAL_ROUNDS):
            state = _partial_round(state, (xp.asarray(rc_lo_np[r]), xp.asarray(rc_hi_np[r])))
            r += 1
        for _ in range(FULL_ROUNDS // 2):
            state = _full_round(state, (xp.asarray(rc_lo_np[r]), xp.asarray(rc_hi_np[r])))
            r += 1
        return state

    if is_jax:
        from jax import lax

        def _scan_rounds(state, lo_slice, hi_slice, round_fn):
            def body(carry, rc):
                return round_fn(carry, rc), None

            state, _ = lax.scan(body, state, (xp.asarray(lo_slice), xp.asarray(hi_slice)))
            return state

        def permute(state):
            h = FULL_ROUNDS // 2
            state = _scan_rounds(state, rc_lo_np[:h], rc_hi_np[:h],
                                 lambda s, rc: _full_round(s, rc))
            state = _scan_rounds(state, rc_lo_np[h:h + PARTIAL_ROUNDS],
                                 rc_hi_np[h:h + PARTIAL_ROUNDS],
                                 lambda s, rc: _partial_round(s, rc))
            state = _scan_rounds(state, rc_lo_np[h + PARTIAL_ROUNDS:],
                                 rc_hi_np[h + PARTIAL_ROUNDS:],
                                 lambda s, rc: _full_round(s, rc))
            return state
    else:
        permute = _permute_python

    def zero_state(batch_shape):
        z = xp.zeros((WIDTH,) + tuple(batch_shape), dtype=xp.uint32)
        return (z, z)

    def hash_no_pad(inputs):
        """Sponge hash of (C, *batch) stacked values -> (4, *batch) digest.

        Overwrite-mode absorption in chunks of RATE, no padding (lengths are
        static per call site, as in plonky2's hash_n_to_m_no_pad).
        """
        lo, hi = inputs
        c = lo.shape[0]
        state = zero_state(lo.shape[1:])
        for off in range(0, c, RATE):
            k = min(RATE, c - off)
            state = (xp.concatenate([lo[off:off + k], state[0][k:]], axis=0),
                     xp.concatenate([hi[off:off + k], state[1][k:]], axis=0))
            state = permute(state)
        return (state[0][:DIGEST], state[1][:DIGEST])

    def two_to_one(left, right):
        """Compress two (4, *batch) digests into one."""
        z = zero_state(left[0].shape[1:])
        state = (xp.concatenate([left[0], right[0], z[0][RATE:]], axis=0),
                 xp.concatenate([left[1], right[1], z[1][RATE:]], axis=0))
        state = permute(state)
        return (state[0][:DIGEST], state[1][:DIGEST])

    ns = dict(
        permute=permute, hash_no_pad=hash_no_pad, two_to_one=two_to_one,
        zero_state=zero_state, G=G,
    )
    return type("Poseidon", (), ns)


# ---------------------------------------------------------------------------
# Scalar (python-int) permutation for the host challenger and proof
# verification paths — ~1000x faster than tiny-batch numpy for single states.

_RC_INT = [[int(ROUND_CONSTANTS[r, i]) for i in range(WIDTH)] for r in range(N_ROUNDS)]
_MDS_INT = [[int(MDS[i, j]) for j in range(WIDTH)] for i in range(WIDTH)]
_P = _gl.P


def _sbox_int(x):
    x2 = x * x % _P
    x3 = x2 * x % _P
    return x3 * x3 % _P * x % _P


def _mds_int(state):
    return [sum(_MDS_INT[i][j] * state[j] for j in range(WIDTH)) % _P
            for i in range(WIDTH)]


def permute_ints(state):
    """Poseidon permutation on a list of 12 python ints (host scalar path).

    Bit-identical to the vectorized `make_poseidon(...).permute` (tested)."""
    assert len(state) == WIDTH
    r = 0
    for _ in range(FULL_ROUNDS // 2):
        state = [_sbox_int((state[i] + _RC_INT[r][i]) % _P) for i in range(WIDTH)]
        state = _mds_int(state)
        r += 1
    for _ in range(PARTIAL_ROUNDS):
        state = [(state[i] + _RC_INT[r][i]) % _P for i in range(WIDTH)]
        state[0] = _sbox_int(state[0])
        state = _mds_int(state)
        r += 1
    for _ in range(FULL_ROUNDS // 2):
        state = [_sbox_int((state[i] + _RC_INT[r][i]) % _P) for i in range(WIDTH)]
        state = _mds_int(state)
        r += 1
    return state


def hash_no_pad_ints(inputs):
    state = [0] * WIDTH
    for off in range(0, len(inputs), RATE):
        chunk = inputs[off:off + RATE]
        state = list(chunk) + state[len(chunk):]
        state = permute_ints(state)
    return tuple(state[:DIGEST])


def two_to_one_ints(left, right):
    state = list(left) + list(right) + [0] * (WIDTH - RATE)
    state = permute_ints(state)
    return tuple(state[:DIGEST])
