"""Sharded FRI layer (commit + fold) vs the single-device reference path,
on the 8-device virtual CPU mesh.  Caps and folded layers must be
bit-identical so multi-chip proofs equal single-chip proofs byte for byte."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tpu_acir_prover.field import gl as _gl
from tpu_acir_prover.field.ext import make_ext
from tpu_acir_prover.field.gl import make_gl, P
from tpu_acir_prover.field.poseidon import make_poseidon
from tpu_acir_prover.parallel.fri import (fri_chain_plan, layer_inv2x_padded,
                                          make_sharded_fri_layer)
from tpu_acir_prover.prover.fri import fold_step
from tpu_acir_prover.prover.merkle import merkle_commit

GNP = make_gl(np)
HNP = make_poseidon(GNP)

BETA = (0x1234567890, 0x9876543210)


def _pair(xp, v):
    v = np.asarray(v, dtype=np.uint64)
    return (xp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            xp.asarray((v >> np.uint64(32)).astype(np.uint32)))


def _rand_ext(m, seed):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, P, m, dtype=np.uint64),
            rng.integers(0, P, m, dtype=np.uint64))


def _single_chip(re, im, shift, cap_height):
    """Reference: leaf matrix + merkle_commit + scalar fold (prover/fri.py)."""
    m = len(re)
    h = m // 2
    leaf = np.stack([re[:h], im[:h], re[h:], im[h:]], axis=1)
    tree = merkle_commit(GNP, HNP, _pair(np, leaf.reshape(h, 4)),
                         min(cap_height, h.bit_length() - 1))
    caps = [tuple(int(x) for x in d) for d in tree.cap_u64()]
    w = _gl.root_of_unity(m.bit_length() - 1)
    out_re = np.empty(h, dtype=np.uint64)
    out_im = np.empty(h, dtype=np.uint64)
    for j in range(h):
        x = (shift * _gl.s_pow(w, j)) % P
        v = fold_step((int(re[j]), int(im[j])),
                      (int(re[j + h]), int(im[j + h])), x, BETA)
        out_re[j], out_im[j] = v
    return caps, out_re, out_im


def test_sharded_fri_layer_matches_single_chip():
    m, cap_height = 512, 3
    shift = _gl.MULTIPLICATIVE_GENERATOR
    devs = jax.devices()[:8]
    mesh = Mesh(np.array(devs), ("sp",))
    re, im = _rand_ext(m, 7)

    exp_caps, exp_re, exp_im = _single_chip(re, im, shift, cap_height)

    run = make_sharded_fri_layer(mesh, m, cap_height)
    inv2x = layer_inv2x_padded(m, shift)
    with mesh:
        caps, nxt = run((_pair(jnp, re), _pair(jnp, im)),
                        _pair(jnp, inv2x), BETA)
    got_re = np.asarray(GNP.to_u64((np.asarray(nxt[0][0]),
                                    np.asarray(nxt[0][1]))))
    got_im = np.asarray(GNP.to_u64((np.asarray(nxt[1][0]),
                                    np.asarray(nxt[1][1]))))
    assert caps == exp_caps
    assert np.array_equal(got_re, exp_re)
    assert np.array_equal(got_im, exp_im)


def test_sharded_fri_chain():
    """Fold a whole chain of shardable layers; every layer's caps and the
    surviving vector match the single-chip reference."""
    m, cap_height, final_domain = 1024, 2, 32
    devs = jax.devices()[:8]
    d = 8
    mesh = Mesh(np.array(devs), ("sp",))
    sizes, rest = fri_chain_plan(m, d, final_domain)
    assert sizes and rest >= final_domain

    re, im = _rand_ext(m, 11)
    cur_re, cur_im = re.copy(), im.copy()
    shift = _gl.MULTIPLICATIVE_GENERATOR

    cur_dev = (_pair(jnp, re), _pair(jnp, im))
    with mesh:
        for m_l in sizes:
            exp_caps, cur_re, cur_im = _single_chip(
                cur_re, cur_im, shift, cap_height)
            run = make_sharded_fri_layer(mesh, m_l, cap_height)
            caps, cur_dev = run(cur_dev, _pair(jnp, layer_inv2x_padded(
                m_l, shift)), BETA)
            assert caps == exp_caps, f"caps diverged at layer size {m_l}"
            shift = (shift * shift) % P
    got_re = np.asarray(GNP.to_u64((np.asarray(cur_dev[0][0]),
                                    np.asarray(cur_dev[0][1]))))
    got_im = np.asarray(GNP.to_u64((np.asarray(cur_dev[1][0]),
                                    np.asarray(cur_dev[1][1]))))
    assert np.array_equal(got_re, cur_re)
    assert np.array_equal(got_im, cur_im)
