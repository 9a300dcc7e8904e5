"""Constraint-degree harness: the TPU analog of the reference's gate
testing framework (plonky2_ecdsa/biguint/gates/gate_testing.rs:20-159,
SURVEY.md C25).

The reference's `test_low_degree` evaluates a gate's constraints over the
LDE of random low-degree wire polynomials and asserts the resulting degree
bound; `test_eval_fns` checks that two independent evaluation paths agree.
Our equivalents for the universal PLONK gate + permutation argument:

  * low-degree: the alpha-combined constraint C(x), divided by Z_H(x)
    pointwise on the coset LDE, must be a polynomial of degree < W*n.
    The prover's quotient phase keeps only the first W chunks of the INTT
    (prove.py quotient_phase) — here we recompute the FULL m-point INTT
    with the library's own primitives and assert the discarded tail is
    exactly zero on a satisfied witness (and nonzero on a violated one).
  * eval coherence: the independent recomputation below must reproduce the
    jitted quotient phase's chunk columns bit-for-bit.
"""

import numpy as np

import factories
from tpu_acir_prover.acir.translator import translate_program
from tpu_acir_prover.circuit.compile import compile_circuit
from tpu_acir_prover.field.gl import P
from tpu_acir_prover.prover.config import TEST_CONFIG
from tpu_acir_prover.prover.ntt import coset_lde, coset_intt, intt
from tpu_acir_prover.prover.prove import (ProvingKey, _mat_to_dev,
                                          gate_lincomb, perm_factor_products)

BETA = (3141, 5926)
GAMMA = (5358, 9793)
ALPHA = (2384, 6264)


def _scal_pair(G, e):
    return ((G.xp.uint32(e[0] & 0xFFFFFFFF), G.xp.uint32(e[0] >> 32)),
            (G.xp.uint32(e[1] & 0xFFFFFFFF), G.xp.uint32(e[1] >> 32)))


def _full_quotient_u64(pk, cc, wires_u64, pub_values):
    """Recompute C(x)/Z_H(x) on the whole coset and INTT all m coeffs."""
    G, E = pk.G, pk.E
    n, m = pk.n, pk.m
    W = len(cc.k_shifts)
    rate = pk.config.rate

    wires_dev = _mat_to_dev(G, wires_u64)
    wires_o = pk.commit(wires_dev)
    z_mat = pk.z_phase(wires_dev, BETA, GAMMA)
    z_o = pk.commit(z_mat)

    clo, chi = pk.constants_oracle.lde
    wlo, whi = wires_o.lde
    zlo, zhi = z_o.lde
    xp = G.xp

    def col(mlo, mhi, j):
        return (mlo[:, j], mhi[:, j])

    pi_vals = np.zeros(n, dtype=np.uint64)
    for j, pv in enumerate(pub_values):
        pi_vals[j] = (P - pv) % P
    pilo, pihi = _mat_to_dev(G, pi_vals.reshape(n, 1))
    pi_lde = coset_lde(G, intt(G, (pilo, pihi)), pk.config.rate_bits)

    qm = col(clo, chi, 0)
    gate = G.mul(G.mul(qm, col(wlo, whi, 0)), col(wlo, whi, 1))
    gate = G.add(gate, gate_lincomb(G, False,
                                    (clo[:, 1:1 + W], chi[:, 1:1 + W]),
                                    (wlo, whi)))
    gate = G.add(gate, col(clo, chi, 1 + W))
    gate = G.add(gate, (pi_lde[0][:, 0], pi_lde[1][:, 0]))

    z_ext = (col(zlo, zhi, 0), col(zlo, zhi, 1))
    zg_ext = ((xp.roll(z_ext[0][0], -rate), xp.roll(z_ext[0][1], -rate)),
              (xp.roll(z_ext[1][0], -rate), xp.roll(z_ext[1][1], -rate)))
    beta_d, gamma_d = _scal_pair(G, BETA), _scal_pair(G, GAMMA)
    fnum, fden = perm_factor_products(
        G, E, False, (wlo, whi),
        (clo[:, 2 + W:2 + 2 * W], chi[:, 2 + W:2 + 2 * W]),
        pk.x_lde, pk.k_dev, beta_d, gamma_d)
    c_trans = E.sub(E.mul(z_ext, fnum), E.mul(zg_ext, fden))

    x_minus_1 = G.sub(pk.x_lde, G.const(1, (m,)))
    l1 = G.mul(pk.zh_lde, G.inv(G.mul_const(x_minus_1, n)))
    one_c = G.const(1, (1,))
    c_z1 = (G.mul(l1, G.sub(z_ext[0], one_c)), G.mul(l1, z_ext[1]))

    a1d, a2d = _scal_pair(G, ALPHA), _scal_pair(
        G, ((ALPHA[0] * ALPHA[0] + 7 * ALPHA[1] * ALPHA[1]) % P,
            (2 * ALPHA[0] * ALPHA[1]) % P))
    zeros = xp.zeros_like(gate[0])
    c_all = E.add((gate, (zeros, zeros)),
                  E.add(E.mul(a1d, c_z1), E.mul(a2d, c_trans)))
    t_lde = (G.mul(c_all[0], pk.zh_inv_lde), G.mul(c_all[1], pk.zh_inv_lde))
    t_re = coset_intt(G, t_lde[0])
    t_im = coset_intt(G, t_lde[1])
    return (np.asarray(G.to_u64(t_re)).reshape(m),
            np.asarray(G.to_u64(t_im)).reshape(m)), wires_o, z_o, pi_vals


def _setup(name="fibonacci"):
    prog, wm = factories.ALL_SMALL[name]()
    tr = translate_program(prog)
    cc = compile_circuit(tr.builder)
    pk = ProvingKey(cc, TEST_CONFIG, xp=np)
    vals = cc.generate_witness(tr.external_values(wm))
    assert cc.check_constraints(vals) is None
    return pk, cc, cc.wire_values(vals).T, cc.public_values(vals)


def test_quotient_low_degree():
    """Satisfied witness -> quotient degree < W*n: the INTT tail the prover
    discards is identically zero (low-degree bound, gate_testing.rs:20-63
    analog)."""
    pk, cc, wires_u64, pub = _setup()
    W, n, m = len(cc.k_shifts), pk.n, pk.m
    (t_re, t_im), _, _, _ = _full_quotient_u64(pk, cc, wires_u64, pub)
    assert np.all(t_re[W * n:] == 0), "quotient real tail not zero"
    assert np.all(t_im[W * n:] == 0), "quotient imag tail not zero"
    # sanity: the quotient itself is not the zero polynomial
    assert t_re[:W * n].any() or t_im[:W * n].any()


def test_quotient_degree_violated_witness():
    """A corrupted wire breaks divisibility by Z_H: the tail is nonzero
    (the negative direction of the low-degree harness)."""
    pk, cc, wires_u64, pub = _setup()
    W, n = len(cc.k_shifts), pk.n
    bad = wires_u64.copy()
    bad[2, 0] = (int(bad[2, 0]) + 1) % P
    (t_re, t_im), _, _, _ = _full_quotient_u64(pk, cc, bad, pub)
    assert t_re[W * n:].any() or t_im[W * n:].any(), \
        "tampered witness still yielded a low-degree quotient"


def test_quotient_eval_coherence():
    """The jitted quotient phase and this test's independent recomposition
    agree bit-for-bit on the kept chunks (test_eval_fns analog,
    gate_testing.rs:85-159)."""
    pk, cc, wires_u64, pub = _setup()
    W, n = len(cc.k_shifts), pk.n
    nch = pk.num_chunks
    (t_re, t_im), wires_o, z_o, pi_vals = _full_quotient_u64(
        pk, cc, wires_u64, pub)
    q = pk.quotient_phase(wires_o.lde, z_o.lde, pi_vals, BETA, GAMMA, ALPHA)
    q_u64 = np.asarray(pk.G.to_u64(q))  # (n, 2*nch)
    for k in range(nch):
        assert np.array_equal(q_u64[:, k], t_re[k * n:(k + 1) * n])
        assert np.array_equal(q_u64[:, nch + k], t_im[k * n:(k + 1) * n])
