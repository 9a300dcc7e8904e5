"""End-to-end prover: compiled circuit + witness -> FRI proof.

Owns the pipeline the reference hands to its external fork at
circuit_data.prove (actions/prove_action.rs:91-97): witness fill ->
wire/Z/quotient polynomial construction -> coset LDE -> Poseidon Merkle
commitments -> openings at zeta in GF(p^2) -> batch FRI.  Every phase is a
statically-shaped batched array program (see docs/DESIGN.md "TPU mapping");
the host only drives the Fiat-Shamir transcript between phases.

Proof relation (PLONK over Goldilocks, W routed wires, one universal gate):

  gate:   qM*w0*w1 + sum_i qi*wi + qC + PI(x) = 0        on H
  perm:   L_1(x)*(Z(x)-1) = 0
          Z(x)*prod_i(w_i + B*k_i*x + G) = Z(gx)*prod_i(w_i + B*sigma_i + G)
  t(x) = sum_j alpha^j c_j(x) / (x^n - 1), committed in NUM_CHUNKS chunks.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

from ..circuit.compile import CompiledCircuit, powers_u64
from ..field import gl as _gl
from ..field.ext import make_ext, e_add, e_mul, e_pow
from ..field.gl import P, make_gl
from ..field.poseidon import make_poseidon
from .challenger import Challenger
from .config import ProofConfig, STANDARD_CONFIG
from .fri import fri_commit, grind, _to_dev
from .merkle import MerkleTree, merkle_commit
from .ntt import coset_intt, coset_lde, intt
from .proof import (Openings, OracleOpening, Proof, QueryRound, FriStep,
                    VerifyingKey)

NUM_CHUNKS_MARGIN = 0  # quotient degree is (W+1)(n-1) - n => W chunks suffice


def _default_xp():
    import jax.numpy as jnp
    return jnp


def _from_dev_u64(G, pair) -> np.ndarray:
    return np.asarray(G.to_u64(pair))


def _mat_to_dev(G, m_u64: np.ndarray):
    m_u64 = np.ascontiguousarray(m_u64, dtype=np.uint64)
    return (G.xp.asarray((m_u64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            G.xp.asarray((m_u64 >> np.uint64(32)).astype(np.uint32)))


def sum_rows(G, m):
    """Tree-sum a (n, C) field matrix over axis 0 -> (C,)."""
    lo, hi = m
    while lo.shape[0] > 1:
        half = lo.shape[0] // 2
        lo, hi = G.add((lo[:half], hi[:half]), (lo[half:], hi[half:]))
    return lo[0], hi[0]


def ext_powers_u64(z: Tuple[int, int], n: int) -> Tuple[np.ndarray, np.ndarray]:
    """[z^0 .. z^(n-1)] in GF(p^2) as (re, im) uint64 arrays (host limbs)."""
    G = make_gl(np)
    re = (np.array([1], np.uint32), np.array([0], np.uint32))
    im = (np.array([0], np.uint32), np.array([0], np.uint32))
    cur = z
    k = 1
    while k < n:
        c0 = G.const(cur[0], (1,))
        c1 = G.const(cur[1], (1,))
        # (re + im u)(c0 + c1 u) = re c0 + 7 im c1 + (re c1 + im c0) u
        nre = G.add(G.mul(re, c0), G.mul_const(G.mul(im, c1), 7))
        nim = G.add(G.mul(re, c1), G.mul(im, c0))
        re = (np.concatenate([re[0], nre[0]]), np.concatenate([re[1], nre[1]]))
        im = (np.concatenate([im[0], nim[0]]), np.concatenate([im[1], nim[1]]))
        cur = e_mul(cur, cur)
        k *= 2
    return (G.to_u64((re[0][:n], re[1][:n])), G.to_u64((im[0][:n], im[1][:n])))


@dataclass
class Oracle:
    """A committed polynomial batch: coeffs + LDE values + Merkle tree."""
    coeffs: tuple      # (n, C) dev pair
    lde: tuple         # (m, C) dev pair
    tree: MerkleTree


def commit_values(G, H, values_dev, rate_bits: int, cap_height: int) -> Oracle:
    coeffs = intt(G, values_dev)
    lde = coset_lde(G, coeffs, rate_bits)
    m = lde[0].shape[0]
    tree = merkle_commit(G, H, lde, min(cap_height, m.bit_length() - 1))
    return Oracle(coeffs, lde, tree)


def commit_coeffs(G, H, coeffs_dev, rate_bits: int, cap_height: int) -> Oracle:
    lde = coset_lde(G, coeffs_dev, rate_bits)
    m = lde[0].shape[0]
    tree = merkle_commit(G, H, lde, min(cap_height, m.bit_length() - 1))
    return Oracle(coeffs_dev, lde, tree)


class ProvingKey:
    """Device-resident preprocessed data for one compiled circuit — the
    analog of plonky2 ProverCircuitData, built ONCE and reused across prove
    calls (the reference re-translates per command, prove_action.rs:18-19)."""

    def __init__(self, compiled: CompiledCircuit, config: ProofConfig = STANDARD_CONFIG,
                 xp=None):
        self.compiled = compiled
        self.config = config
        xp = xp or _default_xp()
        self.G = make_gl(xp)
        self.E = make_ext(self.G)
        self.H = make_poseidon(self.G)
        n = compiled.n
        self.n = n
        self.m = n << config.rate_bits
        self.num_chunks = len(compiled.k_shifts) + NUM_CHUNKS_MARGIN

        # preprocessed oracle: [qM, q0..q5, qC, sigma_0..sigma_5]
        pre = np.concatenate([compiled.selectors, compiled.sigma], axis=0).T  # (n, 14)
        self.constants_oracle = commit_values(
            self.G, self.H, _mat_to_dev(self.G, pre), config.rate_bits,
            config.cap_height)

        # domain tables
        self.omega = _gl.root_of_unity(compiled.log_n)
        log_m = self.m.bit_length() - 1
        omega_m = _gl.root_of_unity(log_m)
        g = _gl.MULTIPLICATIVE_GENERATOR
        self.x_lde = _to_dev(self.G, _mul_pow_table(omega_m, self.m, g))
        self.x_h = _to_dev(self.G, powers_u64(self.omega, n))  # x over H
        # Z_H(x) = x^n - 1 on the LDE coset: period-`rate` values
        rate = config.rate
        gn = pow(g, n, P)
        wn = pow(omega_m, n, P)
        zh = [(gn * pow(wn, i, P) - 1) % P for i in range(rate)]
        zh_inv = np.tile(np.array([_gl.s_inv(v) for v in zh], dtype=np.uint64),
                         self.m // rate)
        self.zh_inv_lde = _to_dev(self.G, zh_inv)
        self.zh_lde = _to_dev(self.G, np.tile(np.array(zh, dtype=np.uint64),
                                              self.m // rate))

        self.vk = VerifyingKey(
            log_n=compiled.log_n, num_wires=len(compiled.k_shifts),
            num_public_inputs=compiled.num_public_inputs,
            k_shifts=compiled.k_shifts, num_quotient_chunks=self.num_chunks,
            rate_bits=config.rate_bits, cap_height=config.cap_height,
            num_queries=config.num_queries, pow_bits=config.pow_bits,
            final_poly_domain=config.final_poly_domain,
            constants_cap=[tuple(int(x) for x in d)
                           for d in self.constants_oracle.tree.cap_u64()],
        )


def _mul_pow_table(base: int, n: int, scale: int) -> np.ndarray:
    from .fri import _mul_u64
    return _mul_u64(powers_u64(base, n), scale)


def _ext_scalar_dev(G, v: Tuple[int, int], shape=(1,)):
    return (G.const(v[0], shape), G.const(v[1], shape))


def _col(dev_mat, j):
    return (dev_mat[0][:, j], dev_mat[1][:, j])


def _acc_ext_combo(G, E, mats_cols, alphas):
    """sum_i alpha_i * col_i for base columns col_i and ext scalars alpha_i."""
    acc = None
    for (col, a) in zip(mats_cols, alphas):
        t = (G.mul(col, G.const(a[0], (1,))), G.mul(col, G.const(a[1], (1,))))
        acc = t if acc is None else E.add(acc, t)
    return acc


def _open_row(tree: MerkleTree, idx: int) -> OracleOpening:
    row, path = tree.open_row(idx)
    return OracleOpening(row=[int(v) for v in row],
                         path=[tuple(int(x) for x in d) for d in path])


def prove(pk: ProvingKey, external_values: np.ndarray,
          check_constraints: bool = False) -> Proof:
    G, E, H = pk.G, pk.E, pk.H
    cc = pk.compiled
    cfg = pk.config
    n, m = pk.n, pk.m
    W = len(cc.k_shifts)

    # ---- phase 0: witness fill (host, batched limbs) -----------------------
    vals = cc.generate_witness(external_values)
    if check_constraints:
        bad = cc.check_constraints(vals)
        assert bad is None, f"constraint violated at row {bad}"
    pub_values = cc.public_values(vals)
    wires_u64 = cc.wire_values(vals).T  # (n, W)

    challenger = Challenger()
    for d in pk.vk.constants_cap:
        challenger.observe_many(d)
    challenger.observe_many(pub_values)

    # ---- phase 1: wire commitment ------------------------------------------
    wires_oracle = commit_values(G, H, _mat_to_dev(G, wires_u64),
                                 cfg.rate_bits, cfg.cap_height)
    challenger.observe_cap(wires_oracle.tree.cap_u64())
    beta = challenger.get_ext_challenge()
    gamma = challenger.get_ext_challenge()

    # ---- phase 2: permutation grand product Z ------------------------------
    beta_d = _ext_scalar_dev(G, beta)
    gamma_d = _ext_scalar_dev(G, gamma)
    wires_dev = _mat_to_dev(G, wires_u64)
    sigma_dev = _mat_to_dev(G, cc.sigma.T)  # (n, W)
    num = None
    den = None
    for i in range(W):
        wcol = _col(wires_dev, i)
        kx = G.mul_const(pk.x_h, cc.k_shifts[i])
        f_num = E.add((G.add(wcol, G.mul(beta_d[0], kx)), G.mul(beta_d[1], kx)),
                      (gamma_d[0], gamma_d[1]))
        scol = _col(sigma_dev, i)
        f_den = E.add((G.add(wcol, G.mul(beta_d[0], scol)), G.mul(beta_d[1], scol)),
                      (gamma_d[0], gamma_d[1]))
        num = f_num if num is None else E.mul(num, f_num)
        den = f_den if den is None else E.mul(den, f_den)
    ratio = E.mul(num, E.inv(den))
    # inclusive prefix product (Hillis-Steele), then shift right by one
    xp = G.xp
    acc = ratio
    d = 1
    while d < n:
        ones_lo = xp.ones((d,), dtype=xp.uint32)
        zeros_lo = xp.zeros((d,), dtype=xp.uint32)

        def shifted(comp, fill_lo):
            return (xp.concatenate([fill_lo, comp[0][:-d]]),
                    xp.concatenate([zeros_lo, comp[1][:-d]]))

        sh = (shifted(acc[0], ones_lo), shifted(acc[1], zeros_lo))
        acc = E.mul(acc, sh)
        d *= 2
    one_lo = xp.ones((1,), dtype=xp.uint32)
    zero_lo = xp.zeros((1,), dtype=xp.uint32)
    z_re = (xp.concatenate([one_lo, acc[0][0][:-1]]),
            xp.concatenate([zero_lo, acc[0][1][:-1]]))
    z_im = (xp.concatenate([zero_lo, acc[1][0][:-1]]),
            xp.concatenate([zero_lo, acc[1][1][:-1]]))
    z_mat = (xp.stack([z_re[0], z_im[0]], axis=1),
             xp.stack([z_re[1], z_im[1]], axis=1))  # (n, 2)
    z_oracle = commit_values(G, H, z_mat, cfg.rate_bits, cfg.cap_height)
    challenger.observe_cap(z_oracle.tree.cap_u64())
    alpha = challenger.get_ext_challenge()

    # ---- phase 3: quotient ---------------------------------------------------
    # all polys on the LDE coset
    cols_const = pk.constants_oracle.lde   # (m, 14): qM q0..q5 qC s0..s5
    cols_wires = wires_oracle.lde          # (m, W)
    cols_z = z_oracle.lde                  # (m, 2)

    # PI polynomial values on H -> LDE
    pi_vals = np.zeros(n, dtype=np.uint64)
    for j, pv in enumerate(pub_values):
        pi_vals[j] = (P - pv) % P
    pi_dev = _mat_to_dev(G, pi_vals.reshape(n, 1))
    pi_lde = coset_lde(G, intt(G, pi_dev), cfg.rate_bits)

    # gate constraint (base field)
    qm = _col(cols_const, 0)
    gate = G.mul(G.mul(qm, _col(cols_wires, 0)), _col(cols_wires, 1))
    for i in range(W):
        gate = G.add(gate, G.mul(_col(cols_const, 1 + i), _col(cols_wires, i)))
    gate = G.add(gate, _col(cols_const, 1 + W))
    gate = G.add(gate, (pi_lde[0][:, 0], pi_lde[1][:, 0]))

    # permutation constraints (ext)
    z_ext = (_col(cols_z, 0), _col(cols_z, 1))
    rate = cfg.rate
    zg_ext = ((xp.roll(z_ext[0][0], -rate), xp.roll(z_ext[0][1], -rate)),
              (xp.roll(z_ext[1][0], -rate), xp.roll(z_ext[1][1], -rate)))
    fnum = None
    fden = None
    for i in range(W):
        wcol = _col(cols_wires, i)
        kx = G.mul_const(pk.x_lde, cc.k_shifts[i])
        f_num = ((G.add(G.add(wcol, G.mul(beta_d[0], kx)), gamma_d[0])),
                 G.add(G.mul(beta_d[1], kx), gamma_d[1]))
        scol = _col(cols_const, 2 + W + i)
        f_den = ((G.add(G.add(wcol, G.mul(beta_d[0], scol)), gamma_d[0])),
                 G.add(G.mul(beta_d[1], scol), gamma_d[1]))
        fnum = f_num if fnum is None else E.mul(fnum, f_num)
        fden = f_den if fden is None else E.mul(fden, f_den)
    c_trans = E.sub(E.mul(z_ext, fnum), E.mul(zg_ext, fden))

    # L_1(x) on LDE = (x^n - 1) / (n (x - 1))
    x_minus_1 = G.sub(pk.x_lde, G.const(1, (m,)))
    l1 = G.mul(pk.zh_lde, G.inv(G.mul_const(x_minus_1, n)))
    one_c = G.const(1, (1,))
    zm1 = (G.sub(z_ext[0], one_c), z_ext[1])
    c_z1 = (G.mul(l1, zm1[0]), G.mul(l1, zm1[1]))

    a1 = alpha
    a2 = e_mul(alpha, alpha)
    a1d = _ext_scalar_dev(G, a1)
    a2d = _ext_scalar_dev(G, a2)
    zeros = xp.zeros_like(gate[0])
    c_all = E.add((gate, (zeros, zeros)),
                  E.add(E.mul(a1d, c_z1), E.mul(a2d, c_trans)))
    t_lde = (G.mul(c_all[0], pk.zh_inv_lde), G.mul(c_all[1], pk.zh_inv_lde))
    t_coeffs_re = coset_intt(G, t_lde[0])
    t_coeffs_im = coset_intt(G, t_lde[1])
    # split into num_chunks chunks of n coeffs: columns [re0, im0, re1, im1, ..]
    nch = pk.num_chunks
    q_lo = xp.stack(
        [t_coeffs_re[0][k * n:(k + 1) * n, 0] for k in range(nch)] +
        [t_coeffs_im[0][k * n:(k + 1) * n, 0] for k in range(nch)], axis=1)
    q_hi = xp.stack(
        [t_coeffs_re[1][k * n:(k + 1) * n, 0] for k in range(nch)] +
        [t_coeffs_im[1][k * n:(k + 1) * n, 0] for k in range(nch)], axis=1)
    quotient_oracle = commit_coeffs(G, H, (q_lo, q_hi), cfg.rate_bits,
                                    cfg.cap_height)
    challenger.observe_cap(quotient_oracle.tree.cap_u64())
    zeta = challenger.get_ext_challenge()

    # ---- phase 4: openings at zeta (and g*zeta for Z) ------------------------
    zpow = ext_powers_u64(zeta, n)
    zpow_re = _to_dev(G, zpow[0])
    zpow_im = _to_dev(G, zpow[1])
    gzeta = e_mul((pk.omega, 0), zeta)
    gzpow = ext_powers_u64(gzeta, n)
    gzpow_re = _to_dev(G, gzpow[0])
    gzpow_im = _to_dev(G, gzpow[1])

    def open_cols(oracle, pows_re, pows_im):
        lo, hi = oracle.coeffs
        c = lo.shape[1]
        out = []
        re_mat = G.mul((lo, hi), (pows_re[0].reshape(-1, 1), pows_re[1].reshape(-1, 1)))
        im_mat = G.mul((lo, hi), (pows_im[0].reshape(-1, 1), pows_im[1].reshape(-1, 1)))
        re_sum = _from_dev_u64(G, sum_rows(G, re_mat))
        im_sum = _from_dev_u64(G, sum_rows(G, im_mat))
        for j in range(c):
            out.append((int(re_sum[j]), int(im_sum[j])))
        return out

    open_const = open_cols(pk.constants_oracle, zpow_re, zpow_im)
    open_wires = open_cols(wires_oracle, zpow_re, zpow_im)
    open_z = open_cols(z_oracle, zpow_re, zpow_im)
    open_z_next = open_cols(z_oracle, gzpow_re, gzpow_im)
    open_quot = open_cols(quotient_oracle, zpow_re, zpow_im)
    openings = Openings(open_const, open_wires, open_z, open_z_next, open_quot)
    for (a, b) in openings.ordered():
        challenger.observe(a)
        challenger.observe(b)
    fri_alpha = challenger.get_ext_challenge()

    # ---- phase 5: FRI ---------------------------------------------------------
    oracles = [pk.constants_oracle, wires_oracle, z_oracle, quotient_oracle]
    all_cols = []
    for o in oracles:
        for j in range(o.lde[0].shape[1]):
            all_cols.append(_col(o.lde, j))
    ys = openings.constants_sigmas + openings.wires + openings.z + openings.quotient
    alphas = [e_pow(fri_alpha, i) for i in range(len(all_cols) + 2)]
    acc1 = _acc_ext_combo(G, E, all_cols, alphas[:len(all_cols)])
    y1 = (0, 0)
    for yv, a in zip(ys, alphas[:len(all_cols)]):
        y1 = e_add(y1, e_mul(yv, a))
    acc1 = E.sub(acc1, _ext_scalar_dev(G, y1))
    xmz = (G.sub(pk.x_lde, G.const(zeta[0], (1,))),
           G.neg(G.const(zeta[1], (m,))))
    F1 = E.mul(acc1, E.inv(xmz))

    z_cols = [_col(z_oracle.lde, 0), _col(z_oracle.lde, 1)]
    acc2 = _acc_ext_combo(G, E, z_cols, alphas[len(all_cols):])
    y2 = (0, 0)
    for yv, a in zip(openings.z_next, alphas[len(all_cols):]):
        y2 = e_add(y2, e_mul(yv, a))
    acc2 = E.sub(acc2, _ext_scalar_dev(G, y2))
    xmgz = (G.sub(pk.x_lde, G.const(gzeta[0], (1,))),
            G.neg(G.const(gzeta[1], (m,))))
    F2 = E.mul(acc2, E.inv(xmgz))
    F = E.add(F1, F2)

    fri_trees, final_coeffs = fri_commit(
        G, E, H, challenger, F, _gl.MULTIPLICATIVE_GENERATOR, cfg)

    pow_witness = grind(challenger, cfg.pow_bits)
    challenger.observe(pow_witness)
    pow_challenge = challenger.get_challenge()
    assert pow_challenge < (1 << (64 - cfg.pow_bits))
    indices = challenger.get_indices(cfg.num_queries, m)

    # ---- phase 6: query rounds ------------------------------------------------
    queries = []
    for q in indices:
        initial = [_open_row(o.tree, q) for o in oracles]
        steps = []
        idx = q
        for tree in fri_trees:
            h = tree.num_leaves
            j = idx % h
            row, path = tree.open_row(j)
            pair = ((int(row[0]), int(row[1])), (int(row[2]), int(row[3])))
            steps.append(FriStep(pair=pair,
                                 path=[tuple(int(x) for x in d) for d in path]))
            idx = j
        queries.append(QueryRound(initial=initial, steps=steps))

    def cap_list(tree):
        return [tuple(int(x) for x in d) for d in tree.cap_u64()]

    return Proof(
        public_inputs=pub_values,
        wires_cap=cap_list(wires_oracle.tree),
        z_cap=cap_list(z_oracle.tree),
        quotient_cap=cap_list(quotient_oracle.tree),
        openings=openings,
        fri_caps=[cap_list(t) for t in fri_trees],
        fri_final_coeffs=final_coeffs,
        fri_pow_witness=pow_witness,
        fri_queries=queries,
    )
