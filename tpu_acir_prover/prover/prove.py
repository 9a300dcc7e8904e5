"""End-to-end prover: compiled circuit + witness -> FRI proof.

Owns the pipeline the reference hands to its external fork at
circuit_data.prove (actions/prove_action.rs:91-97): witness fill ->
wire/Z/quotient polynomial construction -> coset LDE -> Poseidon Merkle
commitments -> openings at zeta in GF(p^2) -> batch FRI.  The host only
drives the Fiat-Shamir transcript between phases; every phase is ONE jitted
XLA program (cached on the ProvingKey), with challenges passed as traced
scalars so recompilation never happens across proofs.

Proof relation (PLONK over Goldilocks, W routed wires, one universal gate):

  gate:   qM*w0*w1 + sum_i qi*wi + qC + PI(x) = 0        on H
  perm:   L_1(x)*(Z(x)-1) = 0
          Z(x)*prod_i(w_i + B*k_i*x + G) = Z(gx)*prod_i(w_i + B*sigma_i + G)
  t(x) = sum_j alpha^j c_j(x) / (x^n - 1), committed in W chunks.
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
from .fri import grind, _to_dev, _mul_u64, _HALF
from .merkle import MerkleTree
from .ntt import coset_intt, coset_lde, intt
from .proof import (Openings, OracleOpening, Proof, QueryRound, FriStep,
                    VerifyingKey)


def _default_xp():
    from ..utils.jaxcfg import setup_jax_cache
    setup_jax_cache()
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
        nre = G.add(G.mul(re, c0), G.mul_const(G.mul(im, c1), 7))
        nim = G.add(G.mul(re, c1), G.mul(im, c0))
        re = (np.concatenate([re[0], nre[0]]), np.concatenate([re[1], nre[1]]))
        im = (np.concatenate([im[0], nim[0]]), np.concatenate([im[1], nim[1]]))
        cur = e_mul(cur, cur)
        k *= 2
    return (G.to_u64((re[0][:n], re[1][:n])), G.to_u64((im[0][:n], im[1][:n])))


def _scal(G, x):
    """Scalar uint32 array -> (1,) broadcastable."""
    return x.reshape(1)


def _ext_arg(v: Tuple[int, int]):
    """Ext scalar -> 4 uint32 numpy scalars (lo/hi of re/im)."""
    return (np.uint32(v[0] & 0xFFFFFFFF), np.uint32(v[0] >> 32),
            np.uint32(v[1] & 0xFFFFFFFF), np.uint32(v[1] >> 32))


@dataclass
class Oracle:
    """A committed polynomial batch: coeffs + LDE values + Merkle tree."""
    coeffs: tuple      # (n, C) dev pair
    lde: tuple         # (m, C) dev pair
    tree: MerkleTree


def _ext_ones(xp, n):
    return ((xp.ones((n,), xp.uint32), xp.zeros((n,), xp.uint32)),
            (xp.zeros((n,), xp.uint32), xp.zeros((n,), xp.uint32)))


def perm_factor_products(G, E, is_jax, wires, sigmas, xpair, k_dev,
                         beta_d, gamma_d):
    """prod_i (w_i + B k_i x + G) and prod_i (w_i + B sigma_i + G), as a
    scan over the W wire columns (compact jaxpr; python loop on numpy).

    wires/sigmas: (n, W) pairs; k_dev: (W,) pair; returns (num, den) ext."""
    wlo, whi = wires
    slo, shi = sigmas
    n, W = wlo.shape

    def factor(wcol, kx):
        return (G.add(G.add(wcol, G.mul(beta_d[0], kx)), gamma_d[0]),
                G.add(G.mul(beta_d[1], kx), gamma_d[1]))

    if not is_jax:
        num = den = None
        for i in range(W):
            kx = G.mul(xpair, (k_dev[0][i:i + 1], k_dev[1][i:i + 1]))
            f_num = factor((wlo[:, i], whi[:, i]), kx)
            f_den = factor((wlo[:, i], whi[:, i]), (slo[:, i], shi[:, i]))
            num = f_num if num is None else E.mul(num, f_num)
            den = f_den if den is None else E.mul(den, f_den)
        return num, den

    from jax import lax

    def body(carry, xs):
        num, den = carry
        wl, wh, sl, sh, kl, kh = xs
        kx = G.mul(xpair, (kl.reshape(1), kh.reshape(1)))
        f_num = factor((wl, wh), kx)
        f_den = factor((wl, wh), (sl, sh))
        return (E.mul(num, f_num), E.mul(den, f_den)), None

    init = (_ext_ones(G.xp, n), _ext_ones(G.xp, n))
    xs = (wlo.T, whi.T, slo.T, shi.T, k_dev[0], k_dev[1])
    (num, den), _ = lax.scan(body, init, xs)
    return num, den


def prefix_product_ext(G, E, is_jax, ratio, log_n: int):
    """Inclusive prefix product of an ext vector (Hillis-Steele)."""
    xp = G.xp
    n = ratio[0][0].shape[0]
    if not is_jax:
        acc = ratio
        d = 1
        while d < n:
            zl = xp.zeros((d,), dtype=xp.uint32)
            ol = xp.ones((d,), dtype=xp.uint32)

            def sh(comp, fill_lo):
                return (xp.concatenate([fill_lo, comp[0][:-d]]),
                        xp.concatenate([zl, comp[1][:-d]]))

            acc = E.mul(acc, (sh(acc[0], ol), sh(acc[1], zl)))
            d *= 2
        return acc

    import jax.numpy as jnp
    from jax import lax
    iota = lax.iota(jnp.int32, n)

    def body(s, acc):
        d = jnp.int32(1) << s

        def sh(comp, fill_one):
            rl = jnp.roll(comp[0], d)
            rh = jnp.roll(comp[1], d)
            mask = iota < d
            fl = jnp.where(mask, jnp.uint32(1 if fill_one else 0), rl)
            fh = jnp.where(mask, jnp.uint32(0), rh)
            return fl, fh

        return E.mul(acc, (sh(acc[0], True), sh(acc[1], False)))

    return lax.fori_loop(0, log_n, body, ratio)


def gate_lincomb(G, is_jax, q_cols, w_cols):
    """sum_i q_i * w_i over the W wire columns (scan on jax)."""
    qlo, qhi = q_cols
    wlo, whi = w_cols
    n, W = wlo.shape
    if not is_jax:
        acc = None
        for i in range(W):
            t = G.mul((qlo[:, i], qhi[:, i]), (wlo[:, i], whi[:, i]))
            acc = t if acc is None else G.add(acc, t)
        return acc
    from jax import lax

    def body(acc, xs):
        ql, qh, wl, wh = xs
        return G.add(acc, G.mul((ql, qh), (wl, wh))), None

    z = G.xp.zeros((n,), G.xp.uint32)
    acc, _ = lax.scan(body, (z, z), (qlo.T, qhi.T, wlo.T, whi.T))
    return acc


def ext_combo_columns(G, E, is_jax, mat, alphas_dev):
    """sum_j alpha_j * col_j for base columns and ext scalars alphas
    (alphas_dev: 4 arrays (C,): lo/hi of re/im)."""
    lo, hi = mat
    n, C = lo.shape
    alr, ahr, ali, ahi_ = alphas_dev
    if not is_jax:
        acc = None
        for j in range(C):
            colv = (lo[:, j], hi[:, j])
            t = (G.mul(colv, (alr[j:j + 1], ahr[j:j + 1])),
                 G.mul(colv, (ali[j:j + 1], ahi_[j:j + 1])))
            acc = t if acc is None else E.add(acc, t)
        return acc
    from jax import lax

    def body(acc, xs):
        l, h, a0, a1, a2, a3 = xs
        colv = (l, h)
        t = (G.mul(colv, (a0.reshape(1), a1.reshape(1))),
             G.mul(colv, (a2.reshape(1), a3.reshape(1))))
        return E.add(acc, t), None

    z = G.xp.zeros((n,), G.xp.uint32)
    acc, _ = lax.scan(body, ((z, z), (z, z)), (lo.T, hi.T, alr, ahr, ali, ahi_))
    return acc


class ProvingKey:
    """Device-resident preprocessed data + jitted phase programs for one
    compiled circuit — the analog of plonky2 ProverCircuitData, built ONCE
    and reused across prove calls (the reference re-translates per command,
    prove_action.rs:18-19)."""

    def __init__(self, compiled: CompiledCircuit, config: ProofConfig = STANDARD_CONFIG,
                 xp=None):
        self.compiled = compiled
        self.config = config
        xp = xp or _default_xp()
        self.G = make_gl(xp)
        self.E = make_ext(self.G)
        self.H = make_poseidon(self.G)
        self.is_jax = "jax" in getattr(xp, "__name__", "")
        self._jits = {}
        n = compiled.n
        self.n = n
        self.m = n << config.rate_bits
        self.num_chunks = len(compiled.k_shifts)

        G = self.G
        # preprocessed oracle: [qM, q0..q5, qC, sigma_0..sigma_5]
        pre = np.concatenate([compiled.selectors, compiled.sigma], axis=0).T
        pre_dev = _mat_to_dev(G, pre)
        self.constants_oracle = self.commit(pre_dev)

        # domain tables
        self.omega = _gl.root_of_unity(compiled.log_n)
        log_m = self.m.bit_length() - 1
        omega_m = _gl.root_of_unity(log_m)
        g = _gl.MULTIPLICATIVE_GENERATOR
        self.x_lde = _to_dev(G, _mul_u64(powers_u64(omega_m, self.m), g))
        self.x_h = _to_dev(G, powers_u64(self.omega, n))
        rate = config.rate
        gn = pow(g, n, P)
        wn = pow(omega_m, n, P)
        zh = [(gn * pow(wn, i, P) - 1) % P for i in range(rate)]
        zh_inv = np.tile(np.array([_gl.s_inv(v) for v in zh], dtype=np.uint64),
                         self.m // rate)
        self.zh_inv_lde = _to_dev(G, zh_inv)
        self.zh_lde = _to_dev(G, np.tile(np.array(zh, dtype=np.uint64),
                                         self.m // rate))
        self.sigma_dev = _mat_to_dev(G, compiled.sigma.T)
        self.k_dev = _to_dev(G, np.array(compiled.k_shifts, dtype=np.uint64))

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

    # ---- jit cache --------------------------------------------------------

    def jit(self, key, fn):
        """Memoize a jitted phase program (identity fn on numpy backend)."""
        if not self.is_jax:
            return fn
        if key not in self._jits:
            import jax
            self._jits[key] = jax.jit(fn)
        return self._jits[key]

    # ---- phase programs -----------------------------------------------------

    def commit(self, values_dev, from_coeffs: bool = False) -> Oracle:
        G, H = self.G, self.H
        rate_bits, cap_height = self.config.rate_bits, self.config.cap_height

        def run(lo, hi):
            coeffs = (lo, hi) if from_coeffs else intt(G, (lo, hi))
            lde = coset_lde(G, coeffs, rate_bits)
            return coeffs, lde

        shape = tuple(values_dev[0].shape)
        coeffs, lde = self.jit(("polylde", from_coeffs, shape), run)(*values_dev)
        levels = self.merkle_levels(lde)
        tree = MerkleTree(G, lde[0], lde[1], levels,
                          min(cap_height, lde[0].shape[0].bit_length() - 1))
        return Oracle(coeffs, lde, tree)

    def merkle_levels(self, matrix):
        """Merkle levels via per-shape SHARED jitted hash programs (tree
        levels above the leaves have identical shapes across oracles, so
        the Poseidon compression compiles once per size, not per oracle)."""
        G, H = self.G, self.H
        cap_height = self.config.cap_height
        m, c = matrix[0].shape
        ch = min(cap_height, m.bit_length() - 1)
        leaf = self.jit(("leafhash", m, c),
                        lambda lo, hi: H.hash_no_pad((lo.T, hi.T)))(*matrix)
        levels = [leaf]
        dlo, dhi = leaf
        size = m
        while size > (1 << ch):
            dlo, dhi = self.jit(("two_to_one", size), lambda lo, hi: H.two_to_one(
                (lo[:, 0::2], hi[:, 0::2]), (lo[:, 1::2], hi[:, 1::2])))(dlo, dhi)
            levels.append((dlo, dhi))
            size //= 2
        return levels

    def z_phase(self, wires_dev, beta, gamma):
        """Permutation grand product Z (ext): ratio -> prefix product."""
        G, E = self.G, self.E
        cc = self.compiled
        n = self.n
        W = len(cc.k_shifts)
        xp = G.xp

        is_jax = self.is_jax

        def run(wlo, whi, slo, shi, xlo, xhi, klo, khi,
                b0, b1, b2, b3, g0, g1, g2, g3):
            beta_d = ((_scal(G, b0), _scal(G, b1)), (_scal(G, b2), _scal(G, b3)))
            gamma_d = ((_scal(G, g0), _scal(G, g1)), (_scal(G, g2), _scal(G, g3)))
            num, den = perm_factor_products(G, E, is_jax, (wlo, whi),
                                            (slo, shi), (xlo, xhi), (klo, khi),
                                            beta_d, gamma_d)
            ratio = E.mul(num, E.inv(den))
            acc = prefix_product_ext(G, E, is_jax, ratio, self.compiled.log_n)
            o1 = xp.ones((1,), dtype=xp.uint32)
            z1 = xp.zeros((1,), dtype=xp.uint32)
            z_re = (xp.concatenate([o1, acc[0][0][:-1]]),
                    xp.concatenate([z1, acc[0][1][:-1]]))
            z_im = (xp.concatenate([z1, acc[1][0][:-1]]),
                    xp.concatenate([z1, acc[1][1][:-1]]))
            return (xp.stack([z_re[0], z_im[0]], axis=1),
                    xp.stack([z_re[1], z_im[1]], axis=1))

        args = (*wires_dev, *self.sigma_dev, *self.x_h, *self.k_dev,
                *_ext_arg(beta), *_ext_arg(gamma))
        return self.jit(("z",), run)(*args)

    def quotient_phase(self, wires_lde, z_lde, pi_vals, beta, gamma, alpha):
        """alpha-combined constraints / Z_H -> quotient coeff columns."""
        G, E = self.G, self.E
        cc = self.compiled
        n, m = self.n, self.m
        W = len(cc.k_shifts)
        nch = self.num_chunks
        rate = self.config.rate
        xp = G.xp
        rate_bits = self.config.rate_bits
        const_lde = self.constants_oracle.lde

        is_jax = self.is_jax

        def run(clo, chi, wlo, whi, zlo, zhi, pilo, pihi, xlo, xhi,
                klo, khi, zhilo, zhihi, zhlo, zhhi,
                b0, b1, b2, b3, g0, g1, g2, g3, a0, a1, a2, a3,
                q0, q1, q2, q3):
            beta_d = ((_scal(G, b0), _scal(G, b1)), (_scal(G, b2), _scal(G, b3)))
            gamma_d = ((_scal(G, g0), _scal(G, g1)), (_scal(G, g2), _scal(G, g3)))
            a1d = ((_scal(G, a0), _scal(G, a1)), (_scal(G, a2), _scal(G, a3)))
            a2d = ((_scal(G, q0), _scal(G, q1)), (_scal(G, q2), _scal(G, q3)))

            def col(mlo, mhi, j):
                return (mlo[:, j], mhi[:, j])

            pi_lde = coset_lde(G, intt(G, (pilo.reshape(n, 1),
                                           pihi.reshape(n, 1))), rate_bits)
            qm = col(clo, chi, 0)
            gate = G.mul(G.mul(qm, col(wlo, whi, 0)), col(wlo, whi, 1))
            gate = G.add(gate, gate_lincomb(G, is_jax,
                                            (clo[:, 1:1 + W], chi[:, 1:1 + W]),
                                            (wlo, whi)))
            gate = G.add(gate, col(clo, chi, 1 + W))
            gate = G.add(gate, (pi_lde[0][:, 0], pi_lde[1][:, 0]))

            z_ext = (col(zlo, zhi, 0), col(zlo, zhi, 1))
            zg_ext = ((xp.roll(z_ext[0][0], -rate), xp.roll(z_ext[0][1], -rate)),
                      (xp.roll(z_ext[1][0], -rate), xp.roll(z_ext[1][1], -rate)))
            fnum, fden = perm_factor_products(
                G, E, is_jax, (wlo, whi),
                (clo[:, 2 + W:2 + 2 * W], chi[:, 2 + W:2 + 2 * W]),
                (xlo, xhi), (klo, khi), beta_d, gamma_d)
            c_trans = E.sub(E.mul(z_ext, fnum), E.mul(zg_ext, fden))

            x_minus_1 = G.sub((xlo, xhi), G.const(1, (m,)))
            l1 = G.mul((zhlo, zhhi), G.inv(G.mul_const(x_minus_1, n)))
            one_c = G.const(1, (1,))
            zm1 = (G.sub(z_ext[0], one_c), z_ext[1])
            c_z1 = (G.mul(l1, zm1[0]), G.mul(l1, zm1[1]))

            zeros = xp.zeros_like(gate[0])
            c_all = E.add((gate, (zeros, zeros)),
                          E.add(E.mul(a1d, c_z1), E.mul(a2d, c_trans)))
            t_lde = (G.mul(c_all[0], (zhilo, zhihi)),
                     G.mul(c_all[1], (zhilo, zhihi)))
            t_re = coset_intt(G, t_lde[0])
            t_im = coset_intt(G, t_lde[1])
            q_lo = xp.stack(
                [t_re[0][k * n:(k + 1) * n, 0] for k in range(nch)] +
                [t_im[0][k * n:(k + 1) * n, 0] for k in range(nch)], axis=1)
            q_hi = xp.stack(
                [t_re[1][k * n:(k + 1) * n, 0] for k in range(nch)] +
                [t_im[1][k * n:(k + 1) * n, 0] for k in range(nch)], axis=1)
            return q_lo, q_hi

        alpha2 = e_mul(alpha, alpha)
        pi_dev = _mat_to_dev(G, pi_vals.reshape(n, 1))
        args = (*const_lde, *wires_lde, *z_lde,
                pi_dev[0].reshape(n), pi_dev[1].reshape(n),
                *self.x_lde, *self.k_dev, *self.zh_inv_lde, *self.zh_lde,
                *_ext_arg(beta), *_ext_arg(gamma), *_ext_arg(alpha),
                *_ext_arg(alpha2))
        return self.jit(("quotient",), run)(*args)

    def open_at(self, oracle: Oracle, pows):
        """Evaluate all columns of an oracle at an ext point given its power
        table (re, im) device pairs."""
        G = self.G

        def run(lo, hi, prl, prh, pil, pih):
            re = G.mul((lo, hi), (prl.reshape(-1, 1), prh.reshape(-1, 1)))
            im = G.mul((lo, hi), (pil.reshape(-1, 1), pih.reshape(-1, 1)))
            return sum_rows(G, re), sum_rows(G, im)

        shape = tuple(oracle.coeffs[0].shape)
        (re, im) = self.jit(("open", shape), run)(*oracle.coeffs, *pows[0],
                                                  *pows[1])
        re64 = _from_dev_u64(G, re)
        im64 = _from_dev_u64(G, im)
        return [(int(a), int(b)) for a, b in zip(re64, im64)]

    def fri_combine(self, all_lde, alphas, y1, y2, zeta, gzeta, z_lde):
        """F(x) = sum_i a_i (p_i - y_i)/(x - zeta) + gz terms, on the LDE."""
        G, E = self.G, self.E
        m = self.m
        ncols = all_lde[0].shape[1]
        a_lo_re = np.array([a[0] & 0xFFFFFFFF for a in alphas], np.uint32)
        a_hi_re = np.array([a[0] >> 32 for a in alphas], np.uint32)
        a_lo_im = np.array([a[1] & 0xFFFFFFFF for a in alphas], np.uint32)
        a_hi_im = np.array([a[1] >> 32 for a in alphas], np.uint32)

        is_jax = self.is_jax

        def run(lo, hi, zlo, zhi, xlo, xhi, alr, ahr, ali, ahi_,
                y1r0, y1r1, y1i0, y1i1, y2r0, y2r1, y2i0, y2i1,
                ze0, ze1, ze2, ze3, gz0, gz1, gz2, gz3):
            def combo(mlo, mhi, base):
                c = mlo.shape[1]
                sl = slice(base, base + c)
                return ext_combo_columns(G, E, is_jax, (mlo, mhi),
                                         (alr[sl], ahr[sl], ali[sl], ahi_[sl]))

            acc1 = combo(lo, hi, 0)
            y1d = ((_scal(G, y1r0), _scal(G, y1r1)), (_scal(G, y1i0), _scal(G, y1i1)))
            acc1 = E.sub(acc1, y1d)
            zeta_d = ((_scal(G, ze0), _scal(G, ze1)), (_scal(G, ze2), _scal(G, ze3)))
            xmz = (G.sub((xlo, xhi), zeta_d[0]),
                   G.neg((G.xp.broadcast_to(zeta_d[1][0], (m,)),
                          G.xp.broadcast_to(zeta_d[1][1], (m,)))))
            F1 = E.mul(acc1, E.inv(xmz))
            acc2 = combo(zlo, zhi, ncols)
            y2d = ((_scal(G, y2r0), _scal(G, y2r1)), (_scal(G, y2i0), _scal(G, y2i1)))
            acc2 = E.sub(acc2, y2d)
            gz_d = ((_scal(G, gz0), _scal(G, gz1)), (_scal(G, gz2), _scal(G, gz3)))
            xmgz = (G.sub((xlo, xhi), gz_d[0]),
                    G.neg((G.xp.broadcast_to(gz_d[1][0], (m,)),
                           G.xp.broadcast_to(gz_d[1][1], (m,)))))
            F2 = E.mul(acc2, E.inv(xmgz))
            return E.add(F1, F2)

        xp = G.xp

        def u32(v):
            return np.uint32(v)

        y1a = (u32(y1[0] & 0xFFFFFFFF), u32(y1[0] >> 32),
               u32(y1[1] & 0xFFFFFFFF), u32(y1[1] >> 32))
        y2a = (u32(y2[0] & 0xFFFFFFFF), u32(y2[0] >> 32),
               u32(y2[1] & 0xFFFFFFFF), u32(y2[1] >> 32))
        return self.jit(("fri_combine", ncols), run)(
            *all_lde, *z_lde, *self.x_lde,
            xp.asarray(a_lo_re), xp.asarray(a_hi_re),
            xp.asarray(a_lo_im), xp.asarray(a_hi_im),
            *y1a, *y2a, *_ext_arg(zeta), *_ext_arg(gzeta))

    def fri_fold(self, values_ext, beta, inv2x_dev):
        G, E = self.G, self.E
        h = int(values_ext[0][0].shape[0]) // 2

        def run(rl, rh, il, ih, xl, xh, b0, b1, b2, b3):
            cur = ((rl, rh), (il, ih))
            v0 = ((cur[0][0][:h], cur[0][1][:h]), (cur[1][0][:h], cur[1][1][:h]))
            v1 = ((cur[0][0][h:], cur[0][1][h:]), (cur[1][0][h:], cur[1][1][h:]))
            s = E.add(v0, v1)
            d = E.sub(v0, v1)
            half = G.const(_HALF, (1,))
            beta_d = ((_scal(G, b0), _scal(G, b1)), (_scal(G, b2), _scal(G, b3)))
            return E.add(E.mul_base(s, half),
                         E.mul(beta_d, E.mul_base(d, (xl, xh))))

        return self.jit(("fri_fold", h), run)(
            *values_ext[0], *values_ext[1], *inv2x_dev, *_ext_arg(beta))

    def grind(self, challenger, pow_bits: int, batch: int = 1 << 17) -> int:
        """Proof-of-work grinding as ONE batched device Poseidon sweep
        (the host-numpy fallback in fri.grind takes tens of seconds)."""
        if not self.is_jax:
            return grind(challenger, pow_bits)
        from ..field.poseidon import RATE, WIDTH
        G, H = self.G, self.H
        xp = G.xp
        # prepare the duplexed state with the pending input buffer applied;
        # only the nonce lane (index k-1) varies per candidate
        state = list(challenger.state)
        for i, v in enumerate(challenger.input_buf):
            state[i] = v
        k = len(challenger.input_buf) + 1
        assert k <= RATE
        bound_hi = np.uint32(1 << (32 - pow_bits)) if pow_bits <= 32 else None
        assert bound_hi is not None, "pow_bits > 32 unsupported"

        def run(slo, shi, start):
            nonces = start + xp.arange(batch, dtype=xp.uint32)
            st_lo = xp.broadcast_to(slo.reshape(WIDTH, 1), (WIDTH, batch))
            st_hi = xp.broadcast_to(shi.reshape(WIDTH, 1), (WIDTH, batch))
            st_lo = st_lo.at[k - 1].set(nonces)
            st_hi = st_hi.at[k - 1].set(xp.zeros(batch, xp.uint32))
            out = H.permute((st_lo, st_hi))
            ok = out[1][RATE - 1] < bound_hi
            idx = xp.argmax(ok)
            return ok[idx], nonces[idx]

        s64 = np.array(state, dtype=np.uint64)
        slo = xp.asarray((s64 & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        shi = xp.asarray((s64 >> np.uint64(32)).astype(np.uint32))
        jrun = self.jit(("grind", batch, k, pow_bits), run)
        start = 0
        while True:
            found, nonce = jrun(slo, shi, np.uint32(start))
            if bool(found):
                return int(nonce)
            start += batch
            assert start < (1 << 32), "grinding exhausted 32-bit nonces"

    def fri_commit_layer(self, values_ext):
        G = self.G
        cap_height = self.config.cap_height
        m = int(values_ext[0][0].shape[0])
        h = m // 2
        xp = G.xp

        def run(rl, rh, il, ih):
            lo = xp.stack([rl[:h], il[:h], rl[h:], il[h:]], axis=1)
            hi = xp.stack([rh[:h], ih[:h], rh[h:], ih[h:]], axis=1)
            return lo, hi

        leaf = self.jit(("fri_leafmat", m), run)(*values_ext[0], *values_ext[1])
        levels = self.merkle_levels(leaf)
        tree = MerkleTree(G, leaf[0], leaf[1], levels,
                          min(cap_height, h.bit_length() - 1))
        return tree


def prove(pk: ProvingKey, external_values: np.ndarray,
          check_constraints: bool = False, timer=None) -> Proof:
    from ..utils.timing import PhaseTimer
    timer = timer or PhaseTimer(enabled=False)
    G, E, H = pk.G, pk.E, pk.H
    cc = pk.compiled
    cfg = pk.config
    n, m = pk.n, pk.m
    W = len(cc.k_shifts)

    # ---- phase 0: witness fill (host, batched limbs) -----------------------
    with timer.phase("witness_fill"):
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
    with timer.phase("wire_commit"):
        wires_dev = _mat_to_dev(G, wires_u64)
        wires_oracle = pk.commit(wires_dev)
    challenger.observe_cap(wires_oracle.tree.cap_u64())
    beta = challenger.get_ext_challenge()
    gamma = challenger.get_ext_challenge()

    # ---- phase 2: permutation grand product Z ------------------------------
    with timer.phase("permutation_z"):
        z_mat = pk.z_phase(wires_dev, beta, gamma)
        z_oracle = pk.commit(z_mat)
    challenger.observe_cap(z_oracle.tree.cap_u64())
    alpha = challenger.get_ext_challenge()

    # ---- phase 3: quotient ---------------------------------------------------
    pi_vals = np.zeros(n, dtype=np.uint64)
    for j, pv in enumerate(pub_values):
        pi_vals[j] = (P - pv) % P
    with timer.phase("quotient"):
        q_cols = pk.quotient_phase(wires_oracle.lde, z_oracle.lde, pi_vals,
                                   beta, gamma, alpha)
        quotient_oracle = pk.commit(q_cols, from_coeffs=True)
    challenger.observe_cap(quotient_oracle.tree.cap_u64())
    zeta = challenger.get_ext_challenge()

    # ---- phase 4: openings at zeta (and g*zeta for Z) ------------------------
    timer_openings = timer.phase("openings")
    timer_openings.__enter__()
    zpow = ext_powers_u64(zeta, n)
    zpows = (_to_dev(G, zpow[0]), _to_dev(G, zpow[1]))
    gzeta = e_mul((pk.omega, 0), zeta)
    gzpow = ext_powers_u64(gzeta, n)
    gzpows = (_to_dev(G, gzpow[0]), _to_dev(G, gzpow[1]))

    open_const = pk.open_at(pk.constants_oracle, zpows)
    open_wires = pk.open_at(wires_oracle, zpows)
    open_z = pk.open_at(z_oracle, zpows)
    open_z_next = pk.open_at(z_oracle, gzpows)
    open_quot = pk.open_at(quotient_oracle, zpows)
    openings = Openings(open_const, open_wires, open_z, open_z_next, open_quot)
    for (a, b) in openings.ordered():
        challenger.observe(a)
        challenger.observe(b)
    fri_alpha = challenger.get_ext_challenge()
    timer_openings.__exit__(None, None, None)

    # ---- phase 5: FRI ---------------------------------------------------------
    timer_fri = timer.phase("fri")
    timer_fri.__enter__()
    xp = G.xp
    oracles = [pk.constants_oracle, wires_oracle, z_oracle, quotient_oracle]
    all_lde = (xp.concatenate([o.lde[0] for o in oracles], axis=1),
               xp.concatenate([o.lde[1] for o in oracles], axis=1))
    ncols = all_lde[0].shape[1]
    ys = openings.constants_sigmas + openings.wires + openings.z + openings.quotient
    alphas = [e_pow(fri_alpha, i) for i in range(ncols + 2)]
    y1 = (0, 0)
    for yv, a in zip(ys, alphas[:ncols]):
        y1 = e_add(y1, e_mul(yv, a))
    y2 = (0, 0)
    for yv, a in zip(openings.z_next, alphas[ncols:]):
        y2 = e_add(y2, e_mul(yv, a))
    F = pk.fri_combine(all_lde, alphas, y1, y2, zeta, gzeta, z_oracle.lde)

    fri_trees = []
    cur = F
    cur_shift = _gl.MULTIPLICATIVE_GENERATOR
    size = m
    while size > cfg.final_poly_domain:
        h = size // 2
        tree = pk.fri_commit_layer(cur)
        challenger.observe_cap(tree.cap_u64())
        fbeta = challenger.get_ext_challenge()
        w_inv = _gl.s_inv(_gl.root_of_unity(size.bit_length() - 1))
        inv2x = _mul_u64(powers_u64(w_inv, h), _gl.s_inv((2 * cur_shift) % P))
        cur = pk.fri_fold(cur, fbeta, _to_dev(G, inv2x))
        fri_trees.append(tree)
        cur_shift = (cur_shift * cur_shift) % P
        size = h
    re = coset_intt(G, cur[0], shift=cur_shift)
    im = coset_intt(G, cur[1], shift=cur_shift)
    re64 = np.asarray(G.to_u64((re[0].reshape(-1), re[1].reshape(-1))))
    im64 = np.asarray(G.to_u64((im[0].reshape(-1), im[1].reshape(-1))))
    final_coeffs = [(int(a), int(b)) for a, b in zip(re64, im64)]
    for c0, c1 in final_coeffs:
        challenger.observe(c0)
        challenger.observe(c1)

    timer_fri.__exit__(None, None, None)
    with timer.phase("pow_grind"):
        pow_witness = pk.grind(challenger, cfg.pow_bits)
    challenger.observe(pow_witness)
    pow_challenge = challenger.get_challenge()
    assert pow_challenge < (1 << (64 - cfg.pow_bits))
    indices = challenger.get_indices(cfg.num_queries, m)

    # ---- phase 6: query rounds (batched gathers: O(oracles + layers)
    # device->host transfers, not O(queries * levels) — critical when the
    # chip sits behind a network tunnel) ----------------------------------------
    timer_q = timer.phase("queries")
    timer_q.__enter__()
    oracle_rows = [o.tree.rows_u64(indices) for o in oracles]
    oracle_paths = [o.tree.paths_for(indices) for o in oracles]
    layer_indices = []
    cur_idx = list(indices)
    for tree in fri_trees:
        h = tree.num_leaves
        cur_idx = [i % h for i in cur_idx]
        layer_indices.append(list(cur_idx))
    layer_rows = [t.rows_u64(ix) for t, ix in zip(fri_trees, layer_indices)]
    layer_paths = [t.paths_for(ix) for t, ix in zip(fri_trees, layer_indices)]
    queries = []
    for qi in range(len(indices)):
        initial = [OracleOpening(
            row=[int(v) for v in oracle_rows[oi][qi]],
            path=[tuple(int(x) for x in d) for d in oracle_paths[oi][qi]])
            for oi in range(len(oracles))]
        steps = []
        for li in range(len(fri_trees)):
            row = layer_rows[li][qi]
            pair = ((int(row[0]), int(row[1])), (int(row[2]), int(row[3])))
            steps.append(FriStep(
                pair=pair,
                path=[tuple(int(x) for x in d) for d in layer_paths[li][qi]]))
        queries.append(QueryRound(initial=initial, steps=steps))

    timer_q.__exit__(None, None, None)

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
