"""Circuit compiler: CircuitBuilder -> static prover plan (numpy arrays).

The reference rebuilds its circuit inside every CLI command and runs a
dynamic generator fixpoint during proving (prove_action.rs:18-19, :91-97).
Here compilation happens once and produces only statically-shaped arrays:

  * selectors   (NUM_SELECTORS, n) u64   - qM, q0..q5, qC column values
  * wire_vars   (NUM_WIRES, n)   int64   - variable id per wire slot
  * sigma       (NUM_WIRES, n)   u64     - permutation polynomial values
  * generator program: ops grouped into (level, opcode) batches, executed
    as vectorized numpy limb math (field/gl.py with xp=numpy)

so the prover itself is pure array code that jits cleanly.

Sigma construction: wire slot s = col*n + row carries identity value
k_col * omega^row; slots sharing a variable form one cycle and sigma maps
each slot to the identity value of the next slot in its cycle — the
standard PLONK permutation argument, built vectorized with one argsort.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..field import gl as _gl
from ..field.gl import P, make_gl
from .builder import (CircuitBuilder, GEN_EXTERNAL, GEN_CONST, GEN_ADD,
                      GEN_SUB, GEN_MUL, GEN_MULADDC, GEN_INV, GEN_BIT,
                      GEN_HINT_OUT, Hint,
                      NUM_WIRES, NUM_SELECTORS, SEL_QM, SEL_Q0, SEL_QC)

_GNP = make_gl(np)

MIN_ROWS = 16


def powers_u64(base: int, n: int) -> np.ndarray:
    """[1, base, base^2, ..., base^(n-1)] mod p as numpy uint64, via
    vectorized log-doubling on 32-bit limbs."""
    out_lo = np.array([1], dtype=np.uint32)
    out_hi = np.array([0], dtype=np.uint32)
    cur = base % P
    while out_lo.shape[0] < n:
        k = out_lo.shape[0]
        c = _GNP.const(cur, (k,))
        nlo, nhi = _GNP.mul((out_lo, out_hi), c)
        out_lo = np.concatenate([out_lo, nlo])
        out_hi = np.concatenate([out_hi, nhi])
        cur = (cur * cur) % P
    v = _GNP.to_u64((out_lo[:n], out_hi[:n]))
    return v


@dataclass
class GenBatch:
    op: int
    out: np.ndarray   # int64 var ids
    a: np.ndarray
    b: np.ndarray
    const: np.ndarray  # uint64 field constants (or bit positions)


@dataclass
class CompiledCircuit:
    n: int                      # number of rows (power of two)
    log_n: int
    num_vars: int
    selectors: np.ndarray       # (NUM_SELECTORS, n) uint64
    wire_vars: np.ndarray       # (NUM_WIRES, n) int64
    sigma: np.ndarray           # (NUM_WIRES, n) uint64  (sigma poly values)
    k_shifts: Tuple[int, ...]   # coset shifts k_0..k_{W-1}
    gen_batches: List[GenBatch]
    hints: List[Hint]
    external_vars: np.ndarray   # int64, in creation order
    public_input_vars: np.ndarray  # int64
    num_public_inputs: int

    # ---- witness generation (host, batched numpy limbs) -------------------

    def generate_witness(self, external_values: np.ndarray) -> np.ndarray:
        """Fill all variable values from external (ACIR) witness values.

        external_values: uint64 array aligned with external_vars order.
        Returns vals: uint64 array of length num_vars.
        """
        lo = np.zeros(self.num_vars, dtype=np.uint32)
        hi = np.zeros(self.num_vars, dtype=np.uint32)
        ext = np.asarray(external_values, dtype=np.uint64)
        assert ext.shape[0] == self.external_vars.shape[0], \
            f"need {self.external_vars.shape[0]} external values, got {ext.shape[0]}"
        lo[self.external_vars] = (ext & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi[self.external_vars] = (ext >> np.uint64(32)).astype(np.uint32)
        G = _GNP
        for bt in self.gen_batches:
            av = (lo[bt.a], hi[bt.a])
            if bt.op == GEN_CONST:
                r = (
                    (bt.const & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                    (bt.const >> np.uint64(32)).astype(np.uint32),
                )
            elif bt.op == GEN_ADD:
                r = G.add(av, (lo[bt.b], hi[bt.b]))
            elif bt.op == GEN_SUB:
                r = G.sub(av, (lo[bt.b], hi[bt.b]))
            elif bt.op == GEN_MUL:
                r = G.mul(av, (lo[bt.b], hi[bt.b]))
            elif bt.op == GEN_MULADDC:
                c = ((bt.const & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                     (bt.const >> np.uint64(32)).astype(np.uint32))
                r = G.add(G.mul(av, c), (lo[bt.b], hi[bt.b]))
            elif bt.op == GEN_INV:
                # 0 -> 0 so is_zero hints work; nonzero -> true inverse
                inv = G.inv(av)
                z = G.is_zero(av)
                r = (np.where(z, np.uint32(0), inv[0]),
                     np.where(z, np.uint32(0), inv[1]))
            elif bt.op == GEN_BIT:
                v64 = G.to_u64(av)
                bit = (v64 >> bt.const) & np.uint64(1)
                r = (bit.astype(np.uint32), np.zeros_like(bit, dtype=np.uint32))
            elif bt.op == GEN_HINT_OUT:
                # run each distinct hint once, scatter all its outputs
                out_lo = np.zeros(bt.out.shape[0], dtype=np.uint32)
                out_hi = np.zeros(bt.out.shape[0], dtype=np.uint32)
                done = {}
                for pos in range(bt.out.shape[0]):
                    hid = int(bt.a[pos])
                    j = int(bt.const[pos])
                    if hid not in done:
                        h = self.hints[hid]
                        ivals = [int(G.to_u64((lo[i], hi[i]))) for i in h.inputs]
                        done[hid] = [v % P for v in h.fn(ivals)]
                    v = done[hid][j]
                    out_lo[pos] = v & 0xFFFFFFFF
                    out_hi[pos] = v >> 32
                r = (out_lo, out_hi)
            else:
                raise AssertionError(f"bad generator opcode {bt.op}")
            lo[bt.out] = r[0]
            hi[bt.out] = r[1]
        return G.to_u64((lo, hi))

    def wire_values(self, vals: np.ndarray) -> np.ndarray:
        """(NUM_WIRES, n) uint64 wire matrix from the variable value vector."""
        return vals[self.wire_vars]

    # ---- debugging ---------------------------------------------------------

    def check_constraints(self, vals: np.ndarray) -> Optional[int]:
        """Return the first violated row index, or None if satisfied
        (including PI rows against registered public input values)."""
        w = self.wire_values(vals).astype(object)
        s = self.selectors.astype(object)
        acc = (s[SEL_QM] * w[0] % P) * w[1] % P
        for i in range(NUM_WIRES):
            acc = (acc + s[SEL_Q0 + i] * w[i]) % P
        acc = (acc + s[SEL_QC]) % P
        # PI rows: row j (j < num_pubs) subtracts pub value j
        for j, pv in enumerate(self.public_input_vars):
            acc[j] = (acc[j] - int(vals[pv])) % P
        bad = np.nonzero(acc != 0)[0]
        return int(bad[0]) if bad.size else None

    def public_values(self, vals: np.ndarray) -> List[int]:
        return [int(vals[v]) for v in self.public_input_vars]


def _schedule_generators(builder: CircuitBuilder) -> List[GenBatch]:
    """Topological level scheduling + per-(level, op) batching."""
    ops = builder.gen_ops
    level = np.zeros(builder.num_vars, dtype=np.int64)
    uses_a = {GEN_ADD, GEN_SUB, GEN_MUL, GEN_MULADDC, GEN_INV, GEN_BIT}
    uses_b = {GEN_ADD, GEN_SUB, GEN_MUL, GEN_MULADDC}
    # ops are appended in creation order but inputs may be created later
    # (e.g. constants materialized lazily), so iterate to a fixpoint.
    changed = True
    guard = 0
    while changed:
        changed = False
        guard += 1
        assert guard <= len(ops) + 2, "generator dependency cycle"
        for op in ops:
            lv = 0
            if op.op in uses_a:
                lv = max(lv, level[op.a] + 1)
            if op.op in uses_b:
                lv = max(lv, level[op.b] + 1)
            if op.op == GEN_HINT_OUT:
                h = builder.hints[op.a]
                for i in h.inputs:
                    lv = max(lv, level[i] + 1)
            if op.op in (GEN_CONST, GEN_EXTERNAL):
                lv = 0
            if lv != level[op.out]:
                level[op.out] = lv
                changed = True
    keyed = {}
    for op in ops:
        if op.op == GEN_EXTERNAL:
            continue
        keyed.setdefault((int(level[op.out]), op.op), []).append(op)
    batches = []
    for (lv, opc) in sorted(keyed):
        group = keyed[(lv, opc)]
        batches.append(GenBatch(
            op=opc,
            out=np.array([o.out for o in group], dtype=np.int64),
            a=np.array([o.a for o in group], dtype=np.int64),
            b=np.array([o.b for o in group], dtype=np.int64),
            const=np.array([o.const % (1 << 64) for o in group], dtype=np.uint64),
        ))
    return batches


def compile_circuit(builder: CircuitBuilder) -> CompiledCircuit:
    num_pub = len(builder.public_inputs)
    num_gate_rows = len(builder.rows)
    total = num_pub + num_gate_rows
    n = max(MIN_ROWS, 1 << (total - 1).bit_length())
    log_n = n.bit_length() - 1

    selectors = np.zeros((NUM_SELECTORS, n), dtype=np.uint64)
    wire_vars = np.zeros((NUM_WIRES, n), dtype=np.int64)  # 0 = zero var

    # PI rows first: q0 = 1, w0 = pub var; PI(x) supplies -pub_j at row j.
    for j, pv in enumerate(builder.public_inputs):
        selectors[SEL_Q0, j] = 1
        wire_vars[0, j] = pv
    for r, row in enumerate(builder.rows):
        i = num_pub + r
        selectors[SEL_QM, i] = row.qm
        for k in range(NUM_WIRES):
            selectors[SEL_Q0 + k, i] = row.q[k]
            if row.wires[k] is not None:
                wire_vars[k, i] = row.wires[k]
        selectors[SEL_QC, i] = row.qc

    # -- sigma ---------------------------------------------------------------
    # identity values: id[col*n + row] = k_col * omega^row
    omega_pows = powers_u64(_gl.root_of_unity(log_n), n)
    g = _gl.MULTIPLICATIVE_GENERATOR
    k_shifts = tuple(pow(g, i, P) for i in range(NUM_WIRES))
    ids = np.empty((NUM_WIRES, n), dtype=np.uint64)
    for col, k in enumerate(k_shifts):
        klo, khi = _GNP.const(k, (n,))
        plo = (omega_pows & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        phi = (omega_pows >> np.uint64(32)).astype(np.uint32)
        ids[col] = _GNP.to_u64(_GNP.mul((klo, khi), (plo, phi)))

    flat_vars = wire_vars.reshape(-1)  # slot s = col*n + row
    order = np.argsort(flat_vars, kind="stable")
    sorted_vars = flat_vars[order]
    # next-in-group cyclic permutation
    boundaries = np.nonzero(np.diff(sorted_vars))[0] + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [flat_vars.size]])
    nxt = np.arange(1, flat_vars.size + 1)
    nxt[ends - 1] = starts  # wrap each group
    perm = np.empty(flat_vars.size, dtype=np.int64)
    perm[order] = order[nxt]
    sigma = ids.reshape(-1)[perm].reshape(NUM_WIRES, n)

    external_vars = np.array(
        [op.out for op in builder.gen_ops if op.op == GEN_EXTERNAL],
        dtype=np.int64)

    return CompiledCircuit(
        n=n, log_n=log_n, num_vars=builder.num_vars,
        selectors=selectors, wire_vars=wire_vars, sigma=sigma,
        k_shifts=k_shifts, gen_batches=_schedule_generators(builder),
        hints=list(builder.hints),
        external_vars=external_vars,
        public_input_vars=np.array(builder.public_inputs, dtype=np.int64),
        num_public_inputs=num_pub,
    )
