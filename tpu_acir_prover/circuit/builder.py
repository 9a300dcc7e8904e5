"""PLONK-style circuit builder: the framework's gate/wire/generator front end.

Role: the TPU-native replacement for BOTH the reference's translator target
API (plonky2's CircuitBuilder used at /root/reference/plonky2-backend/src/
circuit_translation/mod.rs:61-330) and the reference fork's gate zoo.  The
reference lowers ACIR onto ~22 specialized gate types with per-gate
constraint polynomials; here everything lowers onto ONE universal arithmetic
gate so the whole quotient evaluation is a single fused elementwise
expression over the LDE — the shape XLA/Pallas tile best (docs/DESIGN.md).

Gate (W = NUM_WIRES routed wires per row, selectors qM, q0..q{W-1}, qC):

    qM*w0*w1 + sum_i qi*wi + qC + PI(x) = 0

Copy constraints are implicit: wire slots referencing the same variable id
end up in one permutation cycle (sigma built at compile time).

Witness generation: every derived variable carries one generator op; the
compiler schedules ops into topological levels and executes each level as a
batched numpy limb operation — the static-scheduling answer to plonky2's
runtime SimpleGenerator fixpoint (SURVEY.md §7 hard part 3; reference runs
generators inside circuit_data.prove, prove_action.rs:91-97).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

from ..field.gl import P

NUM_WIRES = 6
NUM_SELECTORS = NUM_WIRES + 2  # qM, q0..q5, qC
SEL_QM = 0
SEL_Q0 = 1  # q_i = SEL_Q0 + i
SEL_QC = NUM_SELECTORS - 1

# Generator opcodes (see compile.py for the batched executor).
GEN_EXTERNAL = 0  # value supplied at prove time (ACIR witness)
GEN_CONST = 1     # out = const
GEN_ADD = 2       # out = v[a] + v[b]
GEN_SUB = 3       # out = v[a] - v[b]
GEN_MUL = 4       # out = v[a] * v[b]
GEN_MULADDC = 5   # out = v[a] * const + v[b]
GEN_INV = 6       # out = v[a]^-1  (0 -> 0, like plonky2's inverse generator)
GEN_BIT = 7       # out = (v[a] >> const) & 1
GEN_HINT_OUT = 8  # out = hint[a].fn(inputs)[const]  (custom host generator)


@dataclass
class GenOp:
    op: int
    out: int
    a: int = 0
    b: int = 0
    const: int = 0


@dataclass
class Hint:
    """Custom host-side witness generator: python ints in, python ints out.
    The analog of plonky2's SimpleGenerator (e.g. BigUintDivRemGenerator,
    biguint.rs:316-360) — compute a hint, then constrain it algebraically."""
    inputs: Tuple[int, ...]
    outputs: Tuple[int, ...]
    fn: object  # Callable[[List[int]], List[int]]


@dataclass
class GateRow:
    wires: Tuple[Optional[int], ...]  # var ids, None = unused (zero var)
    qm: int = 0
    q: Tuple[int, ...] = (0,) * NUM_WIRES
    qc: int = 0


class CircuitBuilder:
    """Accumulates gate rows, variables, generators and public inputs."""

    def __init__(self):
        self.rows: List[GateRow] = []
        self.gen_ops: List[GenOp] = []
        self.hints: List[Hint] = []
        self.num_vars = 0
        self._const_cache: Dict[int, int] = {}
        self.public_inputs: List[int] = []
        # var 0 is the always-zero constant (unused wire slots point here)
        self.zero = self.constant(0)
        assert self.zero == 0
        self.one = self.constant(1)

    # -- variables -------------------------------------------------------

    def _new_var(self) -> int:
        v = self.num_vars
        self.num_vars += 1
        return v

    def add_external(self) -> int:
        """A variable whose value is fed in at prove time (ACIR witness)."""
        v = self._new_var()
        self.gen_ops.append(GenOp(GEN_EXTERNAL, v))
        return v

    def hint(self, inputs: Sequence[int], num_outputs: int, fn) -> List[int]:
        """Create num_outputs variables computed by fn(input_values) at
        witness-generation time.  UNCONSTRAINED — caller must add the
        algebraic check (the hint+check pattern, SURVEY.md C19/C21)."""
        outs = [self._new_var() for _ in range(num_outputs)]
        hid = len(self.hints)
        self.hints.append(Hint(tuple(inputs), tuple(outs), fn))
        for j, o in enumerate(outs):
            self.gen_ops.append(GenOp(GEN_HINT_OUT, o, a=hid, const=j))
        return outs

    def constant(self, value: int) -> int:
        value %= P
        if value in self._const_cache:
            return self._const_cache[value]
        v = self._new_var()
        self.gen_ops.append(GenOp(GEN_CONST, v, const=value))
        # constrain: value - w0 = 0  -> q0=-1, qC=value
        self.gate([v], q=[-1], qc=value)
        self._const_cache[value] = v
        return v

    # -- raw gate --------------------------------------------------------

    def gate(self, wires: Sequence[Optional[int]], qm: int = 0,
             q: Sequence[int] = (), qc: int = 0):
        w = list(wires) + [None] * (NUM_WIRES - len(wires))
        qs = [int(x) % P for x in q] + [0] * (NUM_WIRES - len(q))
        self.rows.append(GateRow(tuple(w), int(qm) % P, tuple(qs), int(qc) % P))

    # -- public inputs -----------------------------------------------------

    def register_public_input(self, var: int):
        """Expose `var` as a public input (analog of reference
        register_public_input, circuit_translation/mod.rs:305-310).  The
        compiler emits one PI row per entry; verifier binds via PI(x)."""
        self.public_inputs.append(var)

    # -- arithmetic gadgets ------------------------------------------------

    def add(self, a: int, b: int) -> int:
        out = self._new_var()
        self.gen_ops.append(GenOp(GEN_ADD, out, a, b))
        self.gate([a, b, out], q=[1, 1, -1])
        return out

    def sub(self, a: int, b: int) -> int:
        out = self._new_var()
        self.gen_ops.append(GenOp(GEN_SUB, out, a, b))
        self.gate([a, b, out], q=[1, -1, -1])
        return out

    def mul(self, a: int, b: int) -> int:
        out = self._new_var()
        self.gen_ops.append(GenOp(GEN_MUL, out, a, b))
        self.gate([a, b, out], qm=1, q=[0, 0, -1])
        return out

    def mul_const(self, a: int, c: int) -> int:
        c %= P
        out = self._new_var()
        self.gen_ops.append(GenOp(GEN_MULADDC, out, a, self.zero, c))
        self.gate([a, out], q=[c, -1])
        return out

    def add_const(self, a: int, c: int) -> int:
        c %= P
        out = self._new_var()
        self.gen_ops.append(GenOp(GEN_MULADDC, out, a, self.constant(c), 1))
        self.gate([a, out], q=[1, -1], qc=c)
        return out

    def mul_add(self, a: int, b: int, c: int) -> int:
        """out = a*b + c in one row."""
        out = self._new_var()
        t = self._new_var()
        # generators: t = a*b ; out = t + c  (single row constrains directly)
        self.gen_ops.append(GenOp(GEN_MUL, t, a, b))
        self.gen_ops.append(GenOp(GEN_ADD, out, t, c))
        self.gate([a, b, c, out], qm=1, q=[0, 0, 1, -1])
        return out

    def lincomb(self, terms: Sequence[Tuple[int, int]], const: int = 0) -> int:
        """out = sum(c_i * v_i) + const, chained 4 terms per row.

        Analog of the reference's AssertZero linear accumulation
        (assert_zero_translator.rs:62-88), but width-6 rows take 4 terms
        plus a running accumulator each.
        """
        const %= P
        terms = [(c % P, v) for c, v in terms if c % P != 0]
        if not terms:
            return self.constant(const)
        acc = None
        i = 0
        while i < len(terms):
            chunk = terms[i:i + 5] if acc is None else terms[i:i + 4]
            qc = const if i == 0 else 0
            out = self._new_var()
            # generator chain
            if acc is None:
                cur = self.zero if qc == 0 else self.constant(qc)
            else:
                cur = acc
            for j, (c, v) in enumerate(chunk):
                nv = out if j == len(chunk) - 1 else self._new_var()
                self.gen_ops.append(GenOp(GEN_MULADDC, nv, v, cur, c))
                cur = nv
            # constraint row
            wires = [v for _, v in chunk]
            qs = [c for c, _ in chunk]
            if acc is not None:
                wires.append(acc)
                qs.append(1)
            wires.append(out)
            qs.append(-1)
            self.gate(wires, q=qs, qc=qc)
            acc = out
            i += len(chunk)
        return acc

    def assert_zero_lincomb(self, mul_terms: Sequence[Tuple[int, int, int]],
                            terms: Sequence[Tuple[int, int]], const: int = 0):
        """Constrain sum(c*wl*wr) + sum(c*v) + const == 0 (full ACIR
        Expression shape, assert_zero_translator.rs:25-38)."""
        lin = list(terms)
        for c, wl, wr in mul_terms:
            lin.append((c, self.mul(wl, wr)))
        acc = self.lincomb(lin, const)
        self.assert_zero(acc)

    def assert_zero(self, a: int):
        self.gate([a], q=[1])

    def assert_equal(self, a: int, b: int):
        self.gate([a, b], q=[1, -1])

    def assert_const(self, a: int, c: int):
        self.gate([a], q=[1], qc=-c)

    # -- boolean / bit gadgets ----------------------------------------------

    def assert_bool(self, b: int):
        """b^2 - b = 0."""
        self.gate([b, b], qm=1, q=[-1])

    def select(self, bit: int, a: int, b: int) -> int:
        """bit ? a : b  == b + bit*(a-b); bit must be constrained boolean."""
        d = self.sub(a, b)
        out = self._new_var()
        t = self._new_var()
        self.gen_ops.append(GenOp(GEN_MUL, t, bit, d))
        self.gen_ops.append(GenOp(GEN_ADD, out, t, b))
        self.gate([bit, d, b, out], qm=1, q=[0, 0, 1, -1])
        return out

    def split_le(self, a: int, n_bits: int) -> List[int]:
        """Decompose a into n_bits boolean vars (LSB first) and constrain the
        recombination (analog of reference convert_number_to_binary_number,
        circuit_translation/mod.rs:262-271)."""
        bits = []
        for k in range(n_bits):
            b = self._new_var()
            self.gen_ops.append(GenOp(GEN_BIT, b, a, const=k))
            self.assert_bool(b)
            bits.append(b)
        acc = self.le_sum_vars(bits)
        self.assert_equal(acc, a)
        return bits

    def le_sum_vars(self, bits: Sequence[int]) -> int:
        """Recombine LSB-first boolean vars into a field element
        (analog of builder.le_sum, mod.rs:273-279)."""
        return self.lincomb([(1 << k, b) for k, b in enumerate(bits)])

    def range_check(self, a: int, n_bits: int):
        self.split_le(a, n_bits)

    # bitwise ops on single bits
    def bit_and(self, x: int, y: int) -> int:
        return self.mul(x, y)

    def bit_xor(self, x: int, y: int) -> int:
        """x + y - 2xy in one row."""
        out = self._new_var()
        t = self._new_var()
        self.gen_ops.append(GenOp(GEN_MUL, t, x, y))
        v = self._new_var()
        self.gen_ops.append(GenOp(GEN_MULADDC, v, t, x, P - 2))
        self.gen_ops.append(GenOp(GEN_ADD, out, v, y))
        self.gate([x, y, out], qm=P - 2, q=[1, 1, -1])
        return out

    def bit_or(self, x: int, y: int) -> int:
        """x + y - xy in one row."""
        out = self._new_var()
        t = self._new_var()
        self.gen_ops.append(GenOp(GEN_MUL, t, x, y))
        v = self._new_var()
        self.gen_ops.append(GenOp(GEN_MULADDC, v, t, x, P - 1))
        self.gen_ops.append(GenOp(GEN_ADD, out, v, y))
        self.gate([x, y, out], qm=P - 1, q=[1, 1, -1])
        return out

    def bit_not(self, x: int) -> int:
        out = self._new_var()
        self.gen_ops.append(GenOp(GEN_SUB, out, self.one, x))
        self.gate([x, out], q=[1, 1], qc=-1)
        return out

    # -- division / inverse --------------------------------------------------

    def inverse(self, a: int) -> int:
        """out = 1/a with the hint+check pattern (reference nonnative inv,
        SURVEY.md C21): generator computes the inverse, circuit checks
        a*out == 1 (so a=0 makes the circuit unsatisfiable)."""
        out = self._new_var()
        self.gen_ops.append(GenOp(GEN_INV, out, a))
        self.gate([a, out], qm=1, qc=-1)
        return out

    def div(self, a: int, b: int) -> int:
        return self.mul(a, self.inverse(b))

    def is_zero(self, a: int) -> int:
        """Boolean out: out = 1 iff a == 0.  Hint z ~ a^-1; constraints
        out = 1 - a*z and a*out = 0 (plonky2-style is_equal/is_zero)."""
        z = self._new_var()
        self.gen_ops.append(GenOp(GEN_INV, z, a))
        out = self._new_var()
        t = self._new_var()
        self.gen_ops.append(GenOp(GEN_MUL, t, a, z))
        self.gen_ops.append(GenOp(GEN_SUB, out, self.one, t))
        # a*z + out - 1 = 0
        self.gate([a, z, out], qm=1, q=[0, 0, 1], qc=-1)
        # a*out = 0
        self.gate([a, out], qm=1)
        return out

    def is_equal(self, a: int, b: int) -> int:
        """Analog of the fork-added is_equal used by the memory translator
        (memory_translator.rs:96-111)."""
        return self.is_zero(self.sub(a, b))
