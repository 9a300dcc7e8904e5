"""Integrated multi-chip prover: the full prove() pipeline SPMD over a mesh.

The reference's scaling story is rayon threads across FFT/Merkle/quotient
inside its Rust fork (SURVEY.md §2.4); the TPU-native equivalent runs every
prover phase as one SPMD XLA program over a jax Mesh, with the trace-row /
evaluation-domain axis sharded across chips ("sp", the prover's true
scaling axis — SURVEY.md §5 "trace-length scaling").

Design: *computation follows data*.  `ShardedProvingKey` is a ProvingKey
whose `place()` hook lays every domain-axis tensor (preprocessed oracle,
sigma, domain tables, the wires matrix, power tables) out with a
`NamedSharding` that shards axis 0 over the mesh.  The UNMODIFIED phase
programs (prove.round2_body / quotient_body / open_body / fri bodies /
Merkle levels) then jit-compile into partitioned programs: elementwise work
stays chip-local, and XLA inserts the collectives demanded by the data
movement (NTT stage exchanges, the Z prefix-product's log-shift chain as
ppermutes, Merkle/opening reductions, boundary rolls) — exactly the
mesh-annotation recipe of the scaling playbook.  The Fiat-Shamir transcript
runs on the host between phases, identical to the single-chip prover, so a
sharded prove is byte-identical to a single-chip prove by construction
(asserted in tests/test_sharded_prove.py).

The hand-scheduled shard_map kernels (parallel/mesh.py four-step NTT,
parallel/pipeline.py commit, parallel/fri.py fold) remain the optimized
forms of the same dataflow with explicitly placed ICI collectives
(all_to_all / ppermute / all_gather), each tested bit-exact against the
single-chip kernels; this module is the integration layer that makes the
*entire* prover multi-chip.
"""

from __future__ import annotations

import numpy as np

from ..circuit.compile import CompiledCircuit
from ..prover.config import ProofConfig, STANDARD_CONFIG
from ..prover.prove import ProvingKey, prove


class ShardedProvingKey(ProvingKey):
    """ProvingKey whose device tensors are sharded over a mesh axis.

    Every (n,)/(m,)/(n, C)/(m, C) tensor has axis 0 (the domain axis)
    sharded over `axis`; everything else is replicated.  Phase jits compile
    per input sharding, so the same ProvingKey API yields an SPMD prover.
    """

    def __init__(self, compiled: CompiledCircuit,
                 config: ProofConfig = STANDARD_CONFIG, mesh=None,
                 axis: str = "sp"):
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        if mesh is None:
            mesh = Mesh(np.array(jax.devices()), ("sp",))
            axis = "sp"
        self.mesh = mesh
        self.axis = axis
        self._nshards = mesh.shape[axis]
        self._row_sharding = NamedSharding(mesh, PartitionSpec(axis))
        self._replicated = NamedSharding(mesh, PartitionSpec())
        super().__init__(compiled, config, xp=jnp)

    def place(self, pair):
        import jax
        d = self._nshards

        def put(a):
            if a.ndim >= 1 and a.shape[0] % d == 0 and a.shape[0] >= d:
                return jax.device_put(a, self._row_sharding)
            return jax.device_put(a, self._replicated)

        return tuple(put(a) for a in pair)


def prove_sharded(spk: ShardedProvingKey, external_values: np.ndarray,
                  check_constraints: bool = False, timer=None):
    """Full multi-chip prove: identical pipeline and transcript to
    prove.prove(); the ShardedProvingKey's placement makes every phase an
    SPMD program over the mesh."""
    return prove(spk, external_values, check_constraints=check_constraints,
                 timer=timer)
