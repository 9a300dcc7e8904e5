"""Integrated multi-chip prover: a full prove() on the 8-device mesh must
produce a proof that is byte-identical to the single-chip proof and that
the EXISTING host verifier accepts (VERDICT r2 missing-item #1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import factories
from tpu_acir_prover.acir.translator import translate_program
from tpu_acir_prover.circuit.compile import compile_circuit
from tpu_acir_prover.parallel.prove import ShardedProvingKey, prove_sharded
from tpu_acir_prover.prover.config import TEST_CONFIG
from tpu_acir_prover.prover.prove import ProvingKey, prove
from tpu_acir_prover.prover.serialization import serialize_proof
from tpu_acir_prover.prover.verify import verify


def _mesh():
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()), ("sp",))


@pytest.mark.parametrize("name", ["fibonacci", "range_33"])
def test_sharded_prove_byte_identical(name):
    prog, wm = factories.ALL_SMALL[name]()
    tr = translate_program(prog)
    cc = compile_circuit(tr.builder)
    ext = tr.external_values(wm)

    pk = ProvingKey(cc, TEST_CONFIG, xp=jnp)
    proof_single = prove(pk, ext)

    spk = ShardedProvingKey(cc, TEST_CONFIG, mesh=_mesh())
    assert spk.vk.constants_cap == pk.vk.constants_cap
    proof_sharded = prove_sharded(spk, ext)
    verify(spk.vk, proof_sharded)
    assert serialize_proof(proof_sharded) == serialize_proof(proof_single)


def test_sharded_tensors_actually_sharded():
    """The domain-axis tensors must really be laid out across all mesh
    devices (guards against place() silently replicating everything)."""
    prog, wm = factories.fibonacci()
    tr = translate_program(prog)
    cc = compile_circuit(tr.builder)
    spk = ShardedProvingKey(cc, TEST_CONFIG, mesh=_mesh())
    lde_lo = spk.constants_oracle.lde[0]
    ndev = len(jax.devices())
    assert len(lde_lo.sharding.device_set) == ndev
    assert lde_lo.addressable_shards[0].data.shape[0] == \
        lde_lo.shape[0] // ndev
    assert len(spk.x_lde[0].sharding.device_set) == ndev
