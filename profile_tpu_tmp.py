import time, numpy as np
t00 = time.time()
import jax
from tpu_acir_prover.prover.config import STANDARD_CONFIG
from tpu_acir_prover.prover.prove import ProvingKey, prove
from tpu_acir_prover.utils.bench_circuits import mul_chain_circuit
print("jax init:", time.time()-t00, jax.devices(), flush=True)

cc = mul_chain_circuit(12)
t0 = time.time()
pk = ProvingKey(cc, STANDARD_CONFIG)
print("pk setup:", time.time()-t0, flush=True)

orig = pk.jit
def timed(key, fn):
    f = orig(key, fn)
    def w(*a):
        t = time.time()
        r = f(*a)
        jax.block_until_ready(r)
        print("  ", key, "%.2fs" % (time.time()-t), flush=True)
        return r
    return w
pk.jit = timed
t0 = time.time()
p = prove(pk, np.array([], dtype=np.uint64))
print("prove1 (compiles):", time.time()-t0, flush=True)
pk.jit = orig
from tpu_acir_prover.utils.timing import PhaseTimer
tm = PhaseTimer()
t0 = time.time()
p = prove(pk, np.array([], dtype=np.uint64), timer=tm)
print("prove2 (steady):", time.time()-t0, flush=True)
tm.report()
