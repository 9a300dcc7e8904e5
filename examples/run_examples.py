"""End-to-end example driver: the analog of the reference's run_examples.py
and `make verification_happy_path` (Makefile:38-54): for each example
program, write a nargo-style artifact + witness, then prove -> write_vk ->
verify through the CLI, asserting the verifier accepts.

The reference's examples come from running the forked nargo over Noir
sources; ours are programmatic ACIR builders of the same shapes
(tests/factories.py), since that toolchain isn't available here.

Usage: python examples/run_examples.py [--backend numpy|jax] [names...]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import factories  # noqa: E402
from tpu_acir_prover.acir import codec, ir  # noqa: E402


def run_example(name: str, backend: str, workdir: str) -> float:
    prog, wm = factories.ALL_SMALL[name]()
    bc = os.path.join(workdir, f"{name}.json")
    wit = os.path.join(workdir, f"{name}.witness.gz")
    proof = os.path.join(workdir, f"{name}.proof")
    vk = os.path.join(workdir, f"{name}.vk")
    codec.save_program_artifact(bc, prog, name=name)
    codec.save_witness_stack(wit, ir.WitnessStack([ir.StackItem(0, wm)]))

    env = dict(os.environ, TPU_ACIR_BACKEND=backend,
               PYTHONPATH=os.path.join(os.path.dirname(__file__), ".."))

    def cli(*args):
        r = subprocess.run([sys.executable, "-m", "tpu_acir_prover.cli",
                            *args], env=env, capture_output=True, text=True)
        if r.returncode != 0:
            raise SystemExit(f"{name}: {' '.join(args)} failed:\n{r.stderr}")
        return r

    t0 = time.time()
    cli("prove", "-b", bc, "-w", wit, "-o", proof, "--test-config")
    cli("write_vk", "-b", bc, "-o", vk, "--test-config")
    cli("verify", "-k", vk, "-p", proof)
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="numpy", choices=["numpy", "jax"])
    ap.add_argument("names", nargs="*", default=[])
    args = ap.parse_args()
    names = args.names or sorted(factories.ALL_SMALL)
    with tempfile.TemporaryDirectory() as wd:
        for name in names:
            dt = run_example(name, args.backend, wd)
            print(f"  {name:<24s} ok  ({dt:.1f}s)")
    print(f"all {len(names)} examples verified")


if __name__ == "__main__":
    main()
