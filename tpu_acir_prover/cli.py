"""CLI: `python -m tpu_acir_prover.cli {prove,write_vk,verify}`.

Mirrors the reference's bb-style interface (argument_parsing.rs:87-119):

  prove    -b <bytecode.json> -w <witness.gz> -o <proof_out>
  write_vk -b <bytecode.json> -o <vk_out>
  verify   -k <vk> -p <proof>

verify prints nothing and exits 0 on success, exits 1 with the failure
reason on stderr otherwise (reference: panic; README.md:63,76).
"""

from __future__ import annotations

import argparse
import sys

from . import api
from .prover.config import STANDARD_CONFIG, TEST_CONFIG


def _config(args):
    return TEST_CONFIG if getattr(args, "test_config", False) else STANDARD_CONFIG


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tpu_acir_prover")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("prove", help="generate a proof for an ACIR program")
    pp.add_argument("-b", "--bytecode_path", required=True)
    pp.add_argument("-w", "--witness_path", required=True)
    pp.add_argument("-o", "--proof_path", required=True)
    pp.add_argument("--backend", choices=["jax", "numpy"], default=None)
    pp.add_argument("--test-config", action="store_true",
                    help="small FRI parameters (testing only, not sound)")

    pv = sub.add_parser("write_vk", help="write the verifying key")
    pv.add_argument("-b", "--bytecode_path", required=True)
    pv.add_argument("-o", "--vk_path", required=True)
    pv.add_argument("--backend", choices=["jax", "numpy"], default=None)
    pv.add_argument("--test-config", action="store_true")

    pk = sub.add_parser("verify", help="verify a proof against a vk")
    pk.add_argument("-k", "--vk_path", required=True)
    pk.add_argument("-p", "--proof_path", required=True)

    args = p.parse_args(argv)
    try:
        if args.cmd == "prove":
            api.prove_file(args.bytecode_path, args.witness_path,
                           args.proof_path, _config(args), args.backend)
        elif args.cmd == "write_vk":
            api.write_vk_file(args.bytecode_path, args.vk_path,
                              _config(args), args.backend)
        elif args.cmd == "verify":
            api.verify_file(args.vk_path, args.proof_path)
    except Exception as e:  # reference behavior: panic -> nonzero exit
        print(f"error: {e}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
