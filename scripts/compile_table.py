"""Record trace+compile seconds for the big graphs (VERDICT r2 item #6).

Usage:
  python scripts/compile_table.py [--platform cpu|default] [--out FILE]

Emits a JSON table and (with --out) writes/updates COMPILE_TABLE.md at
the repo root. Note: compiles here also PRIME the persistent .jax_cache
for the driver's bench entry shapes, so this doubles as the cache warmer.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_cpu_max_isa" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_cpu_max_isa=AVX2").strip()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="default",
                    choices=["default", "cpu"])
    ap.add_argument("--out", default=None)
    ap.add_argument("--pairing-batch", type=int, default=512)
    ap.add_argument("--msm-n", type=int, default=65536)
    args = ap.parse_args()

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from groth_sahai_tpu.utils import cache as _cache
    _cache.setup(jax)

    from groth_sahai_tpu.ops import pairing as pr
    from groth_sahai_tpu.ops import msm as msm_mod
    from groth_sahai_tpu.ops.curve import (G1, G2, g1_affine_from_ints,
                                           g2_affine_from_ints)
    from groth_sahai_tpu.ops.fp import FR
    from groth_sahai_tpu.ops.limbs import ints_to_limbs
    from groth_sahai_tpu.ops import bls12_381 as C
    from groth_sahai_tpu.utils.profiling import compile_seconds
    from groth_sahai_tpu.utils.rng import GsRng

    rng = GsRng(1)
    B = args.pairing_batch
    N = args.msm_n
    g1b = g1_affine_from_ints([(C.G1_GEN_X, C.G1_GEN_Y)] * B)
    g2b = g2_affine_from_ints([(C.G2_GEN_X, C.G2_GEN_Y)] * B)
    g1n = g1_affine_from_ints([(C.G1_GEN_X, C.G1_GEN_Y)] * N)
    sB = jnp.asarray(ints_to_limbs(rng.fr_ints(B), FR.n))
    sN = jnp.asarray(ints_to_limbs(rng.fr_ints(N), FR.n))

    window, _ = msm_mod._config_defaults(N, 0, None)
    graphs = {
        f"pairing_batch{B}": (lambda: compile_seconds(pr.pairing, g1b, g2b)),
        f"setup_smul_batch{B}": (lambda: compile_seconds(
            lambda a, b, s1, s2: (G1.to_affine(G1.scalar_mul(a, s1)),
                                  G2.to_affine(G2.scalar_mul(b, s2))),
            g1b, g2b, sB, sB)),
        f"msm_n{N}_w{window}": (lambda: compile_seconds(
            lambda p, s: msm_mod.msm(G1, p, s, window=window), g1n, sN)),
    }

    rows = {}
    for name, fn in graphs.items():
        t0 = time.perf_counter()
        try:
            res = fn()
        except Exception as e:       # record failures, keep going
            res = {"error": str(e)[:200]}
        res["wall_s"] = round(time.perf_counter() - t0, 3)
        rows[name] = res
        print(json.dumps({name: res}), flush=True)

    out = {"backend": jax.default_backend(), "graphs": rows}
    print(json.dumps(out))
    if args.out:
        path = args.out
        lines = ["# Compile-time table (scripts/compile_table.py)", "",
                 f"Backend: `{out['backend']}`  (cached entries make reruns "
                 "near-zero; cold numbers below)", "",
                 "| graph | trace s | compile s | wall s |", "|---|---|---|---|"]
        for name, r in rows.items():
            lines.append(f"| {name} | {r.get('trace_s', '-')} | "
                         f"{r.get('compile_s', '-')} | {r['wall_s']} |")
        with open(path, "a") as f:
            f.write("\n".join(lines) + "\n\n")


if __name__ == "__main__":
    main()
