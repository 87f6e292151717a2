#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: batched BLS12-381 pairings/s (full Miller loop + final
exponentiation) on one chip -- the dominant primitive of GS verification
(SURVEY.md section 3.3: ~4(3m+4) Miller loops per PPE verify).

vs_baseline: ratio against a single-threaded arkworks CPU pairing at
~1.1 ms/pairing (~900 pairings/s) -- the reference publishes no numbers
(BASELINE.md), so we anchor on the widely reported arkworks figure; the
reference's verifier is single-threaded per pairing_sum entry.

Usage: python bench.py [--batch N] [--metric pairing|msm]
"""

import argparse
import json
import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_cpu_max_isa" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_cpu_max_isa=AVX2").strip()

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache (helps repeated driver runs)
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__) or ".", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # zstandard cache writes can segfault on large executables; use zlib
    jax.config.update("jax_compilation_cache_compression_algorithm", "zlib")
except Exception:
    pass

ARKWORKS_PAIRINGS_PER_SEC = 900.0      # ~1.1 ms/pairing, 1 CPU core
ARKWORKS_MSM_POINTS_PER_SEC = 1.0e6    # typical arkworks G1 MSM throughput


def bench_pairing(batch: int):
    from groth_sahai_tpu.ops import pairing as pr
    from groth_sahai_tpu.ops.curve import G1, G2, g1_affine_from_ints, \
        g2_affine_from_ints
    from groth_sahai_tpu.ops import bls12_381 as C
    from groth_sahai_tpu.utils.rng import GsRng
    from groth_sahai_tpu.ops.fp import FR

    rng = GsRng(123)
    # batch of random multiples of the generators (computed on device)
    g1 = g1_affine_from_ints([(C.G1_GEN_X, C.G1_GEN_Y)] * batch)
    g2 = g2_affine_from_ints([(C.G2_GEN_X, C.G2_GEN_Y)] * batch)
    s1 = rng.fr_std((batch,))
    s2 = rng.fr_std((batch,))

    @jax.jit
    def setup(g1, g2, s1, s2):
        return (G1.to_affine(G1.scalar_mul(g1, s1)),
                G2.to_affine(G2.scalar_mul(g2, s2)))

    P, Q = jax.block_until_ready(setup(g1, g2, s1, s2))

    paired = jax.jit(pr.pairing)
    out = jax.block_until_ready(paired(P, Q))        # compile + warm
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = paired(P, Q)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    rate = batch / dt
    return {
        "metric": "pairings_per_sec_1chip",
        "value": round(rate, 2),
        "unit": "pairings/s",
        "vs_baseline": round(rate / ARKWORKS_PAIRINGS_PER_SEC, 3),
    }


def bench_msm(n_points: int):
    from groth_sahai_tpu.ops import msm as msm_mod
    from groth_sahai_tpu.ops.curve import G1, g1_affine_from_ints
    from groth_sahai_tpu.ops import bls12_381 as C
    from groth_sahai_tpu.utils.rng import GsRng

    rng = GsRng(321)
    base = g1_affine_from_ints([(C.G1_GEN_X, C.G1_GEN_Y)] * n_points)
    s0 = rng.fr_std((n_points,))
    scal = rng.fr_std((n_points,))

    @jax.jit
    def setup(base, s0):
        return G1.to_affine(G1.scalar_mul(base, s0))

    pts = jax.block_until_ready(setup(base, s0))

    run = jax.jit(lambda p, s: msm_mod.msm(G1, p, s, window=8, lanes=128))
    out = jax.block_until_ready(run(pts, scal))
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = run(pts, scal)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    rate = n_points / dt
    return {
        "metric": "msm_points_per_sec_1chip",
        "value": round(rate, 2),
        "unit": "points/s",
        "vs_baseline": round(rate / ARKWORKS_MSM_POINTS_PER_SEC, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--metric", default="pairing", choices=["pairing", "msm"])
    ap.add_argument("--batch", type=int, default=0)
    args = ap.parse_args()
    if args.metric == "pairing":
        res = bench_pairing(args.batch or 128)
    else:
        res = bench_msm(args.batch or 4096)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
