#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: batched BLS12-381 pairings/s (full Miller loop + final
exponentiation) on one chip -- the dominant primitive of GS verification
(SURVEY.md section 3.3: ~4(3m+4) Miller loops per PPE verify).

Methodology (fixes VERDICT round-1 "What's weak" #1):
  * every rep is synchronized by copying the full output to HOST memory
    (np.asarray), the only sync that is trustworthy through the tunneled
    TPU runtime;
  * every rep uses FRESH inputs (independently seeded scalars);
  * >= 5 reps; the reported value uses the MEDIAN rep time; min/mean and
    the first (compile) call are reported alongside;
  * the result is checked against the pure-python arkworks-equivalent
    oracle (tests/oracle.py) -- `checksum_ok` in the output line;
  * `vs_baseline` is labeled: the reference publishes no numbers
    (BASELINE.md), so the anchor is the widely reported single-core
    arkworks figure (literature anchor, not a measured baseline).

Usage: python bench.py [--metric pairing|msm] [--batch N] [--reps R]
"""

import argparse
import json
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_cpu_max_isa" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_cpu_max_isa=AVX2").strip()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) or ".")

import jax
import jax.numpy as jnp
import numpy as np

# The container's sitecustomize force-overrides JAX_PLATFORMS to the
# tunneled TPU; honor an explicit GS_BENCH_PLATFORM for CPU sanity runs.
if os.environ.get("GS_BENCH_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["GS_BENCH_PLATFORM"])

# persistent compilation cache (helps repeated driver runs)
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__) or ".", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

from benches.timing import timeit

ARKWORKS_PAIRINGS_PER_SEC = 900.0      # ~1.1 ms/pairing, 1 CPU core (anchor)
ARKWORKS_MSM_POINTS_PER_SEC = 1.0e6    # typical arkworks G1 MSM (anchor)
BASELINE_KIND = "literature_anchor_arkworks_1core"


def _oracle():
    from tests import oracle as O
    return O


def bench_pairing(batch: int, reps: int):
    from groth_sahai_tpu.ops import pairing as pr
    from groth_sahai_tpu.ops.curve import G1, G2, g1_affine_from_ints, \
        g2_affine_from_ints
    from groth_sahai_tpu.ops.tower import FQ12
    from groth_sahai_tpu.ops import bls12_381 as C
    from groth_sahai_tpu.utils.rng import GsRng

    rng = GsRng(123)
    g1 = g1_affine_from_ints([(C.G1_GEN_X, C.G1_GEN_Y)] * batch)
    g2 = g2_affine_from_ints([(C.G2_GEN_X, C.G2_GEN_Y)] * batch)

    setup = jax.jit(lambda g1, g2, s1, s2: (
        G1.to_affine(G1.scalar_mul(g1, s1)),
        G2.to_affine(G2.scalar_mul(g2, s2))))

    n_sets = reps + 1
    a_ints, b_ints, inputs = [], [], []
    for r in range(n_sets):
        a = rng.fr_ints(batch)
        b = rng.fr_ints(batch)
        a_ints.append(a)
        b_ints.append(b)
        from groth_sahai_tpu.ops.limbs import ints_to_limbs
        from groth_sahai_tpu.ops.fp import FR
        s1 = jnp.asarray(ints_to_limbs(a, FR.n))
        s2 = jnp.asarray(ints_to_limbs(b, FR.n))
        P, Q = setup(g1, g2, s1, s2)
        inputs.append((jax.block_until_ready(P), jax.block_until_ready(Q)))

    paired = jax.jit(pr.pairing)
    stats, _ = timeit(paired, inputs, reps=reps)

    # correctness: out[..., 0] of input set 1 must equal e(G1,G2)^(a0 b0)
    O = _oracle()
    out = paired(*inputs[1])
    got = FQ12.to_ints(out[..., 0])[0]
    e0 = O.pairing(O.G1_GEN, O.G2_GEN)
    exp = e0.pow((a_ints[1][0] * b_ints[1][0]) % O.R)
    exp_t = tuple(tuple((c.c[0].v, c.c[1].v) for c in h.c) for h in exp.c)
    checksum_ok = (got == exp_t)

    rate = batch / stats["median_s"]
    return {
        "metric": "pairings_per_sec_1chip",
        "value": round(rate, 2),
        "unit": "pairings/s",
        "vs_baseline": round(rate / ARKWORKS_PAIRINGS_PER_SEC, 3),
        "baseline_kind": BASELINE_KIND,
        "batch": batch,
        "checksum_ok": bool(checksum_ok),
        **stats,
    }


def bench_msm(n_points: int, reps: int, window: int = 0, lanes: int = 0):
    del lanes                      # width picks itself from M (ops/msm.py)
    if not window:
        window = 8 if n_points < 16384 else 13
    from groth_sahai_tpu.ops import msm as msm_mod
    from groth_sahai_tpu.ops.curve import G1, g1_affine_from_ints, \
        g1_affine_to_ints
    from groth_sahai_tpu.ops import bls12_381 as C
    from groth_sahai_tpu.ops.limbs import ints_to_limbs
    from groth_sahai_tpu.ops.fp import FR
    from groth_sahai_tpu.utils.rng import GsRng

    rng = GsRng(321)
    g1 = g1_affine_from_ints([(C.G1_GEN_X, C.G1_GEN_Y)] * n_points)
    setup = jax.jit(lambda g1, s: G1.to_affine(G1.scalar_mul(g1, s)))

    n_sets = reps + 1
    a_sets, s_sets, inputs = [], [], []
    for r in range(n_sets):
        a = rng.fr_ints(n_points)
        s = rng.fr_ints(n_points)
        a_sets.append(a)
        s_sets.append(s)
        pts = jax.block_until_ready(
            setup(g1, jnp.asarray(ints_to_limbs(a, FR.n))))
        inputs.append((pts, jnp.asarray(ints_to_limbs(s, FR.n))))

    run = jax.jit(lambda p, s: G1.to_affine(
        jax.tree_util.tree_map(
            lambda l: l[..., None],
            msm_mod.msm(G1, p, s, window=window))))
    stats, _ = timeit(run, inputs, reps=reps)

    # correctness: MSM(s, aG) == (sum s_i a_i mod r) G  -- host-side O(1)
    O = _oracle()
    out = run(*inputs[1])
    got = g1_affine_to_ints(out)[0]
    k = sum(si * ai for si, ai in zip(s_sets[1], a_sets[1])) % O.R
    expp = O.g1_mul(O.G1_GEN, k)
    exp = None if expp is None else (expp[0].v, expp[1].v)
    checksum_ok = (got == exp)

    rate = n_points / stats["median_s"]
    return {
        "metric": "msm_points_per_sec_1chip",
        "value": round(rate, 2),
        "unit": "points/s",
        "vs_baseline": round(rate / ARKWORKS_MSM_POINTS_PER_SEC, 3),
        "baseline_kind": BASELINE_KIND,
        "batch": n_points,
        "window": window,
        "checksum_ok": bool(checksum_ok),
        **stats,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--metric", default="pairing", choices=["pairing", "msm"])
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--window", type=int, default=0)
    ap.add_argument("--lanes", type=int, default=0)   # ignored (compat)
    args = ap.parse_args()
    if args.metric == "pairing":
        res = bench_pairing(args.batch or 128, args.reps)
    else:
        res = bench_msm(args.batch or 65536, args.reps,
                        window=args.window, lanes=args.lanes)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
