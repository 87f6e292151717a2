#!/usr/bin/env python
"""Full benchmark suite mirroring the reference's criterion workloads.

One JSON line per metric (the repo-root bench.py prints only the headline).
Workload parity with /root/reference/benches/bench.rs:

  commit_g1_2 / commit_g1_334        bench.rs:292-322   (batch commit -> B1)
  commit_g2_2 / commit_g2_334        bench.rs:324-354
  commit_scalar_b1_334 / _b2_334     bench.rs:356-418
  prove_ppe_2x1 / prove_ppe_334      bench.rs:420-498
  verify_ppe_2x1 / verify_ppe_334    bench.rs:500-578 (334 disabled upstream,
                                      enabled here)
  g1_scalar_mul / g1_add micro       bench.rs:197-290
  pairing / msm (TPU headline)       no upstream analogue (SURVEY.md #2b)
  batch_verify_1024                  BASELINE configs[4] (new capability)

Usage: python benches/suite.py [--quick] [--only NAME_SUBSTR]
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

from groth_sahai_tpu.utils import cache as _cache
_cache.setup(jax)


def timeit(fn, *args, reps=3):
    """Honest per-rep host-synchronized mean seconds (benches/timing.py)."""
    from benches.timing import timeit as _honest
    stats, _ = _honest(fn, [args], reps=reps)
    return stats["median_s"]


def emit(name, seconds, unit="s", extra=None):
    rec = {"metric": name, "value": round(seconds, 6), "unit": unit}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="skip the m=334 and 1024-batch configs")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    from groth_sahai_tpu.ops import bls12_381 as C
    from groth_sahai_tpu.ops.curve import (G1, G2, g1_affine_from_ints,
                                           g2_affine_from_ints)
    from groth_sahai_tpu.ops import pairing as pr
    from groth_sahai_tpu.ops import msm as msm_mod
    from groth_sahai_tpu.ops.tower import FQ12
    from groth_sahai_tpu.utils.rng import GsRng
    from groth_sahai_tpu.models.crs import generate_crs
    from groth_sahai_tpu.models import prover as P
    from groth_sahai_tpu.models import kernels as K
    from groth_sahai_tpu.models.statement import PPE
    from groth_sahai_tpu.models.verifier import verify

    rng = GsRng(1234)
    crs = generate_crs(GsRng(2024))

    def rand_g1(n, seed):
        r = GsRng(seed)
        base = g1_affine_from_ints([(C.G1_GEN_X, C.G1_GEN_Y)] * n)
        return jax.block_until_ready(jax.jit(
            lambda b, s: G1.to_affine(G1.scalar_mul(b, s)))(
                base, r.fr_std((n,))))

    def rand_g2(n, seed):
        r = GsRng(seed)
        base = g2_affine_from_ints([(C.G2_GEN_X, C.G2_GEN_Y)] * n)
        return jax.block_until_ready(jax.jit(
            lambda b, s: G2.to_affine(G2.scalar_mul(b, s)))(
                base, r.fr_std((n,))))

    sizes = [2] if args.quick else [2, 334]

    pats = [p for p in args.only.split(",") if p != ""]

    def want(name):
        return not pats or any(p in name for p in pats)

    # ---- commits (bench.rs:292-418) ----------------------------------------
    for m in sizes:
        if not any(want(f"{g}_{m}") for g in
                   ("commit_g1", "commit_g2",
                    "commit_scalar_b1", "commit_scalar_b2")):
            continue
        xs = rand_g1(m, 10 + m)
        if want(f"commit_g1_{m}"):
            dt = timeit(lambda x: P.batch_commit_G1(
                x, crs, rand=rng.fr_std((m, 2))).coms, xs)
            emit(f"commit_g1_{m}", dt)
        ys = rand_g2(m, 20 + m)
        if want(f"commit_g2_{m}"):
            dt = timeit(lambda y: P.batch_commit_G2(
                y, crs, rand=rng.fr_std((m, 2))).coms, ys)
            emit(f"commit_g2_{m}", dt)
        sc = rng.fr_std((m,))
        if want(f"commit_scalar_b1_{m}"):
            dt = timeit(lambda s: P.batch_commit_scalar_B1(
                s, crs, rand=rng.fr_std((m, 1))).coms, sc)
            emit(f"commit_scalar_b1_{m}", dt)
        if want(f"commit_scalar_b2_{m}"):
            dt = timeit(lambda s: P.batch_commit_scalar_B2(
                s, crs, rand=rng.fr_std((m, 1))).coms, sc)
            emit(f"commit_scalar_b2_{m}", dt)

    # ---- prove / verify PPE (bench.rs:420-578) ------------------------------
    def make_ppe(m, n, seed):
        r = GsRng(seed)
        xs, ys = rand_g1(m, seed + 1), rand_g2(n, seed + 2)
        a, b = rand_g1(n, seed + 3), rand_g2(m, seed + 4)
        gamma = r.fr_std((m, n))
        # target consistent with the witness: prod e(a,y) e(x,b) e(x, gamma y)
        gy = K.to_affine(G2, K.com_matvec(
            G2, gamma[:, :, :], tuple(
                l[..., None, :] if i < 2 else l[None, :]
                for i, l in enumerate(ys))))
        gy = tuple(l[..., 0, :] if i < 2 else l[0] for i, l in enumerate(gy))
        # t = e(A, Y) * e(X, B) * e(X, Gamma Y) ... use multi-pairing
        import groth_sahai_tpu.models.commit_group as cg
        Pc = cg.aff_concat(G1, [a, xs, xs], axis=0)
        Qc = cg.aff_concat(G2, [ys, b, gy], axis=0)
        t = jax.jit(lambda p, q: pr.multi_pairing(p, q, axis=0))(Pc, Qc)
        return PPE(a_consts=a, b_consts=b, gamma=gamma, target=t), xs, ys

    ppe_sizes = [(2, 1)] if args.quick else [(2, 1), (334, 334)]
    for (m, n) in ppe_sizes:
        if not (want(f"prove_ppe_{m}x{n}") or want(f"verify_ppe_{m}x{n}")):
            continue
        equ, xs, ys = make_ppe(m, n, 100 + m)
        if want(f"prove_ppe_{m}x{n}"):
            def do_prove():
                return P.commit_and_prove(equ, xs, ys, crs, GsRng(5)) \
                    .equ_proofs[0].pi
            dt = timeit(lambda: do_prove())
            emit(f"prove_ppe_{m}x{n}", dt)
        if want(f"verify_ppe_{m}x{n}"):
            proof = P.commit_and_prove(equ, xs, ys, crs, GsRng(5))
            ok = verify(equ, proof, crs)
            assert ok, f"PPE {m}x{n} proof must verify"
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                verify(equ, proof, crs)
            dt = (time.perf_counter() - t0) / reps
            emit(f"verify_ppe_{m}x{n}", dt, extra={"verified": bool(ok)})

    # ---- micro: curve ops (bench.rs:197-290) --------------------------------
    if want("g1_scalar_mul_4096"):
        pts = rand_g1(4096, 31)
        s = rng.fr_std((4096,))
        dt = timeit(jax.jit(lambda p, sc: G1.scalar_mul(p, sc)), pts, s)
        emit("g1_scalar_mul_4096", dt, extra={"per_sec": round(4096 / dt, 1)})
    if want("g1_add_65536"):
        pts = rand_g1(4096, 32)
        j = jax.jit(lambda p: G1.from_affine(p))(pts)
        big = jax.tree_util.tree_map(
            lambda l: jnp.repeat(l, 16, axis=-1), j)
        dt = timeit(jax.jit(lambda a: G1.add(a, a)), big)
        emit("g1_add_65536", dt, extra={"per_sec": round(65536 / dt, 1)})

    # ---- TPU headline: pairings + MSM (SURVEY.md 2b) ------------------------
    # The pairing/msm headlines run through bench.py's own harness (AOT
    # graphs from artifacts/ + committed .jax_cache_seed entries + oracle
    # conformance gate), so the suite never recompiles one-off batch-size
    # variants of the two most expensive Mosaic graphs.
    if want("pairing_4096") or want("msm_65536"):
        import bench as _bench
        if want("pairing_4096"):
            rec = _bench.bench_pairing(4096, 3)
            emit("pairing_4096", rec["min_s"],
                 extra={"pairings_per_sec": rec["value"],
                        "checksum_ok": rec.get("checksum_ok")})
        if want("msm_65536"):
            rec = _bench.bench_msm(65536, 3, 13)
            emit("msm_65536", rec["min_s"],
                 extra={"points_per_sec": rec["value"],
                        "checksum_ok": rec.get("checksum_ok")})

    # ---- batched verification (new capability; BASELINE configs[4]) ---------
    # B = 1024 is the BASELINE.json configs[4] workload at size (--quick
    # drops to 64).  The proofs are distinct (per-proof randomness); the
    # equation is shared, which matches the configs[4] "1024 batched PPE
    # verifies" shape.
    if want("batch_verify"):
        from groth_sahai_tpu.models.batch import verify_ppe_batch_randomized
        B = 64 if args.quick else 1024
        equ, xs, ys = make_ppe(2, 1, 777)
        proofs = [P.commit_and_prove(equ, xs, ys, crs, GsRng(6 + i))
                  for i in range(B)]
        equs = [equ] * B
        r = GsRng(9)
        ok = verify_ppe_batch_randomized(equs, proofs, crs, r)
        assert ok
        t0 = time.perf_counter()
        verify_ppe_batch_randomized(equs, proofs, crs, GsRng(10))
        dt = time.perf_counter() - t0
        emit(f"batch_verify_randomized_{B}", dt,
             extra={"proofs_per_sec": round(B / dt, 1)})


if __name__ == "__main__":
    main()
