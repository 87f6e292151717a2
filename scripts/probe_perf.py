#!/usr/bin/env python
"""Honest perf probe: per-rep host-copy synchronization on tiny workloads.

Usage: python scripts/probe_perf.py [which ...]
"""
import os, sys, time

import jax
import jax.numpy as jnp
import numpy as np

os.chdir(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
try:
    jax.config.update("jax_compilation_cache_compression_algorithm", "zlib")
except AttributeError:
    pass

print("backend:", jax.default_backend(), flush=True)

from groth_sahai_tpu.ops.fp import FQ, FR
from groth_sahai_tpu.ops import pairing as pr
from groth_sahai_tpu.ops.curve import G1, G2, g1_affine_from_ints, g2_affine_from_ints
from groth_sahai_tpu.ops import bls12_381 as C
from groth_sahai_tpu.utils.rng import GsRng


def timed(name, fn, *args, reps=3):
    t0 = time.time()
    out = fn(*args)
    host = np.asarray(jax.tree_util.tree_leaves(out)[0])
    t_compile = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        host = np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.time() - t0)
    print(f"{name}: compile+first={t_compile:.3f}s reps={['%.4f' % t for t in ts]}",
          flush=True)
    return min(ts)


which = sys.argv[1:] or ["mul", "smul", "pair8"]

rng = GsRng(7)

if "mul" in which:
    # field mul throughput: batch 8192 Fq mont_muls, chained x32 to amortize
    a = FQ.to_mont(jnp.asarray(np.random.randint(0, 1 << 16, (25, 8192), dtype=np.uint32) & 0x3FF))
    @jax.jit
    def chain(a):
        x = a
        for _ in range(32):
            x = FQ.mul(x, a)
        return x
    t = timed("fq_mul chain32 batch8192", chain, a)
    print(f"  -> {32 * 8192 / t / 1e6:.2f} M fq-muls/s", flush=True)

if "smul" in which:
    n = 64
    P = g1_affine_from_ints([(C.G1_GEN_X, C.G1_GEN_Y)] * n)
    s = rng.fr_std((n,))
    f = jax.jit(lambda P, s: G1.scalar_mul(P, s))
    t = timed(f"g1_smul n={n}", f, P, s)
    print(f"  -> {n / t:.1f} smul/s", flush=True)

if "pair8" in which:
    n = 8
    P = g1_affine_from_ints([(C.G1_GEN_X, C.G1_GEN_Y)] * n)
    Q = g2_affine_from_ints([(C.G2_GEN_X, C.G2_GEN_Y)] * n)
    f = jax.jit(pr.pairing)
    t = timed(f"pairing n={n}", f, P, Q)
    print(f"  -> {n / t:.1f} pairings/s", flush=True)

if "pair128" in which:
    n = 128
    P = g1_affine_from_ints([(C.G1_GEN_X, C.G1_GEN_Y)] * n)
    Q = g2_affine_from_ints([(C.G2_GEN_X, C.G2_GEN_Y)] * n)
    f = jax.jit(pr.pairing)
    t = timed(f"pairing n={n}", f, P, Q)
    print(f"  -> {n / t:.1f} pairings/s", flush=True)
