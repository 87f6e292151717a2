"""Slope-based honest per-op costs: chain K ops inside one jit, fetch a
tiny output slice; cost(K2)-cost(K1) / (K2-K1) removes dispatch+transfer."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from groth_sahai_tpu.ops.fp import FQ
from groth_sahai_tpu.ops.tower import FQ12
from groth_sahai_tpu.ops.curve import G1, g1_affine_from_ints, g2_affine_from_ints
from groth_sahai_tpu.ops import bls12_381 as C
from groth_sahai_tpu.ops import pairing as pr

def t(fn, *args, reps=3):
    out = fn(*args); np.asarray(out)  # compile+warm
    ts = []
    for _ in range(reps):
        t0 = time.time(); out = fn(*args); np.asarray(out)
        ts.append(time.time() - t0)
    return min(ts)

def chain_mul(K, B):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 15, size=(25, B), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 15, size=(25, B), dtype=np.uint32))
    def f(a, b):
        for _ in range(K):
            a = FQ._mont_mul(a, b)
        return a[:2, :8]
    return t(jax.jit(f), a, b)

for B in (1024, 4096, 16384, 65536):
    t1 = chain_mul(16, B)
    t2 = chain_mul(80, B)
    per = (t2 - t1) / 64
    print(f"mont_mul B={B}: per-op={per*1e6:.1f}us -> {B/per/1e6:.2f}M muls/s",
          flush=True)

# Fq12 mul slope at B=1024
def chain_f12(K, B):
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.integers(0, 1 << 15, size=(25, 12, B), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 15, size=(25, 12, B), dtype=np.uint32))
    def f(a, b):
        for _ in range(K):
            a = FQ12.mul(a, b)
        return a[:2, :2, :8]
    return t(jax.jit(f), a, b)

for B in (1024, 4096):
    t1 = chain_f12(4, B)
    t2 = chain_f12(12, B)
    per = (t2 - t1) / 8
    print(f"fq12_mul B={B}: per-op={per*1e6:.1f}us -> {B/per/1e6:.3f}M/s", flush=True)

# G1 add slope at B=4096
def chain_add(K, B):
    pts = g1_affine_from_ints([(C.G1_GEN_X, C.G1_GEN_Y)] * B)
    jac = jax.jit(G1.from_affine)(pts)
    def f(p):
        for _ in range(K):
            p = G1.add(p, p)
        return p[0][:2, :8]
    return t(jax.jit(f), jac)

for B in (4096, 16384):
    t1 = chain_add(4, B)
    t2 = chain_add(12, B)
    per = (t2 - t1) / 8
    print(f"g1_add B={B}: per-op={per*1e6:.1f}us -> {B/per/1e6:.3f}M adds/s", flush=True)

# pairing at batch 512: full honest timing (compile cached from earlier? no --
# different batch shape, new compile. keep it last.)
B = 512
P = g1_affine_from_ints([(C.G1_GEN_X, C.G1_GEN_Y)] * B)
Q = g2_affine_from_ints([(C.G2_GEN_X, C.G2_GEN_Y)] * B)
pj = jax.jit(lambda P, Q: pr.pairing(P, Q)[:2, :2, :8])
t0 = time.time(); np.asarray(pj(P, Q)); print(f"pairing B={B} compile+run {time.time()-t0:.1f}s", flush=True)
best = t(pj, P, Q)
print(f"pairing B={B}: {best*1e3:.1f}ms -> {B/best:.0f} pairings/s", flush=True)
