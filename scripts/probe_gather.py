"""Probe: device gather/sort costs for the sort-based MSM design, and
G1 add throughput at 64k lanes."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

def t(fn, *args, reps=3):
    out = fn(*args); [np.asarray(l) for l in jax.tree_util.tree_leaves(out)]
    ts = []
    for _ in range(reps):
        t0 = time.time(); out = fn(*args)
        [np.asarray(l) for l in jax.tree_util.tree_leaves(out)]
        ts.append(time.time() - t0)
    return min(ts)

N = 65536
rng = np.random.default_rng(0)
x_minor = jnp.asarray(rng.integers(0, 1 << 16, size=(75, N), dtype=np.uint32))
x_major = jnp.asarray(np.ascontiguousarray(np.asarray(x_minor).T))
perm = jnp.asarray(rng.permutation(N).astype(np.int32))
perms20 = jnp.asarray(np.stack([rng.permutation(N) for _ in range(20)]).astype(np.int32))

# gather along minor (lane) axis, slope over 8 vs 2
def g_minor(k):
    def f(x, p):
        for _ in range(k):
            x = jnp.take(x, p, axis=1)
        return x[:2, :8]
    return t(jax.jit(f), x_minor, perm)
t1, t2 = g_minor(2), g_minor(10)
print(f"gather minor (75,{N}): {(t2-t1)/8*1e3:.2f}ms per gather", flush=True)

def g_major(k):
    def f(x, p):
        for _ in range(k):
            x = jnp.take(x, p, axis=0)
        return x[:8, :2]
    return t(jax.jit(f), x_major, perm)
t1, t2 = g_major(2), g_major(10)
print(f"gather major ({N},75): {(t2-t1)/8*1e3:.2f}ms per gather", flush=True)

# 20 windows at once (vmapped gather), minor layout
def g20(x, P):
    return jax.vmap(lambda p: jnp.take(x, p, axis=1))(P)[:, :2, :8]
tt = t(jax.jit(g20), x_minor, perms20)
print(f"gather 20x minor: {tt*1e3:.2f}ms total", flush=True)

# sort on device
keys = jnp.asarray(rng.integers(0, 1 << 20, size=(20, N), dtype=np.uint32))
vals = jnp.broadcast_to(jnp.arange(N, dtype=jnp.uint32), (20, N))
def srt(k, v):
    ks, vs = lax.sort([k, v], dimension=1, num_keys=1)
    return ks[:, :8], vs[:, :8]
tt = t(jax.jit(srt), keys, vals)
print(f"lax.sort 20x{N}: {tt*1e3:.2f}ms", flush=True)

# G1 add at 65536 lanes (slope)
from groth_sahai_tpu.ops.curve import G1, g1_affine_from_ints
from groth_sahai_tpu.ops import bls12_381 as C
pts = g1_affine_from_ints([(C.G1_GEN_X, C.G1_GEN_Y)] * N)
jac = jax.jit(G1.from_affine)(pts)
def chain_add(K):
    def f(p):
        for _ in range(K):
            p = G1.add(p, p)
        return p[0][:2, :8]
    return t(jax.jit(f), jac)
t1, t2 = chain_add(2), chain_add(10)
print(f"g1_add B={N}: per-op={(t2-t1)/8*1e3:.2f}ms -> {N/((t2-t1)/8)/1e6:.1f}M adds/s", flush=True)

def chain_addm(K):
    def f(p, a):
        for _ in range(K):
            p = G1.add_mixed(p, a)
        return p[0][:2, :8]
    return t(jax.jit(f), jac, pts)
t1, t2 = chain_addm(2), chain_addm(10)
print(f"g1_add_mixed B={N}: per-op={(t2-t1)/8*1e3:.2f}ms -> {N/((t2-t1)/8)/1e6:.1f}M adds/s", flush=True)
