#!/usr/bin/env python
"""Graduated probe: fq mont_mul throughput, one add_mixed, then scans of
increasing depth -- to find where the time goes on the real chip."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
try:
    jax.config.update("jax_compilation_cache_compression_algorithm", "zlib")
except AttributeError:
    pass

print("backend:", jax.default_backend(), flush=True)

from groth_sahai_tpu.ops.fp import FQ
from groth_sahai_tpu.ops.curve import G1

rng = np.random.default_rng(0)
B = 4096


def timed(name, fn, *args, reps=3):
    t0 = time.time()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:4]
    tc = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:4]
        ts.append(time.time() - t0)
    print(f"{name}: compile+first={tc:.2f}s min={min(ts)*1e3:.3f}ms",
          flush=True)
    return min(ts)


a = FQ.to_mont(jnp.asarray(rng.integers(0, 1 << 15, (25, B), dtype=np.uint32)))
b = FQ.to_mont(jnp.asarray(rng.integers(0, 1 << 15, (25, B), dtype=np.uint32)))

# 1. chained mont_mul: marginal cost per mul at width B
for K in (8, 64):
    def chain(a, b, K=K):
        x = a
        for _ in range(K):
            x = FQ._mont_mul(x, b)
        return x[:2, :8]
    t = timed(f"mul chain K={K} B={B}", jax.jit(chain), a, b)
print("  (slope gives ns/mul)", flush=True)

# 2. one add_mixed at width B
px = FQ.to_mont(jnp.asarray(rng.integers(0, 1 << 15, (25, B), dtype=np.uint32)))
py = FQ.to_mont(jnp.asarray(rng.integers(0, 1 << 15, (25, B), dtype=np.uint32)))
pinf = jnp.zeros((B,), bool)
acc = G1.from_affine((px, py, pinf))


def one_add(acc, p):
    return G1.add_mixed(acc, p)


t1 = timed("one add_mixed B=4096", jax.jit(one_add), acc, (py, px, pinf))

# 3. scan of D add_mixed steps
for D in (16, 64):
    xs = (FQ.to_mont(jnp.asarray(
            rng.integers(0, 1 << 15, (25, D, B), dtype=np.uint32))),
          FQ.to_mont(jnp.asarray(
            rng.integers(0, 1 << 15, (25, D, B), dtype=np.uint32))),
          jnp.zeros((D, B), bool))

    def scan_d(xs):
        def body(acc, row):
            return G1.add_mixed(acc, row), None
        out, _ = jax.lax.scan(
            body, G1.inf_jac((B,)),
            (jnp.moveaxis(xs[0], 1, 0), jnp.moveaxis(xs[1], 1, 0), xs[2]))
        return out[0][:2, :8]

    t = timed(f"scan D={D} add_mixed B={B}", jax.jit(scan_d), xs)
    print(f"  -> {D*B/t/1e6:.2f} M adds/s", flush=True)
