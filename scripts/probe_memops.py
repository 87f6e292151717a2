#!/usr/bin/env python
"""Probe XLA TPU primitive costs that decide the MSM design:
sort, gather (trailing vs leading axis), scatter, and the current
msm row_step's pieces. Honest timing: per-rep host copy of a checksum.
"""
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


def timed(name, fn, *args, reps=4):
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
    print(f"{name}: compile+first={tc:.2f}s min={min(ts)*1e3:.2f}ms "
          f"reps={['%.1f' % (t*1e3) for t in ts]}", flush=True)
    return min(ts)


rng = np.random.default_rng(0)
N = 65536
W = 32
M = N * W

which = sys.argv[1:] or ["sort", "gather", "scatter", "scan"]

if "sort" in which:
    keys = jnp.asarray(rng.integers(0, W * 256, size=M, dtype=np.uint32))
    f = jax.jit(lambda k: jnp.argsort(k)[:8])
    t = timed(f"argsort M={M}", f, keys)
    f2 = jax.jit(lambda k: jax.lax.sort((k, jnp.arange(M, dtype=jnp.uint32)),
                                        num_keys=1)[1][:8])
    t = timed(f"lax.sort(key,idx) M={M}", f2, keys)

if "gather" in which:
    # point table: (N, 51) u32 records, gather M indices -> (M, 51)
    tbl = jnp.asarray(rng.integers(0, 1 << 16, size=(N, 51), dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, N, size=M, dtype=np.int32))
    f = jax.jit(lambda t_, i_: jnp.take(t_, i_, axis=0).sum(dtype=jnp.uint32))
    t = timed(f"gather (N,51)->(M,51) trailing-rec", f, tbl, idx)
    print(f"  -> {M*51*4/t/1e9:.1f} GB/s out", flush=True)
    # limb-major: (51, N) gather along trailing axis
    tblT = tbl.T
    fT = jax.jit(lambda t_, i_: jnp.take(t_, i_, axis=1).sum(dtype=jnp.uint32))
    t = timed(f"gather (51,N)->(51,M) leading-limb", fT, tblT, idx)
    print(f"  -> {M*51*4/t/1e9:.1f} GB/s out", flush=True)
    # small-chunk gather as done inside a scan: 512 gathers of 4096
    idx3 = idx.reshape(M // 4096, 4096)[:512]
    def scan_gather(t_, ii):
        def body(c, i_):
            g = jnp.take(t_, i_, axis=0)
            return c + g.sum(dtype=jnp.uint32), None
        out, _ = jax.lax.scan(body, jnp.uint32(0), ii)
        return out
    f3 = jax.jit(scan_gather)
    t = timed("scan of 512 gathers of 4096 recs", f3, tbl, idx3)
    print(f"  -> {512*4096*51*4/t/1e9:.1f} GB/s out", flush=True)

if "scatter" in which:
    # the current msm row_step scatter: (W,128,256,75limbs) put_along_axis
    buck = jnp.zeros((75, W, 128, 256), dtype=jnp.uint32)
    idxs = jnp.asarray(rng.integers(0, 256, size=(W, 128), dtype=np.int32))
    val = jnp.asarray(rng.integers(0, 1 << 16, size=(75, W, 128),
                                   dtype=np.uint32))
    def scat(b, i_, v):
        ii = jnp.broadcast_to(i_[None, :, :, None], (75, W, 128, 1))
        return jnp.put_along_axis(b, ii, v[..., None], axis=-1,
                                  inplace=False).sum(dtype=jnp.uint32)
    f = jax.jit(scat)
    t = timed("one put_along_axis (75,W,128,256)", f, buck, idxs, val)
    def gath(b, i_):
        ii = jnp.broadcast_to(i_[None, :, :, None], (75, W, 128, 1))
        return jnp.take_along_axis(b, ii, axis=-1).sum(dtype=jnp.uint32)
    f2 = jax.jit(gath)
    t = timed("one take_along_axis (75,W,128,256)", f2, buck, idxs)

if "scan" in which:
    # prefix-scan roofline: 512 sequential add_mixed of width 4096 on TPU
    from groth_sahai_tpu.ops.curve import G1
    from groth_sahai_tpu.ops.fp import FQ
    pts_x = FQ.to_mont(jnp.asarray(
        rng.integers(0, 1 << 15, size=(25, 512, 4096), dtype=np.uint32)))
    pts_y = FQ.to_mont(jnp.asarray(
        rng.integers(0, 1 << 15, size=(25, 512, 4096), dtype=np.uint32)))
    inf = jnp.zeros((512, 4096), dtype=bool)
    def prefix(px, py, pi):
        def body(acc, row):
            acc = G1.add_mixed(acc, row)
            return acc, None
        out, _ = jax.lax.scan(body, G1.inf_jac((4096,)),
                              (jnp.moveaxis(px, 1, 0), jnp.moveaxis(py, 1, 0),
                               pi))
        return out[0][:2, :8]
    f = jax.jit(prefix)
    t = timed("512 x add_mixed(4096)", f, pts_x, pts_y, inf)
    print(f"  -> {512*4096/t/1e6:.2f} M adds/s -> msm pts/s at W=32: "
          f"{512*4096/t/W/1e3:.0f}k", flush=True)
