#!/usr/bin/env python
"""Piecewise timing of the MSM pipeline stages on the current backend.

Each stage is its own jit so honest per-stage times can be read; stage
boundaries materialize intermediates (costs a little extra HBM traffic vs
the fused kernel, so the sum slightly overstates the fused total).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
try:
    jax.config.update("jax_compilation_cache_compression_algorithm", "zlib")
except AttributeError:
    pass

print("backend:", jax.default_backend(), flush=True)

from groth_sahai_tpu.ops.fp import FR
from groth_sahai_tpu.ops.limbs import ints_to_limbs
from groth_sahai_tpu.ops.curve import G1, g1_affine_from_ints
from groth_sahai_tpu.ops import msm as msm_mod

N = int(os.environ.get("N", 65536))
window = int(os.environ.get("W", 8))
width = int(os.environ.get("WIDTH", 4096))
n_windows = -(-256 // window)
nbuck = 1 << window
M = N * n_windows
rows = -(-M // width)
Mp = rows * width

import random
rng = random.Random(7)
from tests import oracle as O
base = [O.g1_mul(O.G1_GEN, k + 1) for k in range(64)]
pts = g1_affine_from_ints([(p[0].v, p[1].v) for p in base] * (N // 64))
ss = [rng.randrange(O.R) for _ in range(N)]
scal = jnp.asarray(ints_to_limbs(ss, FR.n))


def timed(name, fn, *args, reps=3):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    tc = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    print(f"{name}: compile+first={tc:.1f}s min={min(ts)*1e3:.1f}ms",
          flush=True)
    return out


@jax.jit
def stage_sort(scalars_std):
    digs = msm_mod._digits(scalars_std, window)
    win_ix = jnp.arange(n_windows, dtype=jnp.uint32)[:, None]
    keys = (digs + win_ix * nbuck).reshape(M)
    idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.uint32)[None, :],
                           (n_windows, N)).reshape(M)
    if Mp != M:
        keys = jnp.concatenate(
            [keys, jnp.full((Mp - M,), n_windows * nbuck, jnp.uint32)])
        idx = jnp.concatenate([idx, jnp.zeros((Mp - M,), jnp.uint32)])
    return lax.sort((keys, idx), num_keys=1)


@jax.jit
def stage_gather(points_aff, keys_s, idx_s):
    idx2 = idx_s.reshape(width, rows).T
    p = tuple(jnp.take(points_aff[i], idx2.astype(jnp.int32), axis=-1)
              for i in range(3))
    key2 = keys_s.reshape(width, rows).T
    isz = (key2 % nbuck == 0) | (key2 >= n_windows * nbuck)
    return (jnp.moveaxis(p[0], 1, 0), jnp.moveaxis(p[1], 1, 0), p[2] | isz)


@jax.jit
def stage_scan(xs):
    def row_step(acc, inp):
        acc = G1.add_mixed(acc, inp)
        return acc, acc
    lane_tot, ys = lax.scan(row_step, G1.inf_jac((width,)), xs)
    return lane_tot, ys


@jax.jit
def stage_tail(keys_s, lane_tot, ys):
    curve = G1
    ns = 1
    lane_incl = lane_tot
    shift = 1
    infp = curve.inf_jac((width,))
    while shift < width:
        shifted = tuple(jnp.concatenate(
            [lax.slice_in_dim(ip, 0, shift, axis=ns),
             lax.slice_in_dim(li, 0, width - shift, axis=ns)], axis=ns)
            for ip, li in zip(infp, lane_incl))
        lane_incl = curve.add(lane_incl, shifted)
        shift *= 2
    inf1 = curve.inf_jac((1,))
    lane_excl = tuple(
        jnp.concatenate([i0, lax.slice_in_dim(li, 0, width - 1, axis=ns)],
                        axis=ns) for i0, li in zip(inf1, lane_incl))

    def g_at(pos, valid):
        lane = (pos // rows).astype(jnp.int32)
        row = (pos % rows).astype(jnp.int32)
        flat = row * width + lane
        ysf = tuple(jnp.moveaxis(y, 0, -2).reshape(
            y.shape[1:2] + (rows * width,)) for y in ys)
        p_local = tuple(jnp.take(l, flat, axis=-1) for l in ysf)
        p_lane = tuple(jnp.take(l, lane, axis=-1) for l in lane_excl)
        g = curve.add(p_lane, p_local)
        return tuple(jnp.where(valid[None], x, y)
                     for x, y in zip(g, curve.inf_jac(pos.shape)))

    t_ends = (jnp.arange(n_windows, dtype=jnp.uint32) + 1) * nbuck
    t_starts = (jnp.arange(n_windows, dtype=jnp.uint32)[:, None] * nbuck
                + jnp.arange(1, nbuck, dtype=jnp.uint32)[None, :])
    tgts = jnp.concatenate([t_ends, t_starts.reshape(-1)])
    pos = jnp.searchsorted(keys_s, tgts).astype(jnp.int32)
    u_all = g_at(jnp.maximum(pos - 1, 0), pos > 0)
    u_end = tuple(l[..., :n_windows] for l in u_all)
    u_starts = tuple(
        l[..., n_windows:].reshape(l.shape[:-1] + (n_windows, nbuck - 1))
        for l in u_all)
    diffs = curve.add(
        tuple(jnp.broadcast_to(l[..., :, None], l.shape + (nbuck - 1,))
              for l in u_end),
        curve.neg(u_starts, k=32))
    wsums = curve.sum_reduce(diffs, axis=1)

    def win_step(acc, k_rev):
        for _ in range(window):
            acc = curve.double(acc)
        wk = jax.tree_util.tree_map(
            lambda l: jnp.take(l, k_rev, axis=curve.ns), wsums)
        return curve.add(acc, wk), None

    acc, _ = lax.scan(win_step, curve.inf_jac(()),
                      jnp.arange(n_windows - 1, -1, -1))
    return acc


keys_s, idx_s = timed("sort", stage_sort, scal)
xs = timed("gather+transpose", stage_gather, pts, keys_s, idx_s)
lt_ys = timed("scan(rows=%d)" % rows, stage_scan, xs)
out = timed("tail(prefix+extract+win)", stage_tail, keys_s, *lt_ys)
print("total pts/s at fused ~", flush=True)
