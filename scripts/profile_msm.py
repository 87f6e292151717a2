#!/usr/bin/env python
"""Stage-level MSM profiling on the real chip (dev tool).

Mirrors ops/msm.py's pipeline stage by stage, each stage jitted separately
with host sync in between, so the 0.17 s/rep at N=2^16 (round 4) can be
attributed: sort+gather vs row scan vs lane prefix vs bucket tail vs
window combine.  Numbers feed the round-5 MSM optimization (VERDICT r4
"do this" #2).

Usage: python scripts/profile_msm.py [N [window]]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from groth_sahai_tpu.utils import cache as _cache
_cache.setup(jax)

from groth_sahai_tpu.ops import msm as M
from groth_sahai_tpu.ops import proj as PJ
from groth_sahai_tpu.ops import pallas_curve as PC
from groth_sahai_tpu.ops.curve import G1, g1_affine_from_ints
from groth_sahai_tpu.ops.fp import FR
from groth_sahai_tpu.ops.limbs import ints_to_limbs
from groth_sahai_tpu.ops import bls12_381 as C
from groth_sahai_tpu.utils.rng import GsRng


def sync(x):
    # blocking one-round-trip probe (benches/timing.py): block_until_ready
    # is untrustworthy through the tunnel, and per-leaf fetches pay the
    # ~23 ms RPC floor once per leaf
    from benches.timing import probe_fetch
    probe_fetch(x)
    return x


def timeit(fn, *args, reps=3, name=""):
    out = sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:24s} {min(ts)*1e3:9.2f} ms")
    return out


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16
    window = int(sys.argv[2]) if len(sys.argv) > 2 else 13
    rng = GsRng(7)

    # cheap input points: (a_i + b_j) G via one small scalar-mul + one add
    nA = 1 << ((N.bit_length()) // 2)
    nB = N // nA
    ab = rng.fr_ints(nA + nB)
    g1 = g1_affine_from_ints([(C.G1_GEN_X, C.G1_GEN_Y)] * (nA + nB))

    def expand(base, s):
        aff = G1.to_affine(G1.scalar_mul(base, s))
        A = tuple(l[..., :nA] for l in aff)
        B = tuple(l[..., nA:] for l in aff)
        Ap = PJ.from_affine(G1, A)
        Apb = tuple(jnp.broadcast_to(l[..., :, None], l.shape + (nB,))
                    .reshape(l.shape[:-1] + (N,)) for l in Ap)
        Bb = tuple(jnp.broadcast_to(l[..., None, :], l.shape[:-1] + (nA, nB))
                   .reshape(l.shape[:-1] + (N,)) for l in B)
        return PJ.to_affine(G1, PJ.madd(G1, Apb, Bb))

    pts = sync(jax.jit(expand)(g1, jnp.asarray(ints_to_limbs(ab, FR.n))))
    scal = jnp.asarray(ints_to_limbs(rng.fr_ints(N), FR.n))

    n_windows = -(-M.NBITS // window)
    nbuck = (1 << (window - 1)) + 1     # signed-digit bucket domain
    Mtot = N * n_windows
    width = M._pick_width(Mtot, None)
    rows = -(-Mtot // width)
    Mp = rows * width
    print(f"N={N} w={window} W={n_windows} width={width} rows={rows}")

    # ---- stage 1-2: digits + sort ----------------------------------------
    def s12(scal):
        digs = M._digits(scal, window)
        idxN = jnp.broadcast_to(jnp.arange(N, dtype=jnp.uint32)[None, :],
                                (n_windows, N))
        digs_s, idx_sw = lax.sort((digs, idxN), num_keys=1)
        win_ix = jnp.arange(n_windows, dtype=jnp.uint32)[:, None]
        keys_s = (digs_s + win_ix * nbuck).reshape(Mtot)
        idx_s = idx_sw.reshape(Mtot)
        if Mp != Mtot:
            keys_s = jnp.concatenate(
                [keys_s, jnp.full((Mp - Mtot,), n_windows * nbuck,
                                  jnp.uint32)])
            idx_s = jnp.concatenate([idx_s, jnp.zeros((Mp - Mtot,),
                                                      jnp.uint32)])
        return keys_s, idx_s

    keys_s, idx_s = timeit(jax.jit(s12), scal, name="digits+sort")

    # ---- stage 3: gather --------------------------------------------------
    def s3(pts, idx_s, keys_s):
        idx2 = idx_s.reshape(width, rows).T
        p = M._take_batch(G1, pts, idx2.astype(jnp.int32))
        key2 = keys_s.reshape(width, rows).T
        isz = (key2 % nbuck == 0) | (key2 >= n_windows * nbuck)
        return (p[0], p[1], p[2] | isz)

    spts = timeit(jax.jit(s3), pts, idx_s, keys_s, name="gather")

    # ---- stage 4: row scan ------------------------------------------------
    scan = timeit(jax.jit(lambda p: PC.cmsm_row_scan(G1, p)), spts,
                  name="row scan")
    lane_tot, ys_raw = scan

    # ---- stage 5+6+7: everything after the scan ---------------------------
    # (run full msm minus the above by timing full and subtracting; plus
    # time the diffs/fold tail explicitly at its natural shapes)
    full = timeit(jax.jit(lambda p, s: M.msm(G1, p, s, window=window)),
                  pts, scal, name="FULL msm")

    # tail probe: one complete add at the diffs shape and at the g_at shape
    Q = n_windows * (nbuck - 1) + n_windows
    for lanes, nm in ((Q, "cadd @ g_at lanes"),
                      (n_windows * nbuck, "cadd @ diffs lanes"),
                      (width, "cadd @ width")):
        a = PJ.inf(G1, (lanes,))
        timeit(jax.jit(lambda x: PC.cadd(x, x, curve=G1)), a,
               name=f"{nm} ({lanes})")

    # isolated g_at-style gather: Q (row, lane) pairs out of the raw
    # prefix stream (rows, cr, width) -- minor-axis gather, suspect slow
    rng2 = np.random.default_rng(0)
    rr = jnp.asarray(rng2.integers(0, rows, Q, dtype=np.int32))
    ll = jnp.asarray(rng2.integers(0, width, Q, dtype=np.int32))

    def gat(ys, rr, ll):
        outs = []
        for yr in ys:
            g = jax.vmap(lambda r, l: yr[r, :, l])(rr, ll)   # (Q, cr)
            outs.append(g.T)
        return outs

    timeit(jax.jit(gat), ys_raw, rr, ll, name=f"g_at gather ({Q})")


if __name__ == "__main__":
    main()
