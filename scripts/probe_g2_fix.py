"""Candidate workarounds for the XLA:TPU scan miscompile in scalar_mul.

The bug: a lax.scan whose body chains 4 G2.double calls THEN a
G2.add(one-hot select) computes wrong values on TPU (scan4_u1 FAIL in
probe_g2_scan.py) while each half alone, or the unrolled form, is exact.

Candidates:
  barrier  - lax.optimization_barrier between the double chain and the add
  fori     - lax.fori_loop with dynamic digit indexing instead of scan
  w8       - window body restructured as scan over PAIRS of windows
GS_PALLAS=0; compares vs in-process CPU AND the host oracle.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import random

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from groth_sahai_tpu.ops.curve import G2, g2_affine_from_ints
from groth_sahai_tpu.ops.fp import FR
from groth_sahai_tpu.ops.limbs import ints_to_limbs
from groth_sahai_tpu.ops import bls12_381 as C
from tests import oracle as O

CPU = jax.devices("cpu")[0]
rng = random.Random(5)
BATCH = 8
WINDOW = 4
NTAB = 1 << WINDOW


def both(fn, *args):
    out_dev = jax.jit(fn)(*args)
    cpu_args = jax.device_put(args, CPU)
    with jax.default_device(CPU):
        out_cpu = jax.jit(fn)(*cpu_args)
    return (jax.tree_util.tree_leaves(out_dev),
            jax.tree_util.tree_leaves(out_cpu))


def report(name, da, ca):
    ok = all(np.array_equal(np.asarray(x), np.asarray(y))
             for x, y in zip(da, ca))
    print(f"  {name:26s} {'OK' if ok else 'FAIL'}", flush=True)
    return ok


def build_table(p_affine):
    def tab_step(acc, _):
        acc = G2.add_mixed(acc, p_affine)
        return acc, acc

    p1 = G2.from_affine(p_affine)
    _, tail = lax.scan(tab_step, p1, None, length=NTAB - 2)
    batch = np.shape(p_affine[2])
    return jax.tree_util.tree_map(
        lambda z, o, t: jnp.moveaxis(
            jnp.concatenate([z[None], o[None], t], axis=0), 0, G2.ns),
        G2.inf_jac(batch), p1, tail)


def digits(scalar_limbs):
    nwin = 256 // WINDOW

    def digit_at(k):
        lo = k * WINDOW
        return (scalar_limbs[lo // 16] >> (lo % 16)) & (NTAB - 1)

    return jnp.stack([digit_at(nwin - 1 - k) for k in range(nwin)])


def onehot_select(table, dig):
    batch = dig.shape
    onehot = (jnp.arange(NTAB, dtype=jnp.uint32).reshape(
        (NTAB,) + (1,) * len(batch)) == dig[None]).astype(jnp.uint32)
    return jax.tree_util.tree_map(
        lambda l: (l * onehot.reshape(
            (1,) * G2.ns + onehot.shape)).sum(axis=G2.ns, dtype=jnp.uint32),
        table)


def smul_barrier(g_, s_, n=4):
    table = build_table(g_)
    digs = digits(s_)[:n]

    def b(acc, dig):
        for _ in range(WINDOW):
            acc = G2.double(acc)
        acc = lax.optimization_barrier(acc)
        return G2.add(acc, onehot_select(table, dig)), None

    out, _ = lax.scan(b, G2.inf_jac((BATCH,)), digs)
    return out


def smul_fori(g_, s_, n=4):
    table = build_table(g_)
    digs = digits(s_)[:n]

    def b(k, acc):
        for _ in range(WINDOW):
            acc = G2.double(acc)
        dig = lax.dynamic_index_in_dim(digs, k, 0, keepdims=False)
        return G2.add(acc, onehot_select(table, dig))

    return lax.fori_loop(0, n, b, G2.inf_jac((BATCH,)))


def unrolled_ref(g_, s_, n=4):
    table = build_table(g_)
    digs = digits(s_)[:n]
    acc = G2.inf_jac((BATCH,))
    for k in range(n):
        for _ in range(WINDOW):
            acc = G2.double(acc)
        acc = G2.add(acc, onehot_select(table, digs[k]))
    return acc


def main():
    ks = [rng.randrange(1, O.R) for _ in range(BATCH)]
    g = g2_affine_from_ints([(C.G2_GEN_X, C.G2_GEN_Y)] * BATCH)
    s = jnp.asarray(ints_to_limbs(ks, FR.n))

    results = {}
    for name, fn in [("barrier4", smul_barrier), ("fori4", smul_fori)]:
        da, ca = both(fn, g, s)
        results[name] = report(name, da, ca)
        # also compare against the unrolled reference ON DEVICE
        ref = jax.tree_util.tree_leaves(jax.jit(unrolled_ref)(g, s))
        okr = all(np.array_equal(np.asarray(x), np.asarray(y))
                  for x, y in zip(da, ref))
        print(f"    vs unrolled-on-device: {'OK' if okr else 'FAIL'}",
              flush=True)
    print(results, flush=True)


if __name__ == "__main__":
    main()
