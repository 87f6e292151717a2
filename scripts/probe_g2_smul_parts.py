"""Bisect INSIDE G2.scalar_mul: which sub-part diverges on TPU?

Parts: table-build scan, digit extraction, one-hot select (no scan),
doubles-only scan, single body iteration, 4-window mini scan.
GS_PALLAS=0; TPU vs in-process CPU on identical inputs.
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


def main():
    ks = [rng.randrange(1, O.R) for _ in range(BATCH)]
    g = g2_affine_from_ints([(C.G2_GEN_X, C.G2_GEN_Y)] * BATCH)
    s = jnp.asarray(ints_to_limbs(ks, FR.n))

    checks = [
        ("table_build", lambda g: build_table(g), (g,)),
        ("digits", lambda s: digits(s), (s,)),
        ("onehot_sel_d7", lambda g, s: onehot_select(
            build_table(g), digits(s)[7]), (g, s)),
        ("body_once", lambda g, s: _body_once(g, s), (g, s)),
        ("scan4", lambda g, s: _scan_n(g, s, 4), (g, s)),
        ("scan16", lambda g, s: _scan_n(g, s, 16), (g, s)),
        ("scan64", lambda g, s: _scan_n(g, s, 64), (g, s)),
    ]

    def _body_once(g_, s_):
        table = build_table(g_)
        dig = digits(s_)[0]
        acc = G2.inf_jac((BATCH,))
        for _ in range(WINDOW):
            acc = G2.double(acc)
        sel = onehot_select(table, dig)
        return G2.add(acc, sel)

    def _scan_n(g_, s_, n):
        table = build_table(g_)
        digs = digits(s_)[:n]

        def body(acc, dig):
            for _ in range(WINDOW):
                acc = G2.double(acc)
            sel = onehot_select(table, dig)
            return G2.add(acc, sel), None

        out, _ = lax.scan(body, G2.inf_jac((BATCH,)), digs)
        return out

    first_bad = None
    for name, fn, args in checks:
        da, ca = both(fn, *args)
        if not report(name, da, ca) and first_bad is None:
            first_bad = name
    print("FIRST-BAD:", first_bad, flush=True)


if __name__ == "__main__":
    main()
