"""Is it lax.scan? Same 4-iteration window body: python-unrolled vs
lax.scan vs scan(unroll=2/4), plus a doubles-only scan body.
GS_PALLAS=0; TPU vs in-process CPU.
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


def body(table, acc, dig):
    for _ in range(WINDOW):
        acc = G2.double(acc)
    return G2.add(acc, onehot_select(table, dig))


def main():
    ks = [rng.randrange(1, O.R) for _ in range(BATCH)]
    g = g2_affine_from_ints([(C.G2_GEN_X, C.G2_GEN_Y)] * BATCH)
    s = jnp.asarray(ints_to_limbs(ks, FR.n))

    def unrolled4(g_, s_):
        table = build_table(g_)
        digs = digits(s_)[:4]
        acc = G2.inf_jac((BATCH,))
        for k in range(4):
            acc = body(table, acc, digs[k])
        return acc

    def scan4(g_, s_, unroll):
        table = build_table(g_)
        digs = digits(s_)[:4]

        def b(acc, dig):
            return body(table, acc, dig), None

        out, _ = lax.scan(b, G2.inf_jac((BATCH,)), digs, unroll=unroll)
        return out

    def scan4_doubles(g_, s_):
        del s_
        acc = G2.from_affine(g_)

        def b(acc, _):
            for _ in range(WINDOW):
                acc = G2.double(acc)
            return acc, None

        out, _ = lax.scan(b, acc, None, length=4)
        return out

    def scan4_addsel(g_, s_):
        """No doubles: scan of add(acc, onehot_select)."""
        table = build_table(g_)
        digs = digits(s_)[:4]

        def b(acc, dig):
            return G2.add(acc, onehot_select(table, dig)), None

        out, _ = lax.scan(b, G2.from_affine(g_), digs)
        return out

    checks = [
        ("unrolled4", unrolled4, (g, s)),
        ("scan4_doubles", scan4_doubles, (g, s)),
        ("scan4_addsel", scan4_addsel, (g, s)),
        ("scan4_u1", lambda a, b_: scan4(a, b_, 1), (g, s)),
        ("scan4_u2", lambda a, b_: scan4(a, b_, 2), (g, s)),
        ("scan4_u4", lambda a, b_: scan4(a, b_, 4), (g, s)),
    ]
    for name, fn, args in checks:
        da, ca = both(fn, *args)
        report(name, da, ca)


if __name__ == "__main__":
    main()
