"""Bisect the G2 scalar-mul TPU/CPU divergence op by op.

Runs each G2 curve primitive on the default backend (TPU) and the
in-process CPU backend on IDENTICAL inputs; reports first mismatch.
Run with GS_PALLAS=0 so both backends execute the same pure-JAX code.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import random

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from groth_sahai_tpu.ops.curve import G2, g2_affine_from_ints
from groth_sahai_tpu.ops.fp import FR, FQ
from groth_sahai_tpu.ops.limbs import ints_to_limbs
from groth_sahai_tpu.ops import bls12_381 as C
from tests import oracle as O

CPU = jax.devices("cpu")[0]
rng = random.Random(5)
BATCH = 8


def both(fn, *args):
    """Run jit(fn) on default backend and on CPU; return (dev, cpu)."""
    out_dev = jax.jit(fn)(*args)
    cpu_args = jax.device_put(args, CPU)
    with jax.default_device(CPU):
        out_cpu = jax.jit(fn)(*cpu_args)
    da = jax.tree_util.tree_leaves(out_dev)
    ca = jax.tree_util.tree_leaves(out_cpu)
    return da, ca


def report(name, da, ca):
    ok = all(np.array_equal(np.asarray(x), np.asarray(y))
             for x, y in zip(da, ca))
    print(f"  {name:26s} {'OK' if ok else 'FAIL'}", flush=True)
    if not ok:
        for i, (x, y) in enumerate(zip(da, ca)):
            x, y = np.asarray(x), np.asarray(y)
            if not np.array_equal(x, y):
                idx = np.argwhere(x != y)
                print(f"    leaf {i}: {len(idx)} diffs, first at {idx[0]}",
                      f"dev={x[tuple(idx[0])]} cpu={y[tuple(idx[0])]}",
                      flush=True)
    return ok


def main():
    ks = [rng.randrange(1, O.R) for _ in range(BATCH)]
    g = g2_affine_from_ints([(C.G2_GEN_X, C.G2_GEN_Y)] * BATCH)
    s = jnp.asarray(ints_to_limbs(ks, FR.n))
    gj = jax.jit(G2.from_affine)(g)

    checks = [
        ("from_affine", lambda g: G2.from_affine(g), (g,)),
        ("double", lambda p: G2.double(p), (gj,)),
        ("double^4", lambda p: G2.double(G2.double(G2.double(G2.double(p)))),
         (gj,)),
        ("add_mixed", lambda p, a: G2.add_mixed(G2.double(p), a), (gj, g)),
        ("add", lambda p, q: G2.add(G2.double(p), G2.double(G2.double(q))),
         (gj, gj)),
        ("to_affine", lambda p: G2.to_affine(G2.double(p)), (gj,)),
        ("smul_w4", lambda g, s: G2.scalar_mul(g, s), (g, s)),
    ]
    first_bad = None
    for name, fn, args in checks:
        da, ca = both(fn, *args)
        if not report(name, da, ca) and first_bad is None:
            first_bad = name
    print("FIRST-BAD:", first_bad, flush=True)


if __name__ == "__main__":
    main()
