"""On-chip bit-exactness probe: Pallas compiled vs pure-JAX, per primitive.

Runs on whatever the default backend is (TPU under the driver). Each check
compares the compiled Pallas kernel against the pure-JAX scan path (forced
via monkeypatching pallas_fp.enabled) on identical inputs, including
redundant-representation bounds (limbs exact 16-bit, values up to 2^8 * p).

Usage: python scripts/probe_tpu_exact.py [level]
  level 0 (default): field primitives (mul_wide / redc / mont_mul)
  level 1: + tower ops (Fq2/Fq6/Fq12 mul, cyclotomic sqr)
  level 2: + curve ops + single pairing vs host oracle
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

_pyrng = random.Random(7)

from groth_sahai_tpu.ops import pallas_fp
from groth_sahai_tpu.ops.fp import FQ, FR
from groth_sahai_tpu.ops.limbs import W, MASK

rng = np.random.default_rng(7)


def rand_elem(field, batch, bound_mult=1):
    """Random field element batch with value < bound_mult * p, exact limbs."""
    vals = [_pyrng.randrange(0, field.p) for _ in range(batch)]
    if bound_mult > 1:
        vals = [v + field.p * _pyrng.randrange(0, bound_mult - 1)
                for v in vals]
    from groth_sahai_tpu.ops.limbs import ints_to_limbs
    return jnp.asarray(ints_to_limbs(vals, field.n))


def force_mode(on: bool):
    pallas_fp._enabled = on


def check(name, got, want):
    g = np.asarray(got)
    w = np.asarray(want)
    ok = bool((g == w).all())
    n_bad = int((g != w).sum())
    print(f"  {name:28s} {'OK' if ok else f'FAIL ({n_bad} limbs differ)'}",
          flush=True)
    return ok


def level0(batch=1024):
    print(f"[level0] field primitives, batch={batch}, backend="
          f"{jax.default_backend()}", flush=True)
    all_ok = True
    for field in (FQ, FR):
        a = rand_elem(field, batch, bound_mult=200)
        b = rand_elem(field, batch, bound_mult=200)
        force_mode(False)
        mw_ref = jax.jit(field.mul_wide)(a, b)
        redc_ref = jax.jit(field.redc)(mw_ref)
        mm_ref = jax.jit(field._mont_mul)(a, b)
        force_mode(True)
        mw_pal = jax.jit(lambda a, b: pallas_fp.mul_wide(field, a, b))(a, b)
        redc_pal = jax.jit(lambda t: pallas_fp.redc(field, t))(mw_ref)
        mm_pal = jax.jit(lambda a, b: pallas_fp.mont_mul(field, a, b))(a, b)
        force_mode(False)
        all_ok &= check(f"{field.name}.mul_wide", mw_pal, mw_ref)
        all_ok &= check(f"{field.name}.redc", redc_pal, redc_ref)
        all_ok &= check(f"{field.name}.mont_mul", mm_pal, mm_ref)
        # odd batch size (padding path)
        a3 = a[:, : batch - 3]
        b3 = b[:, : batch - 3]
        force_mode(False)
        mm_ref3 = jax.jit(field._mont_mul)(a3, b3)
        force_mode(True)
        mm_pal3 = jax.jit(lambda a, b: pallas_fp.mont_mul(field, a, b))(a3, b3)
        force_mode(False)
        all_ok &= check(f"{field.name}.mont_mul(pad)", mm_pal3, mm_ref3)
    return all_ok


def level1(batch=256):
    from groth_sahai_tpu.ops.tower import FQ2, FQ6, FQ12
    print(f"[level1] tower ops, batch={batch}", flush=True)
    all_ok = True
    for name, F, shape in (("Fq2", FQ2, (2,)), ("Fq6", FQ6, (6,)),
                           ("Fq12", FQ12, (12,))):
        a = jnp.stack([rand_elem(FQ, batch) for _ in range(
            int(np.prod(shape)))], 1).reshape((FQ.n,) + shape + (batch,))
        b = jnp.stack([rand_elem(FQ, batch) for _ in range(
            int(np.prod(shape)))], 1).reshape((FQ.n,) + shape + (batch,))
        force_mode(False)
        ref = jax.jit(F.mul)(a, b)
        force_mode(True)
        pal = jax.jit(F.mul)(a, b)
        force_mode(False)
        all_ok &= check(f"{name}.mul", FQ.normalize(pal, k=4),
                        FQ.normalize(ref, k=4))
    force_mode(False)
    return all_ok


def level2(batch=8):
    from groth_sahai_tpu.ops import pairing as pr
    from groth_sahai_tpu.ops.curve import G1, G2, g1_affine_from_ints, \
        g2_affine_from_ints
    from groth_sahai_tpu.ops.tower import FQ12
    from groth_sahai_tpu.ops import bls12_381 as C
    from tests import oracle as O
    print(f"[level2] pairing vs host oracle, batch={batch}", flush=True)
    g1 = g1_affine_from_ints([(C.G1_GEN_X, C.G1_GEN_Y)] * batch)
    g2 = g2_affine_from_ints([(C.G2_GEN_X, C.G2_GEN_Y)] * batch)
    e0 = O.pairing(O.G1_GEN, O.G2_GEN)
    exp_t = tuple(tuple((c.c[0].v, c.c[1].v) for c in h.c) for h in e0.c)
    results = {}
    for mode in (False, True):
        force_mode(mode)
        out = jax.jit(pr.pairing)(g1, g2)
        got = FQ12.to_ints(out[..., 0])[0]
        results[mode] = got
        print(f"  pairing pallas={int(mode)}: "
              f"{'OK' if got == exp_t else 'FAIL'}", flush=True)
    force_mode(False)
    return results[False] == exp_t and results[True] == exp_t


if __name__ == "__main__":
    level = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    ok = level0()
    if level >= 1:
        ok &= level1()
    if level >= 2:
        ok &= level2()
    print("ALL OK" if ok else "FAILURES PRESENT", flush=True)
    sys.exit(0 if ok else 1)
