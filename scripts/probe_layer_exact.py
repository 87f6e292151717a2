"""Layer-by-layer bit-exactness vs HOST big-int math, on the default backend.

Climbs the stack until the first wrong layer:
  u32   raw uint32 mul/shift/mask semantics
  fq    FQ.mul / add / sub (Montgomery, vs Python ints)
  fr    FR.mul
  fq2   FQ2.mul
  fq12  FQ12.mul, cyclotomic sqr
  g1    G1 scalar_mul + to_affine vs oracle
  g2    G2 scalar_mul + to_affine vs oracle
  miller  miller_loop (single pair, gens) vs oracle
  fexp  final_exp vs oracle
Usage: python scripts/probe_layer_exact.py [GS_PALLAS=0|1 via env]
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

print("backend:", jax.default_backend(), flush=True)

_pyrng = random.Random(11)


def randint(lo, hi):
    return _pyrng.randrange(lo, hi)

from groth_sahai_tpu.ops import pallas_fp
from groth_sahai_tpu.ops.fp import FQ, FR
from groth_sahai_tpu.ops.limbs import ints_to_limbs, limbs_to_ints

rng = np.random.default_rng(11)


def report(name, ok, detail=""):
    print(f"  {name:24s} {'OK' if ok else 'FAIL'} {detail}", flush=True)
    return ok


def check_u32():
    x = jnp.asarray(rng.integers(0, 1 << 32, size=256, dtype=np.uint32))
    y = jnp.asarray(rng.integers(0, 1 << 32, size=256, dtype=np.uint32))
    got = np.asarray(jax.jit(lambda a, b: (a * b, a >> 16, (a * b) & jnp.uint32(0xFFFF)))(x, y))
    xs = np.asarray(x).astype(object)
    ys = np.asarray(y).astype(object)
    ok = report("u32.mul-wrap", bool((got[0] == ((xs * ys) % (1 << 32)).astype(np.uint64).astype(np.uint32)).all()))
    ok &= report("u32.shr", bool((got[1] == (np.asarray(x) >> 16)).all()))
    ok &= report("u32.mul-mask", bool((got[2] == ((xs * ys) % (1 << 16)).astype(np.uint64).astype(np.uint32)).all()))
    return ok


def check_field(field, name, batch=64):
    vals_a = [randint(0, field.p) for _ in range(batch)]
    vals_b = [randint(0, field.p) for _ in range(batch)]
    a = jax.jit(field.to_mont)(jnp.asarray(ints_to_limbs(vals_a, field.n)))
    b = jax.jit(field.to_mont)(jnp.asarray(ints_to_limbs(vals_b, field.n)))
    got = field.to_ints(jax.jit(field.mul)(a, b))
    want = [(x * y) % field.p for x, y in zip(vals_a, vals_b)]
    ok = report(f"{name}.mul", got == want)
    got = field.to_ints(jax.jit(field.add)(a, b))
    want = [(x + y) % field.p for x, y in zip(vals_a, vals_b)]
    ok &= report(f"{name}.add", got == want)
    got = field.to_ints(jax.jit(lambda a, b: field.sub(a, b))(a, b))
    want = [(x - y) % field.p for x, y in zip(vals_a, vals_b)]
    ok &= report(f"{name}.sub", got == want)
    # chained muls (redundant-bound stress): ((a*b)+(a*b))*b
    f = jax.jit(lambda a, b: field.mul(field.add(field.mul(a, b), field.mul(a, b)), b))
    got = field.to_ints(f(a, b))
    want = [(2 * x * y * y) % field.p for x, y in zip(vals_a, vals_b)]
    ok &= report(f"{name}.chain", got == want)
    return ok


def check_fq2(batch=32):
    from groth_sahai_tpu.ops.tower import FQ2
    from tests import oracle as O
    av = [[randint(0, FQ.p) for _ in range(2)] for _ in range(batch)]
    bv = [[randint(0, FQ.p) for _ in range(2)] for _ in range(batch)]
    a = jnp.stack([jax.jit(FQ.to_mont)(jnp.asarray(ints_to_limbs(x, FQ.n))) for x in av], -1)
    b = jnp.stack([jax.jit(FQ.to_mont)(jnp.asarray(ints_to_limbs(x, FQ.n))) for x in bv], -1)
    got = FQ.to_ints(jax.jit(FQ2.mul)(a, b))   # (nl, 2, batch) -> flat c-order
    ok = True
    for i in range(batch):
        pa = O.Fq2([O.Fq(av[i][0]), O.Fq(av[i][1])])
        pb = O.Fq2([O.Fq(bv[i][0]), O.Fq(bv[i][1])])
        pc = pa * pb
        if got[0 * batch + i] != pc.c[0].v or got[1 * batch + i] != pc.c[1].v:
            ok = False
            break
    return report("fq2.mul", ok)


def check_fq12(batch=8):
    from groth_sahai_tpu.ops.tower import FQ12
    from tests import oracle as O
    from tests.test_gs_e2e import dev_gt
    from tests.test_tower import fq12_vals
    e0 = O.pairing(O.G1_GEN, O.G2_GEN)
    e2 = e0 * e0
    a = dev_gt(e0)
    got = FQ12.to_ints(jax.jit(FQ12.mul)(a, a))[0]
    want = tuple(tuple((c.c[0].v, c.c[1].v) for c in h.c) for h in e2.c)
    ok = report("fq12.mul", got == want)
    got = FQ12.to_ints(jax.jit(FQ12.sqr)(a))[0]
    ok &= report("fq12.sqr", got == want)
    cs = FQ12.cyclotomic_sqr if hasattr(FQ12, "cyclotomic_sqr") else None
    if cs is not None:
        got = FQ12.to_ints(jax.jit(cs)(a))[0]
        ok &= report("fq12.cyc_sqr", got == want)
    return ok


def check_curve(which, batch=8):
    from groth_sahai_tpu.ops.curve import (G1, G2, g1_affine_from_ints,
                                           g2_affine_from_ints,
                                           g1_affine_to_ints,
                                           g2_affine_to_ints)
    from groth_sahai_tpu.ops import bls12_381 as C
    from groth_sahai_tpu.ops.fp import FR
    from tests import oracle as O
    del which
    # One combined jit with the exact structure of bench.py's `setup`
    # (same HLO -> hits the persistent cache the bench run populated).
    ks1 = [randint(1, FR.p) for _ in range(batch)]
    ks2 = [randint(1, FR.p) for _ in range(batch)]
    s1 = jnp.asarray(ints_to_limbs(ks1, FR.n))
    s2 = jnp.asarray(ints_to_limbs(ks2, FR.n))
    g1 = g1_affine_from_ints([(C.G1_GEN_X, C.G1_GEN_Y)] * batch)
    g2 = g2_affine_from_ints([(C.G2_GEN_X, C.G2_GEN_Y)] * batch)
    setup = jax.jit(lambda g1, g2, s1, s2: (
        G1.to_affine(G1.scalar_mul(g1, s1)),
        G2.to_affine(G2.scalar_mul(g2, s2))))
    o1, o2 = setup(g1, g2, s1, s2)
    got1 = g1_affine_to_ints(o1)
    want1 = [O.g1_mul(O.G1_GEN, k) for k in ks1]
    want1 = [(p[0].v, p[1].v) for p in want1]
    ok = report("g1.smul", got1 == want1)
    got2 = g2_affine_to_ints(o2)
    want2 = [O.g2_mul(O.G2_GEN, k) for k in ks2]
    want2 = [(tuple(c.v for c in p[0].c), tuple(c.v for c in p[1].c))
             for p in want2]
    ok &= report("g2.smul", got2 == want2)
    return ok


def check_pairing(stage, batch=8):
    from groth_sahai_tpu.ops import pairing as pr
    from groth_sahai_tpu.ops.curve import g1_affine_from_ints, g2_affine_from_ints
    from groth_sahai_tpu.ops.tower import FQ12
    from groth_sahai_tpu.ops import bls12_381 as C
    from tests import oracle as O
    g1 = g1_affine_from_ints([(C.G1_GEN_X, C.G1_GEN_Y)] * batch)
    g2 = g2_affine_from_ints([(C.G2_GEN_X, C.G2_GEN_Y)] * batch)
    if stage == "miller":
        # Miller values are algorithm-specific pre-final-exp; compare the
        # SAME code on the default backend vs the in-process CPU backend.
        out = np.asarray(jax.jit(pr.miller_loop)(g1, g2))
        with jax.default_device(jax.devices("cpu")[0]):
            ref = np.asarray(jax.jit(pr.miller_loop)(
                jax.device_put(g1, jax.devices("cpu")[0]),
                jax.device_put(g2, jax.devices("cpu")[0])))
        return report("miller(dev==cpu)", bool((out == ref).all()))
    out = jax.jit(pr.pairing)(g1, g2)
    got = FQ12.to_ints(out[..., 0])[0]
    eo = O.pairing(O.G1_GEN, O.G2_GEN)
    want = tuple(tuple((c.c[0].v, c.c[1].v) for c in h.c) for h in eo.c)
    return report("pairing", got == want)


if __name__ == "__main__":
    stages = sys.argv[1:] or ["u32", "fq", "fr", "fq2", "fq12", "g1", "g2",
                              "miller", "fexp"]
    print("GS_PALLAS:", os.environ.get("GS_PALLAS", "auto"),
          "enabled:", pallas_fp.enabled(), flush=True)
    ok = True
    for s in stages:
        if s == "u32":
            ok &= check_u32()
        elif s == "fq":
            ok &= check_field(FQ, "fq")
        elif s == "fr":
            ok &= check_field(FR, "fr")
        elif s == "fq2":
            ok &= check_fq2()
        elif s == "fq12":
            ok &= check_fq12()
        elif s == "g1":
            ok &= check_curve("g1")
        elif s == "g2":
            ok &= check_curve("g2")
        elif s == "miller":
            ok &= check_pairing("miller")
        elif s == "fexp":
            ok &= check_pairing("fexp")
        if not ok:
            print("FIRST FAILURE AT:", s, flush=True)
            break
    print("ALL OK" if ok else "FAILURES PRESENT", flush=True)
