"""Batch-512 on-chip conformance bisect (the bench shape).

Stages (each vs the host oracle, GS_PALLAS as set in env):
  g1smul512   G1.scalar_mul+to_affine at batch 512 (bench setup path)
  g2smul512   G2.scalar_mul+to_affine at batch 512
  pair512gen  pairing at batch 512 on GENERATOR inputs (no smul involved)
Checks entry 0 and entry 511 against the oracle.
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

from groth_sahai_tpu.ops.curve import (G1, G2, g1_affine_from_ints,
                                       g2_affine_from_ints,
                                       g1_affine_to_ints, g2_affine_to_ints)
from groth_sahai_tpu.ops.fp import FR
from groth_sahai_tpu.ops.limbs import ints_to_limbs
from groth_sahai_tpu.ops import bls12_381 as C
from groth_sahai_tpu.ops import pairing as pr
from groth_sahai_tpu.ops.tower import FQ12
from groth_sahai_tpu.ops import pallas_fp
from tests import oracle as O

rng = random.Random(31)
B = 512
print("backend:", jax.default_backend(), "pallas:", pallas_fp.enabled(),
      flush=True)

stages = sys.argv[1:] or ["g1smul512", "g2smul512", "pair512gen"]

ks1 = [rng.randrange(1, O.R) for _ in range(B)]
ks2 = [rng.randrange(1, O.R) for _ in range(B)]
s1 = jnp.asarray(ints_to_limbs(ks1, FR.n))
s2 = jnp.asarray(ints_to_limbs(ks2, FR.n))

if "g1smul512" in stages:
    g1 = g1_affine_from_ints([(C.G1_GEN_X, C.G1_GEN_Y)] * B)
    out = jax.jit(lambda g, s: G1.to_affine(G1.scalar_mul(g, s)))(g1, s1)
    got = g1_affine_to_ints(out)
    ok = True
    for i in (0, 1, 255, 511):
        e = O.g1_mul(O.G1_GEN, ks1[i])
        ok &= got[i] == (e[0].v, e[1].v)
    print(f"  g1smul512   {'OK' if ok else 'FAIL'}", flush=True)

if "g2smul512" in stages:
    g2 = g2_affine_from_ints([(C.G2_GEN_X, C.G2_GEN_Y)] * B)
    out = jax.jit(lambda g, s: G2.to_affine(G2.scalar_mul(g, s)))(g2, s2)
    got = g2_affine_to_ints(out)
    ok = True
    for i in (0, 1, 255, 511):
        e = O.g2_mul(O.G2_GEN, ks2[i])
        ok &= got[i] == (tuple(c.v for c in e[0].c),
                         tuple(c.v for c in e[1].c))
    print(f"  g2smul512   {'OK' if ok else 'FAIL'}", flush=True)

if "pair512gen" in stages:
    g1 = g1_affine_from_ints([(C.G1_GEN_X, C.G1_GEN_Y)] * B)
    g2 = g2_affine_from_ints([(C.G2_GEN_X, C.G2_GEN_Y)] * B)
    out = jax.jit(pr.pairing)(g1, g2)
    e0 = O.pairing(O.G1_GEN, O.G2_GEN)
    exp = tuple(tuple((c.c[0].v, c.c[1].v) for c in h.c) for h in e0.c)
    vals = FQ12.to_ints(out[..., jnp.asarray([0, 511])])
    ok = vals[0] == exp and vals[1] == exp
    print(f"  pair512gen  {'OK' if ok else 'FAIL'}", flush=True)
