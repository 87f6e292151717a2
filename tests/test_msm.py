"""Pippenger MSM tests vs the naive oracle computation."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from groth_sahai_tpu.ops.fp import FR
from groth_sahai_tpu.ops.limbs import ints_to_limbs
from groth_sahai_tpu.ops.curve import G1, G2, g1_affine_from_ints, \
    g2_affine_from_ints, g1_affine_to_ints
from groth_sahai_tpu.ops import msm as msm_mod

from . import oracle as O


def o_g1(pt):
    return None if pt is None else (pt[0].v, pt[1].v)


def test_msm_g1_small():
    rng = random.Random(31)
    N = 32
    ks = [rng.randrange(200) for _ in range(N)]
    ss = [rng.randrange(O.R) for _ in range(N)]
    ss[3] = 0                      # zero scalar
    pts_o = [O.g1_mul(O.G1_GEN, k) for k in ks]   # incl k=0 -> infinity? no
    pts_o[5] = None                # infinity point in the mix
    pts = g1_affine_from_ints([o_g1(p) for p in pts_o])
    scal = jnp.asarray(ints_to_limbs(ss, FR.n))

    out = jax.jit(lambda p, s: msm_mod.msm(G1, p, s, window=4, lanes=8))(
        pts, scal)
    got = g1_affine_to_ints(jax.jit(G1.to_affine)(
        jax.tree_util.tree_map(lambda l: l[..., None], out)))

    want = None
    for p, s in zip(pts_o, ss):
        if p is not None:
            want = O.g1_add(want, O.g1_mul(p, s))
    assert got == [o_g1(want)]


def test_msm_matches_naive_window8():
    rng = random.Random(32)
    N = 16
    ks = [rng.randrange(1, 50) for _ in range(N)]
    ss = [rng.randrange(O.R) for _ in range(N)]
    pts_o = [O.g1_mul(O.G1_GEN, k) for k in ks]
    pts = g1_affine_from_ints([o_g1(p) for p in pts_o])
    scal = jnp.asarray(ints_to_limbs(ss, FR.n))

    out = jax.jit(lambda p, s: msm_mod.msm(G1, p, s, window=8, lanes=4))(
        pts, scal)
    naive = jax.jit(G1.msm_naive)(pts, scal)
    assert bool(np.asarray(jax.jit(G1.eq_jac)(out, naive)))
