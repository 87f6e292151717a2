"""Complete projective group law (ops/proj.py) vs the python oracle.

Covers the full exceptional-case matrix the RCB16 completeness claim
makes: generic adds, doubling inputs (P + P), inverse pairs (P + (-P)),
and infinity on either/both sides -- for BOTH curves.  This is the law
the MSM/commit/scalar-mul hot paths run on (ops/msm.py, curve.scalar_mul),
so these are the pure-JAX twin-path assertions in the spirit of the
reference's sequential-vs-rayon tests
(/root/reference/src/data_structures.rs:1837-1947).
"""

import random

import jax
import pytest

from groth_sahai_tpu.ops.curve import (G1, G2, g1_affine_from_ints,
                                       g2_affine_from_ints,
                                       g1_affine_to_ints, g2_affine_to_ints)
from groth_sahai_tpu.ops import proj as PJ
from groth_sahai_tpu.utils import hostcrypto as HC
from groth_sahai_tpu.ops import bls12_381 as C


def _cases(mulf, addf, negf, gen):
    rng = random.Random(42)
    ks = [1, 2, 3, 5, HC.R - 1, rng.randrange(HC.R), rng.randrange(HC.R)]
    pts = [mulf(gen, k) for k in ks]
    cases, exp = [], []
    for i in range(len(pts)):
        for j in [0, i, (i + 3) % len(pts)]:   # generic, doubling, generic
            cases.append((pts[i], pts[j]))
            exp.append(addf(pts[i], pts[j]))
    cases.append((pts[0], negf(pts[0])))
    exp.append(None)                           # P + (-P) = infinity
    cases.append((None, pts[1])); exp.append(pts[1])
    cases.append((pts[1], None)); exp.append(pts[1])
    cases.append((None, None)); exp.append(None)
    return cases, exp


PARAMS = [
    (G1, HC.g1_mul, HC.g1_add, HC.g1_neg, (C.G1_GEN_X, C.G1_GEN_Y),
     g1_affine_from_ints, g1_affine_to_ints),
    (G2, HC.g2_mul, HC.g2_add, HC.g2_neg, (C.G2_GEN_X, C.G2_GEN_Y),
     g2_affine_from_ints, g2_affine_to_ints),
]


@pytest.mark.parametrize("curve,mulf,addf,negf,gen,fi,ti", PARAMS,
                         ids=["G1", "G2"])
def test_complete_law_vs_oracle(curve, mulf, addf, negf, gen, fi, ti):
    cases, exp = _cases(mulf, addf, negf, gen)
    A = fi([c[0] for c in cases])
    B = fi([c[1] for c in cases])
    Pp = PJ.from_affine(curve, A)
    Qp = PJ.from_affine(curve, B)

    got_add = ti(jax.jit(
        lambda p, q: PJ.to_affine(curve, PJ.add(curve, p, q)))(Pp, Qp))
    assert got_add == exp

    got_madd = ti(jax.jit(
        lambda p, b: PJ.to_affine(curve, PJ.madd(curve, p, b)))(Pp, B))
    assert got_madd == exp

    got_dbl = ti(jax.jit(
        lambda p: PJ.to_affine(curve, PJ.dbl(curve, p)))(Pp))
    assert got_dbl == [addf(c[0], c[0]) for c in cases]

    # projective -> Jacobian conversion round-trips through the Jacobian
    # to_affine used by the MSM/scalar-mul output path
    got_jac = ti(jax.jit(
        lambda p: curve.to_affine(PJ.to_jacobian(
            curve, PJ.add(curve, p, p))))(Pp))
    assert got_jac == [addf(c[0], c[0]) for c in cases]
