"""Curve group law tests vs oracle: G1 and G2, incl. exceptional cases.

Mirrors the group-law assertions of the reference's data-structure tests
(/root/reference/src/data_structures.rs:921-1060, zero handling :1313-1357).
"""

import random

import jax
import numpy as np
import pytest

from groth_sahai_tpu.ops.fp import FR
from groth_sahai_tpu.ops.limbs import ints_to_limbs
from groth_sahai_tpu.ops.curve import (
    G1, G2, g1_affine_from_ints, g2_affine_from_ints,
    g1_affine_to_ints, g2_affine_to_ints)

from . import oracle as O


def o_g1(pt):
    return None if pt is None else (pt[0].v, pt[1].v)


def o_g2(pt):
    if pt is None:
        return None
    return (tuple(c.v for c in pt[0].c), tuple(c.v for c in pt[1].c))


def scalars_dev(ks):
    return jax.numpy.asarray(ints_to_limbs([k % FR.p for k in ks], FR.n))


CASES = [2, 3, 5, 0, 7]  # scalar multiples of the generator; 0 = infinity


def make_g1_points(ks):
    pts = [O.g1_mul(O.G1_GEN, k) for k in ks]
    return g1_affine_from_ints([o_g1(p) for p in pts]), pts


def make_g2_points(ks):
    pts = [O.g2_mul(O.G2_GEN, k) for k in ks]
    return g2_affine_from_ints([o_g2(p) for p in pts]), pts


@pytest.mark.parametrize("curve,maker,o_add,o_mul,to_ints,o_conv", [
    (G1, make_g1_points, O.g1_add, O.g1_mul, g1_affine_to_ints, o_g1),
    (G2, make_g2_points, O.g2_add, O.g2_mul, g2_affine_to_ints, o_g2),
], ids=["G1", "G2"])
def test_add_double_batch(curve, maker, o_add, o_mul, to_ints, o_conv):
    ka = [2, 3, 5, 0, 7, 11, 4, 4]
    kb = [3, 3, 0, 5, 7, 13, 4, 100]   # incl. dbl case (3,3), (4,4), inf cases
    A, pa = maker(ka)
    B, pb = maker(kb)

    @jax.jit
    def run(A, B):
        ja, jb = curve.from_affine(A), curve.from_affine(B)
        s = curve.add(ja, jb)
        d = curve.double(ja)
        m = curve.add_mixed(ja, B)
        return (curve.to_affine(s), curve.to_affine(d), curve.to_affine(m))

    s, d, m = run(A, B)
    assert to_ints(s) == [o_conv(o_add(x, y)) for x, y in zip(pa, pb)]
    assert to_ints(d) == [o_conv(o_add(x, x)) for x in pa]
    assert to_ints(m) == [o_conv(o_add(x, y)) for x, y in zip(pa, pb)]


@pytest.mark.parametrize("curve,maker,o_mul,to_ints,o_conv,gen", [
    (G1, make_g1_points, O.g1_mul, g1_affine_to_ints, o_g1, O.G1_GEN),
    (G2, make_g2_points, O.g2_mul, g2_affine_to_ints, o_g2, O.G2_GEN),
], ids=["G1", "G2"])
def test_scalar_mul(curve, maker, o_mul, to_ints, o_conv, gen):
    rng = random.Random(21)
    base_ks = [1, 2, 0, 5]
    ks = [rng.randrange(O.R), 7, 9, O.R - 1]
    A, pa = maker(base_ks)
    S = scalars_dev(ks)

    @jax.jit
    def run(A, S):
        return curve.to_affine(curve.scalar_mul(A, S))

    got = to_ints(run(A, S))
    want = [o_conv(o_mul(p, k)) if p is not None else None
            for p, k in zip(pa, ks)]
    assert got == want


def test_on_curve_and_eq():
    A, _ = make_g1_points([2, 0, 3])
    assert np.asarray(G1.on_curve_affine(A)).all()
    B, _ = make_g2_points([5, 0, 1])
    assert np.asarray(G2.on_curve_affine(B)).all()
    # eq_affine
    C1, _ = make_g1_points([2, 0, 4])
    assert list(np.asarray(G1.eq_affine(A, C1))) == [True, True, False]


def test_sum_reduce():
    ks = [1, 2, 3, 4, 5, 0, 7]
    A, pa = make_g1_points(ks)

    @jax.jit
    def run(A):
        return G1.to_affine(G1.sum_reduce(G1.from_affine(A), axis=0))

    got = g1_affine_to_ints(run(A))
    want = O.g1_mul(O.G1_GEN, sum(ks))
    assert got == [o_g1(want)]
