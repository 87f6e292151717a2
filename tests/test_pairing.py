"""Pairing tests: oracle conformance, bilinearity, multi-pairing, GT ops."""

import random

import jax
import jax.numpy as jnp
import numpy as np

from groth_sahai_tpu.ops.fp import FR
from groth_sahai_tpu.ops.limbs import ints_to_limbs
from groth_sahai_tpu.ops.curve import g1_affine_from_ints, g2_affine_from_ints
from groth_sahai_tpu.ops.pairing import (
    miller_loop, pairing, multi_pairing, final_exp, gt_mul, gt_exp, gt_eq)
from groth_sahai_tpu.ops.tower import FQ12

from . import oracle as O
from .test_tower import fq12_vals


def o_g1(pt):
    return None if pt is None else (pt[0].v, pt[1].v)


def o_g2(pt):
    if pt is None:
        return None
    return (tuple(c.v for c in pt[0].c), tuple(c.v for c in pt[1].c))


def test_pairing_vs_oracle():
    """e(aG1, bG2) matches the oracle bit-for-bit, incl. infinity pairs."""
    ka = [2, 1, 0, 5]
    kb = [3, 7, 3, 0]
    P = g1_affine_from_ints([o_g1(O.g1_mul(O.G1_GEN, k)) for k in ka])
    Q = g2_affine_from_ints([o_g2(O.g2_mul(O.G2_GEN, k)) for k in kb])
    got = FQ12.to_ints(jax.jit(pairing)(P, Q))
    want = [fq12_vals(O.pairing(O.g1_mul(O.G1_GEN, a), O.g2_mul(O.G2_GEN, b)))
            for a, b in zip(ka, kb)]
    assert got == want


def test_bilinearity():
    """e(aP, bQ) == e(P, Q)^(ab) computed fully on-device."""
    a, b = 6, 11
    P = g1_affine_from_ints([o_g1(O.g1_mul(O.G1_GEN, a)), o_g1(O.G1_GEN)])
    Q = g2_affine_from_ints([o_g2(O.g2_mul(O.G2_GEN, b)), o_g2(O.G2_GEN)])
    e = jax.jit(pairing)(P, Q)
    e_ab = (e[:, :, 0], e[:, :, 1])
    s = jnp.asarray(ints_to_limbs([a * b], FR.n))
    lhs = e_ab[0]
    rhs = jax.jit(gt_exp)(e_ab[1][:, :, None], s)[:, :, 0]
    assert bool(np.asarray(gt_eq(lhs, rhs)))


def test_multi_pairing_vs_product():
    """multi_pairing == product of individual pairings (one final exp)."""
    ka = [2, 3, 0, 7]
    kb = [5, 1, 4, 2]
    P = g1_affine_from_ints([o_g1(O.g1_mul(O.G1_GEN, k)) for k in ka])
    Q = g2_affine_from_ints([o_g2(O.g2_mul(O.G2_GEN, k)) for k in kb])
    got = FQ12.to_ints(jax.jit(lambda p, q: multi_pairing(p, q, axis=0))(P, Q)[:, :, None])
    o_prod = O.Fq12.one()
    for a, b in zip(ka, kb):
        o_prod = o_prod * O.pairing(O.g1_mul(O.G1_GEN, a), O.g2_mul(O.G2_GEN, b))
    assert got == [fq12_vals(o_prod)]
