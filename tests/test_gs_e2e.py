"""End-to-end GS prove -> verify for all four equation types.

Reproduces the reference's integration scenarios
(/root/reference/tests/prover.rs:24-172) with the same witness structure
(X = [2 g1, 3 g1], Y/y = [4 ...], Gamma = [[5], [0]], mixed zero/nonzero
constants), targets computed with the independent Python oracle.

Also adds NEGATIVE tests (tampered proofs / wrong targets must fail) --
absent in the reference (SURVEY.md section 4 flags that gap).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from groth_sahai_tpu.ops.fp import FQ, FR
from groth_sahai_tpu.ops.limbs import ints_to_limbs
from groth_sahai_tpu.ops.curve import (
    G1, G2, g1_affine_from_ints, g2_affine_from_ints)
from groth_sahai_tpu.ops.tower import FQ12
from groth_sahai_tpu.utils.rng import GsRng
from groth_sahai_tpu.models.crs import generate_crs
from groth_sahai_tpu.models.statement import PPE, MSMEG1, MSMEG2, QuadEqu
from groth_sahai_tpu.models.prover import commit_and_prove
from groth_sahai_tpu.models.verifier import verify

from . import oracle as O
from .test_tower import fq12_vals


# ---------------------------------------------------------------------------
# device <-> oracle helpers
# ---------------------------------------------------------------------------

def o_g1(pt):
    return None if pt is None else (pt[0].v, pt[1].v)


def o_g2(pt):
    if pt is None:
        return None
    return (tuple(c.v for c in pt[0].c), tuple(c.v for c in pt[1].c))


def dev_g1(pts):
    return g1_affine_from_ints([o_g1(p) for p in pts])


def dev_g2(pts):
    return g2_affine_from_ints([o_g2(p) for p in pts])


def dev_fr(vals):
    return jnp.asarray(ints_to_limbs([v % FR.p for v in vals], FR.n))


def aff_to_oracle_g1(a):
    if bool(np.asarray(a[2])):
        return None
    return (O.Fq(FQ.to_ints(a[0])[0]), O.Fq(FQ.to_ints(a[1])[0]))


def aff_to_oracle_g2(a):
    if bool(np.asarray(a[2])):
        return None
    xv = FQ.to_ints(a[0].reshape(FQ.n, 2))
    yv = FQ.to_ints(a[1].reshape(FQ.n, 2))
    return (O.Fq2([O.Fq(xv[0]), O.Fq(xv[1])]),
            O.Fq2([O.Fq(yv[0]), O.Fq(yv[1])]))


def dev_gt(o12):
    return FQ12.from_ints([fq12_vals(o12)])[:, :, 0]


@pytest.fixture(scope="module")
def crs_and_gens():
    rng = GsRng(2024)
    crs = generate_crs(rng)
    g1o = aff_to_oracle_g1(crs.g1_gen)
    g2o = aff_to_oracle_g2(crs.g2_gen)
    return crs, g1o, g2o, rng


def test_ppe_verifies(crs_and_gens):
    """tests/prover.rs:24-62: e(X2,c2) e(c1,Y1) e(X1,Y1)^5 = t."""
    crs, g1o, g2o, rng = crs_and_gens
    xo = [O.g1_mul(g1o, 2), O.g1_mul(g1o, 3)]
    yo = [O.g2_mul(g2o, 4)]
    ao = [O.g1_mul(g1o, 17)]
    bo = [None, O.g2_mul(g2o, 23)]
    gamma = [[5], [0]]
    t = (O.pairing(xo[1], bo[1]) * O.pairing(ao[0], yo[0])
         * O.pairing(xo[0], O.g2_mul(yo[0], 5)))
    equ = PPE(a_consts=dev_g1(ao), b_consts=dev_g2(bo),
              gamma=dev_fr([5, 0]).reshape(FR.n, 2, 1), target=dev_gt(t))
    proof = commit_and_prove(equ, dev_g1(xo), dev_g2(yo), crs, rng)
    assert verify(equ, proof, crs)

    # negative: wrong target
    bad = PPE(equ.a_consts, equ.b_consts, equ.gamma,
              dev_gt(t * O.pairing(g1o, g2o)))
    assert not verify(bad, proof, crs)


def test_msmeg1_verifies(crs_and_gens):
    """tests/prover.rs:64-101: c2*X2 + y1*c1 + 5(y1*X1) = t in G1."""
    crs, g1o, g2o, rng = crs_and_gens
    xo = [O.g1_mul(g1o, 2), O.g1_mul(g1o, 3)]
    y_sc = [4]
    ao = [O.g1_mul(g1o, 29)]
    b_sc = [0, 31]
    t = O.g1_add(O.g1_add(O.g1_mul(xo[1], b_sc[1]),
                          O.g1_mul(ao[0], y_sc[0])),
                 O.g1_mul(xo[0], y_sc[0] * 5))
    equ = MSMEG1(a_consts=dev_g1(ao), b_consts=dev_fr(b_sc),
                 gamma=dev_fr([5, 0]).reshape(FR.n, 2, 1),
                 target=dev_g1([t]) if t is None else
                 tuple(l[..., 0] for l in dev_g1([t])))
    proof = commit_and_prove(equ, dev_g1(xo), dev_fr(y_sc), crs, rng)
    assert verify(equ, proof, crs)

    # negative: tamper with a commitment
    proof.xcoms.coms = tuple(
        jnp.roll(l, 1, axis=-1) for l in proof.xcoms.coms)
    assert not verify(equ, proof, crs)


def test_msmeg2_verifies(crs_and_gens):
    """tests/prover.rs:103-140: x2*c2 + c1*Y1 + 5(x1*Y1) = t in G2."""
    crs, g1o, g2o, rng = crs_and_gens
    x_sc = [2, 3]
    yo = [O.g2_mul(g2o, 4)]
    a_sc = [37]
    bo = [None, O.g2_mul(g2o, 41)]
    t = O.g2_add(O.g2_add(O.g2_mul(bo[1], x_sc[1]),
                          O.g2_mul(yo[0], a_sc[0])),
                 O.g2_mul(yo[0], x_sc[0] * 5))
    equ = MSMEG2(a_consts=dev_fr(a_sc), b_consts=dev_g2(bo),
                 gamma=dev_fr([5, 0]).reshape(FR.n, 2, 1),
                 target=tuple(l[..., 0] for l in dev_g2([t])))
    proof = commit_and_prove(equ, dev_fr(x_sc), dev_g2(yo), crs, rng)
    assert verify(equ, proof, crs)

    # negative: tampered pi must fail. pi for MSMEG2 is a Com2 vector of
    # width wx=1, so rolling the LAST axis would be a no-op; roll the B2
    # pair axis (size 2, axis -2 of coords AND inf) -- swapping the two
    # Com2 components is a real tamper the verifier must reject.
    proof.equ_proofs[0].pi = tuple(
        jnp.roll(l, 1, axis=-2) for l in proof.equ_proofs[0].pi)
    assert not verify(equ, proof, crs)


def test_quad_verifies(crs_and_gens):
    """tests/prover.rs:142-172: c2 x2 + c1 y1 + 5 x1 y1 = t in Fr."""
    crs, g1o, g2o, rng = crs_and_gens
    x_sc = [2, 3]
    y_sc = [4]
    a_sc = [43]
    b_sc = [0, 47]
    t = (b_sc[1] * x_sc[1] + a_sc[0] * y_sc[0]
         + 5 * x_sc[0] * y_sc[0]) % FR.p
    equ = QuadEqu(a_consts=dev_fr(a_sc), b_consts=dev_fr(b_sc),
                  gamma=dev_fr([5, 0]).reshape(FR.n, 2, 1),
                  target=dev_fr([t])[:, 0])
    proof = commit_and_prove(equ, dev_fr(x_sc), dev_fr(y_sc), crs, rng)
    assert verify(equ, proof, crs)

    # negative: wrong target
    bad = QuadEqu(equ.a_consts, equ.b_consts, equ.gamma,
                  dev_fr([(t + 1) % FR.p])[:, 0])
    assert not verify(bad, proof, crs)
