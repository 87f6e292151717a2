"""Fused G1 curve kernels (ops/pallas_curve.py) vs the pure-JAX group law.

Interpret mode on CPU (the compiled path is exercised by the on-chip bench
conformance gate). Covers generic points plus every exceptional case the
select logic handles: doubling inputs, either side at infinity, P + (-P).
"""

import numpy as np
import pytest
import jax

from groth_sahai_tpu.ops.curve import G1, g1_affine_from_ints
from groth_sahai_tpu.ops.fp import FR
from groth_sahai_tpu.ops.limbs import ints_to_limbs
from groth_sahai_tpu.ops import pallas_curve as PC
from groth_sahai_tpu.ops import bls12_381 as C

from . import oracle as O


@pytest.fixture(scope="module")
def pts():
    """Mixed batch: generic, doubling pair, infinities, P + (-P)."""
    g = O.G1_GEN
    p2 = O.g1_mul(g, 2)
    p3 = O.g1_mul(g, 3)
    p5 = O.g1_mul(g, 5)
    neg3 = (p3[0], O.Fq(O.P - p3[1].v))
    # jac side built from affine via from_affine
    jac_pts = [p2, p3, None, p5, p3, g, p2, p3]
    aff_pts = [p3, p3, p5, None, neg3, g, g, None]
    exp = [O.g1_add(a, b) for a, b in zip(jac_pts, aff_pts)]
    jaff = g1_affine_from_ints([None if p is None else (p[0].v, p[1].v)
                                for p in jac_pts])
    aaff = g1_affine_from_ints([None if p is None else (p[0].v, p[1].v)
                                for p in aff_pts])
    return jaff, aaff, jac_pts, exp


def _jac_to_oracle(jac):
    aff = jax.jit(G1.to_affine)(jac)
    from .test_gs_e2e import aff_to_oracle_g1
    out = []
    for i in range(np.shape(aff[2])[0]):
        el = tuple(l[..., i] for l in aff)
        out.append(aff_to_oracle_g1(el))
    return out


def test_fused_madd_matches_group_law(pts):
    jaff, aaff, jac_pts, exp = pts
    jac = jax.jit(G1.from_affine)(jaff)
    out = PC.madd(jac, aaff, interpret=True)
    got = _jac_to_oracle(out)
    for g_, e in zip(got, exp):
        if e is None:
            assert g_ is None
        else:
            assert g_ == (e[0], e[1])
    # and bit-identical to the pure-JAX path
    ref = jax.jit(G1.add_mixed)(jac, aaff)
    for a, b in zip(out, ref):
        assert np.array_equal(np.asarray(a), np.asarray(b)), \
            "fused madd != pure-JAX add_mixed limbs"


def test_fused_dbl_matches_group_law(pts):
    jaff, _, jac_pts, _ = pts
    jac = jax.jit(G1.from_affine)(jaff)
    out = PC.dbl(jac, interpret=True)
    got = _jac_to_oracle(out)
    for g_, p in zip(got, jac_pts):
        e = O.g1_add(p, p)
        if e is None:
            assert g_ is None
        else:
            assert g_ == (e[0], e[1])
    ref = jax.jit(G1.double)(jac)
    for a, b in zip(out, ref):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_fused_add_and_dbl_n(pts):
    """Jac+Jac fused add and the n-fold doubling ladder kernel."""
    jaff, aaff, jac_pts, _ = pts
    p = jax.jit(G1.from_affine)(jaff)
    q = jax.jit(G1.from_affine)(aaff)
    out = PC.add(p, q, interpret=True)
    ref = jax.jit(G1.add)(p, q)
    for a, b in zip(out, ref):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    out4 = PC.dbl_n(p, 4, interpret=True)
    ref4 = p
    for _ in range(4):
        ref4 = jax.jit(G1.double)(ref4)
    for a, b in zip(out4, ref4):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_fused_scalar_mul_path(pts):
    """curve.scalar_mul with the fused dispatch forced on (interpret via
    monkeypatched pallas gate) equals the oracle."""
    from groth_sahai_tpu.ops import pallas_fp, pallas_curve
    import jax.numpy as jnp2
    ks = [7, 11, 13, 255]
    g = g1_affine_from_ints([(C.G1_GEN_X, C.G1_GEN_Y)] * 4)
    s = jnp2.asarray(ints_to_limbs(ks, FR.n))
    saved = pallas_fp._enabled
    real_madd, real_add, real_dbln = (pallas_curve.madd, pallas_curve.add,
                                      pallas_curve.dbl_n)
    try:
        pallas_fp._enabled = True
        pallas_curve.madd = lambda j, a, **kw: real_madd(
            j, a, interpret=True, **kw)
        pallas_curve.add = lambda p, q, **kw: real_add(
            p, q, interpret=True, **kw)
        pallas_curve.dbl_n = lambda j, n, **kw: real_dbln(
            j, n, interpret=True, **kw)
        jac = G1.scalar_mul(g, s)
    finally:
        pallas_fp._enabled = saved
        pallas_curve.madd, pallas_curve.add, pallas_curve.dbl_n = (
            real_madd, real_add, real_dbln)
    out = G1.to_affine(jac)         # pure-JAX path (pallas gate restored)
    from groth_sahai_tpu.ops.curve import g1_affine_to_ints
    got = g1_affine_to_ints(out)
    for g_, k in zip(got, ks):
        e = O.g1_mul(O.G1_GEN, k)
        assert g_ == (e[0].v, e[1].v)


def test_fused_g2_ops():
    """G2 (Fq2 adapter) fused madd/add/dbl_n vs the pure-JAX group law and
    the oracle -- the path that replaced the XLA:TPU-miscompiled scan body
    (scripts/probe_512.py g2smul512 FAIL)."""
    from groth_sahai_tpu.ops.curve import G2, g2_affine_from_ints
    g = O.G2_GEN
    q2 = O.g2_mul(g, 2)
    q3 = O.g2_mul(g, 3)
    neg3 = (q3[0], type(q3[1])([O.Fq(O.P - c.v) for c in q3[1].c]))
    jac_pts = [q2, q3, None, q3]
    aff_pts = [q3, g, q2, neg3]

    def ints(p):
        return None if p is None else (tuple(c.v for c in p[0].c),
                                       tuple(c.v for c in p[1].c))

    jaff = g2_affine_from_ints([ints(p) for p in jac_pts])
    aaff = g2_affine_from_ints([ints(p) for p in aff_pts])
    jac = jax.jit(G2.from_affine)(jaff)

    out = PC.madd(jac, aaff, interpret=True, curve=G2)
    ref = jax.jit(G2.add_mixed)(jac, aaff)
    # the fused Fq2 multiply post-reduces (< 2p) so raw limbs may differ
    # from the lazy-reduction path by multiples of p: compare projectively
    eqm = jax.jit(G2.eq_jac)(out, ref)
    assert bool(np.asarray(eqm).all()), "fused G2 madd != add_mixed"

    q = jax.jit(G2.from_affine)(aaff)
    out2 = PC.add(jac, q, interpret=True, curve=G2)
    ref2 = jax.jit(G2.add)(jac, q)
    # fused Fq2 mul post-reduces, so compare points projectively
    eq = jax.jit(G2.eq_jac)(out2, ref2)
    assert bool(np.asarray(eq).all())

    out4 = PC.dbl_n(jac, 4, interpret=True, curve=G2)
    ref4 = jac
    for _ in range(4):
        ref4 = jax.jit(G2.double)(ref4)
    eq4 = jax.jit(G2.eq_jac)(out4, ref4)
    assert bool(np.asarray(eq4).all())
    # and against the oracle: 16 * P
    from .test_gs_e2e import aff_to_oracle_g2
    aff4 = jax.jit(G2.to_affine)(out4)
    for i, p in enumerate(jac_pts):
        el = tuple(l[..., i] for l in aff4)
        got = aff_to_oracle_g2(el)
        e = None if p is None else O.g2_mul(p, 16)
        if e is None:
            assert got is None
        else:
            assert got == (e[0], e[1])


def test_msm_row_scan_kernel():
    """Grid-carried-scratch row scan == the lax.scan it replaces (G1,
    rows=4, width=128 incl. lane padding + infinity entries)."""
    import jax.numpy as jnp
    rows_n, width = 4, 128
    ks = [(r * width + l) % 97 + 1 for r in range(rows_n)
          for l in range(width)]
    opts = [O.g1_mul(O.G1_GEN, k) for k in ks]
    flat = g1_affine_from_ints(
        [(p[0].v, p[1].v) for p in opts[:-3]] + [None] * 3)  # some inf
    pts_s = tuple(
        l.reshape(l.shape[:-1] + (rows_n, width)) for l in flat[:2]) + (
        flat[2].reshape(rows_n, width),)

    from groth_sahai_tpu.ops import pallas_curve as pc
    lane_tot, ys = pc.msm_row_scan(G1, pts_s, interpret=True)

    def row_step(acc, inp):
        acc = G1.add_mixed(acc, inp)
        return acc, acc

    xs = (jnp.moveaxis(pts_s[0], 1, 0), jnp.moveaxis(pts_s[1], 1, 0),
          pts_s[2])
    ref_tot, ref_ys = jax.jit(lambda xs: jax.lax.scan(
        row_step, G1.inf_jac((width,)), xs))(xs)
    for a, b in zip(lane_tot, ref_tot):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(ys, ref_ys):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_fused_madd_chain(pts):
    """Scan-style chained madd (the MSM inner loop shape): 8-step running
    prefix equals the oracle prefix."""
    ks = [3, 1, 4, 1, 5, 9, 2, 6]
    opts = [O.g1_mul(O.G1_GEN, k) for k in ks]
    aff = g1_affine_from_ints([(p[0].v, p[1].v) for p in opts])
    acc = G1.inf_jac((8,))
    # every lane accumulates the same stream shifted: simply add the same
    # batch 3 times to stress carried bounds
    for _ in range(3):
        acc = PC.madd(acc, aff, interpret=True)
    got = _jac_to_oracle(acc)
    for g_, p in zip(got, opts):
        e = O.g1_mul(p, 3)
        assert g_ == (e[0], e[1])
