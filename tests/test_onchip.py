"""On-chip (TPU) validation of the compiled Pallas kernels vs host math.

These tests run the PRODUCTION kernel path (compiled Mosaic, not
interpret mode) and compare bit-exactly against the plain-int host
implementation.  They are skipped unless the default backend is a TPU:
the CPU suite covers the same math through ops/proj.py + ops/fp.py (which
the kernels are twins of), and interpret mode is unusable for these
kernels (the ~30k-op straight-line graphs trigger a pathological XLA:CPU
compile -- see pallas_curve.py module notes).

Run manually on hardware:  GS_RUN=1 python -m pytest tests/test_onchip.py
(the driver's bench.py conformance gates also exercise this path every
round).
"""

import random

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="on-chip kernel validation needs a TPU backend; CPU suite "
           "covers the same math via ops/proj.py (see module docstring)")


def test_mont_mul_kernel_vs_scan_path():
    from groth_sahai_tpu.ops.fp import FQ
    from groth_sahai_tpu.ops import pallas_fp as PF
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.integers(0, 1 << 16, (25, 1024), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, (25, 1024), dtype=np.uint32))
    ref = FQ.redc(FQ.mul_wide(a, b))        # pure-JAX twin (scan path)
    got = jax.jit(lambda a, b: PF.mont_mul(FQ, a, b))(a, b)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("which", ["G1", "G2"])
def test_complete_kernels_vs_host(which):
    from groth_sahai_tpu.ops.curve import (G1, G2, g1_affine_from_ints,
                                           g2_affine_from_ints,
                                           g1_affine_to_ints,
                                           g2_affine_to_ints)
    from groth_sahai_tpu.ops import pallas_curve as PC, proj as PJ
    from groth_sahai_tpu.utils import hostcrypto as HC
    from groth_sahai_tpu.ops import bls12_381 as C
    if which == "G1":
        curve, mulf, addf, gen, fi, ti = (
            G1, HC.g1_mul, HC.g1_add, (C.G1_GEN_X, C.G1_GEN_Y),
            g1_affine_from_ints, g1_affine_to_ints)
    else:
        curve, mulf, addf, gen, fi, ti = (
            G2, HC.g2_mul, HC.g2_add, (C.G2_GEN_X, C.G2_GEN_Y),
            g2_affine_from_ints, g2_affine_to_ints)
    rng = random.Random(9)
    n = 8
    pa = [mulf(gen, rng.randrange(1, 1 << 30)) for _ in range(n)]
    pb = [mulf(gen, rng.randrange(1, 1 << 30)) for _ in range(n)]
    pa[2] = None
    pb[3] = None
    pb[4] = pa[4]                      # doubling case through the kernel
    A, B = fi(pa), fi(pb)
    Ap, Bp = PJ.from_affine(curve, A), PJ.from_affine(curve, B)
    exp = [addf(x, y) for x, y in zip(pa, pb)]

    got = ti(jax.jit(lambda p, q: PJ.to_affine(
        curve, PC.cadd(p, q, curve=curve)))(Ap, Bp))
    assert got == exp
    got = ti(jax.jit(lambda p, b: PJ.to_affine(
        curve, PC.cmadd(p, b, curve=curve)))(Ap, B))
    assert got == exp
    exp8 = [addf(mulf(x, 8) if x else None, y) for x, y in zip(pa, pb)]
    got = ti(jax.jit(lambda p, q: PJ.to_affine(
        curve, PC.cdbl_n_add(p, 3, q, curve=curve)))(Ap, Bp))
    assert got == exp8


def test_msm_row_scan_kernel_vs_host():
    from groth_sahai_tpu.ops.curve import (G1, g1_affine_from_ints,
                                           g1_affine_to_ints)
    from groth_sahai_tpu.ops import pallas_curve as PC, proj as PJ
    from groth_sahai_tpu.utils import hostcrypto as HC
    from groth_sahai_tpu.ops import bls12_381 as C
    rng = random.Random(11)
    rows, width = 5, 1024
    gen = (C.G1_GEN_X, C.G1_GEN_Y)
    pts = [[HC.g1_mul(gen, rng.randrange(1, 1 << 30))
            if rng.random() > .2 else None
            for _ in range(width)] for _ in range(rows)]
    A = g1_affine_from_ints([p for row in pts for p in row])
    x = A[0].reshape(25, rows, width)
    y = A[1].reshape(25, rows, width)
    inf = A[2].reshape(rows, width)
    lane_tot, _ = jax.jit(
        lambda p: PC.cmsm_row_scan(G1, p))((x, y, inf))
    got = g1_affine_to_ints(jax.jit(
        lambda p: PJ.to_affine(G1, p))(lane_tot))
    exp = []
    for L in range(width):
        acc = None
        for r in range(rows):
            acc = HC.g1_add(acc, pts[r][L])
        exp.append(acc)
    assert got == exp


def test_fq12_kernels_vs_scan_path():
    from groth_sahai_tpu.ops.tower import FQ12
    from groth_sahai_tpu.ops import pallas_tower as PT
    from groth_sahai_tpu.utils import hostcrypto as HC
    rng = random.Random(13)
    vals = [HC.f12_pow(HC.pairing_gen(), rng.randrange(1, 1 << 60))
            for _ in range(4)]
    a = FQ12.from_ints(vals)
    b = FQ12.from_ints(vals[::-1])
    got = FQ12.to_ints(jax.jit(PT.fq12_mul)(a, b))
    exp = [HC.f12_mul(x, y) for x, y in zip(vals, vals[::-1])]
    assert [tuple(g) for g in got] == exp
    # cyclotomic square (inputs are in the cyclotomic subgroup: pairing
    # outputs), vs host full square
    got = FQ12.to_ints(jax.jit(PT.cyc_sqr)(a))
    exp = [HC.f12_mul(x, x) for x in vals]
    assert [tuple(g) for g in got] == exp


def test_miller_iter_kernels_vs_jax_twin():
    """Fused full Miller iterations (f-update + R-step in one launch) vs
    the pure-JAX twin bodies (which the CPU suite validates vs oracle)."""
    import random as _r
    import jax.numpy as jnp
    from groth_sahai_tpu.ops.fp import FQ
    from groth_sahai_tpu.ops.tower import FQ2, FQ12
    from groth_sahai_tpu.ops import pairing as pg
    from groth_sahai_tpu.ops import pallas_tower as PT
    from groth_sahai_tpu.ops.curve import (g1_affine_from_ints,
                                           g2_affine_from_ints)
    from groth_sahai_tpu.utils import hostcrypto as HC
    from groth_sahai_tpu.ops import bls12_381 as C

    rng = _r.Random(23)
    n = 8
    f_vals = [HC.f12_pow(HC.pairing_gen(), rng.randrange(1, 1 << 60))
              for _ in range(n)]
    f = FQ12.from_ints(f_vals)
    P = [HC.g1_mul((C.G1_GEN_X, C.G1_GEN_Y), rng.randrange(1, 1 << 30))
         for _ in range(n)]
    Q = [HC.g2_mul((C.G2_GEN_X, C.G2_GEN_Y), rng.randrange(1, 1 << 30))
         for _ in range(n)]
    p_aff = g1_affine_from_ints(P)
    q_aff = g2_affine_from_ints(Q)
    px, py = p_aff[0], p_aff[1]
    batch = (n,)
    R0 = (q_aff[0], q_aff[1], FQ2.one(batch))
    two_inv = pg._bcast_const(FQ.from_int(pg._TWO_INV_INT), 1)
    b3 = pg._bcast_const(FQ2.from_int_pair(*pg._B_TWIST_INTS), 1)

    def jax_dbl(f, R):
        fs = FQ12.sqr(f)
        R2, line = pg._dbl_step(R, two_inv, b3)
        return pg._ell(fs, line, px, py, batch), R2

    def jax_add(f, R):
        R2, line = pg._add_step(R, q_aff)
        return pg._ell(f, line, px, py, batch), R2

    norm = lambda x: np.asarray(jax.jit(
        lambda v: FQ.normalize(v, k=16))(x))
    f1, Rn = jax.jit(lambda f, R: PT.miller_iter_dbl(
        f, R, px, py, pg._TWO_INV_INT))(f, R0)
    f1j, Rnj = jax.jit(jax_dbl)(f, R0)
    np.testing.assert_array_equal(norm(f1), norm(f1j))
    # projective coords may differ only by the representative -- here both
    # paths run identical formulas, so limbs agree mod p
    for a, b in zip(Rn, Rnj):
        np.testing.assert_array_equal(norm(a), norm(b))

    f2, Ra = jax.jit(lambda f, R: PT.miller_iter_add(
        f, R, q_aff, px, py))(f1, Rn)
    f2j, Raj = jax.jit(jax_add)(f1, Rn)
    np.testing.assert_array_equal(norm(f2), norm(f2j))
    for a, b in zip(Ra, Raj):
        np.testing.assert_array_equal(norm(a), norm(b))


def test_cyc_pow_kernel_vs_host():
    """Fused 64-bit cyclotomic pow vs host math, incl. the conjugate."""
    import random as _r
    from groth_sahai_tpu.ops.tower import FQ12
    from groth_sahai_tpu.ops import pallas_tower as PT
    from groth_sahai_tpu.utils import hostcrypto as HC

    rng = _r.Random(29)
    vals = [HC.f12_pow(HC.pairing_gen(), rng.randrange(1, 1 << 60))
            for _ in range(4)]
    a = FQ12.from_ints(vals)
    # each distinct exponent embeds a different bit-string constant ->
    # a fresh XLA compile; two cases cover the ladder (sparse BLS x and a
    # dense max-width value)
    for e in (0xd201000000010000, (1 << 64) - 5):
        got = FQ12.to_ints(jax.jit(
            lambda a, e=e: PT.cyc_pow(a, e))(a))
        exp = [HC.f12_pow(v, e) for v in vals]
        assert [tuple(g) for g in got] == exp, f"cyc_pow e={e:#x}"


def test_f12_pow_dyn_vs_host():
    """Fused dynamic GT pow (per-lane 272-bit scalars, one launch)."""
    import random as _r
    import jax.numpy as jnp
    from groth_sahai_tpu.ops.tower import FQ12
    from groth_sahai_tpu.ops.fp import FR
    from groth_sahai_tpu.ops.limbs import ints_to_limbs
    from groth_sahai_tpu.ops import pallas_tower as PT
    from groth_sahai_tpu.utils import hostcrypto as HC

    rng = _r.Random(31)
    vals = [HC.f12_pow(HC.pairing_gen(), rng.randrange(1, 1 << 60))
            for _ in range(4)]
    es = [rng.randrange(1, FR.p) for _ in range(4)]
    a = FQ12.from_ints(vals)
    s = jnp.asarray(ints_to_limbs(es, FR.n))
    got = FQ12.to_ints(jax.jit(PT.f12_pow_dyn)(a, s))
    exp = [HC.f12_pow(v, e) for v, e in zip(vals, es)]
    assert [tuple(g) for g in got] == exp


def test_pow_chain_kernel_vs_host():
    from groth_sahai_tpu.ops.fp import FQ
    from groth_sahai_tpu.ops import pallas_fp as PF
    from groth_sahai_tpu.ops.limbs import ints_to_limbs, limbs_to_ints
    rng = random.Random(17)
    xs = [rng.randrange(1, FQ.p) for _ in range(9)]
    mont = [x * FQ.r_mod_p % FQ.p for x in xs]
    a = jnp.asarray(ints_to_limbs(mont, FQ.n))
    e = FQ.p - 2
    out = jax.jit(lambda a: FQ.normalize(PF.pow_const(FQ, a, e)))(a)
    got = limbs_to_ints(np.asarray(out))
    rinv = pow(FQ.R_int, -1, FQ.p)
    exp = [pow(x, e, FQ.p) * pow(rinv, e - 1, FQ.p) % FQ.p for x in xs]
    # a^e in Montgomery domain: (x R)^e R^{1-e} = x^e R  -> compare in
    # standard form instead:
    exp_std = [pow(x, e, FQ.p) for x in xs]
    got_std = [g * rinv % FQ.p for g in got]
    assert got_std == exp_std
