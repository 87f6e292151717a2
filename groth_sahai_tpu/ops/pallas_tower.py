"""Fused Pallas kernels for whole Fq2/Fq6/Fq12 tower multiplies.

ONE `pallas_call` per Fq12 multiply / square / cyclotomic square instead of
the mul_wide -> XLA-combine -> redc kernel trio plus glue: the measured
pairing path is dispatch-bound (~2% VPU utilization), and a Miller loop is
~450 Fq12-level ops in sequence.

Direct transcription of ops/tower.py's Karatsuba structure onto the
register-level field library (ops/pallas_reg.py), with per-product
Montgomery reduction instead of the wide-domain lazy reduction (costs
~1.3x the multiplies of the lazy path, buys a single fused kernel and a
simple NARROW-domain bound audit):

  Fq2.mul:  c0 = t0 - t1 < 4p ; c1 = t2 - t0 - t1 < 6p   (mm outputs < 2p)
  Fq6.mul:  c0 < 42p ; c1 < 30p ; c2 < 24p
  Fq12.mul: raw c0 < 90p, c1 < 126p, then POST-REDUCED to < 2p by one
  Montgomery multiply with the constant R mod p per coefficient (12 extra
  mm on top of Karatsuba's 54). The post-reduction closes the bound chain:
  operand sums compound x2 per Karatsuba level (Fq12 -> Fq6 -> Fq2 = x8),
  so inputs b must satisfy 8*bound(a) * 8*bound(b) <= 2^16 p^2, i.e.
  bound(a)*bound(b) <= 1024 p^2 -- holds for all call sites (f < 2p,
  line values < 10p, ratio terms < 32p).

Layout contract matches pallas_fp/pallas_curve: an Fq12 batch
``uint32[nl, 12, *batch]`` flattens to ``(nl*12, M)`` rows and tiles as
``(rows, S, 128)`` blocks.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_reg as R
from . import pallas_fp as PF

_U32 = jnp.uint32


# ------------------------------------------------------- in-kernel tower math
#
# An Fq2 value is a pair (c0, c1) of (nl, S, L) arrays; an Fq6 a triple of
# Fq2; an Fq12 a pair of Fq6. All exact limbs.

def _f2_mul(nl, n0, p, a, b):
    """Karatsuba Fq2 mul; outputs (c0 < 4p, c1 < 6p). Inputs < 128p."""
    mm = lambda x, y: R.mont_mul(nl, n0, p, x, y)
    kp2 = R.kp_limbs(p, 2)
    t0 = mm(a[0], b[0])
    t1 = mm(a[1], b[1])
    t2 = mm(R.add(a[0], a[1]), R.add(b[0], b[1]))
    c0 = R.sub(t0, t1, kp2)                        # < 4p
    c1 = R.sub(R.sub(t2, t0, kp2), t1, kp2)        # < 6p
    return (c0, c1)


def _f2_add(a, b):
    return (R.add(a[0], b[0]), R.add(a[1], b[1]))


def _f2_sub(a, b, kp_rows):
    return (R.sub(a[0], b[0], kp_rows), R.sub(a[1], b[1], kp_rows))


def _f2_xi(p, a, k: int):
    """(u+1) * a = (a0 - a1, a0 + a1); bound(a) <= k*p."""
    kpk = R.kp_limbs(p, k)
    return (R.sub(a[0], a[1], kpk), R.add(a[0], a[1]))


def _f6_mul(nl, n0, p, a, b):
    """Karatsuba Fq6 mul (tower.py mul_wide6 structure, narrow domain).

    Outputs: c0 < 42p, c1 < 30p, c2 < 24p. Inputs < 128p componentwise.
    """
    f2 = lambda x, y: _f2_mul(nl, n0, p, x, y)
    kp6 = R.kp_limbs(p, 6)
    t0 = f2(a[0], b[0])
    t1 = f2(a[1], b[1])
    t2 = f2(a[2], b[2])
    s1 = f2(_f2_add(a[1], a[2]), _f2_add(b[1], b[2]))
    s2 = f2(_f2_add(a[0], a[1]), _f2_add(b[0], b[1]))
    s3 = f2(_f2_add(a[0], a[2]), _f2_add(b[0], b[2]))
    # u = s1 - t1 - t2 < 18p ; c0 = t0 + xi(u) < 6p + 36p = 42p
    u = _f2_sub(_f2_sub(s1, t1, kp6), t2, kp6)
    c0 = _f2_add(t0, _f2_xi(p, u, 18))
    # c1 = s2 - t0 - t1 + xi(t2) < 6p + 12p + 12p = 30p
    c1 = _f2_sub(_f2_sub(_f2_add(s2, _f2_xi(p, t2, 6)), t0, kp6), t1, kp6)
    # c2 = s3 + t1 - t0 - t2 < 12p + 12p = 24p
    c2 = _f2_sub(_f2_sub(_f2_add(s3, t1), t0, kp6), t2, kp6)
    return (c0, c1, c2)


def _f6_add(a, b):
    return tuple(_f2_add(x, y) for x, y in zip(a, b))


def _f6_mul_by_v(p, a, k: int):
    """* v: (xi(c2), c0, c1); bound(c2) <= k*p."""
    return (_f2_xi(p, a[2], k), a[0], a[1])


def _f12_mul(nl, n0, p, a, b):
    """Fq12 Karatsuba over Fq6; outputs c0 < 90p, c1 < 126p."""
    f6 = lambda x, y: _f6_mul(nl, n0, p, x, y)
    t0 = f6(a[0], b[0])
    t1 = f6(a[1], b[1])
    ts = f6(_f6_add(a[0], a[1]), _f6_add(b[0], b[1]))
    # c0 = t0 + v * t1: v-rotation puts xi(t1.c2 < 24p) < 48p in slot 0
    vt1 = _f6_mul_by_v(p, t1, 24)
    c0 = _f6_add(t0, vt1)                          # < 42p + 48p = 90p
    # c1 = ts - t0 - t1 < 42p + 42p + 42p = 126p
    kp42 = R.kp_limbs(p, 42)
    c1 = tuple(_f2_sub(_f2_sub(x, y, kp42), z, kp42)
               for x, y, z in zip(ts, t0, t1))
    return (c0, c1)


def _split12(ref, nl):
    """Fq12 ref (nl*12 rows) -> nested tuples of ROW LISTS (2 x 3 x 2)."""
    def coeff(m):
        return [ref[m * nl + i] for i in range(nl)]

    return tuple(
        tuple((coeff(6 * i + 2 * j), coeff(6 * i + 2 * j + 1))
              for j in range(3))
        for i in range(2))


def _join12(c, nl):
    rows = []
    for i in range(2):
        for j in range(3):
            rows.extend(c[i][j][0])
            rows.extend(c[i][j][1])
    return jnp.stack(rows, 0)


def _fq12_mul_kernel(nl, n0, a_ref, b_ref, p_ref, one_ref, o_ref):
    p = R.rows_of(p_ref, nl)
    a = _split12(a_ref, nl)
    b = _split12(b_ref, nl)
    c = _f12_mul(nl, n0, p, a, b)
    one = R.rows_of(one_ref, nl)
    red = lambda x: R.mont_mul(nl, n0, p, x, one)   # post-reduce to < 2p
    c = tuple(tuple((red(f2[0]), red(f2[1])) for f2 in f6) for f6 in c)
    o_ref[...] = _join12(c, nl)


def _cyc_sqr_kernel(nl, n0, a_ref, p_ref, one_ref, o_ref):
    """Granger-Scott cyclotomic squaring, one kernel (tower.py
    cyclotomic_sqr transcribed; valid after the easy part).

    Bound audit (inputs < 2p, the kernel's own output bound):
      Fq2 complex sqr -> (t0 < 2p, t1 < 4p); ta < (8p, 10p); tb < (6p, 12p)
      comb_a <= 3t+4p <= 34p ; comb_b <= 40p ; z3 (xi-mixed) <= 58p
      all POST-REDUCED to < 2p with one Montgomery-one multiply each.
    """
    p = R.rows_of(p_ref, nl)
    mm = lambda x, y: R.mont_mul(nl, n0, p, x, y)
    kp = lambda k: R.kp_limbs(p, k)

    def coeff(m):
        return [a_ref[m * nl + i] for i in range(nl)]

    # Fq2 coefficient m = 3i + j <-> flat coeffs (6i + 2j, 6i + 2j + 1)
    def fq2(i, j):
        base = 6 * i + 2 * j
        return (coeff(base), coeff(base + 1))

    c = [fq2(0, 0), fq2(0, 1), fq2(0, 2), fq2(1, 0), fq2(1, 1), fq2(1, 2)]
    x0 = [c[0], c[3], c[1]]
    x1 = [c[4], c[2], c[5]]

    def f2sqr(a):
        s = R.add(a[0], a[1])
        d = R.sub(a[0], a[1], kp(4))
        return (mm(s, d), R.double(mm(a[0], a[1])))          # (<2p, <4p)

    def f2add(a, b):
        return (R.add(a[0], b[0]), R.add(a[1], b[1]))

    s0 = [f2sqr(v) for v in x0]
    s1 = [f2sqr(v) for v in x1]
    sx = [f2sqr(f2add(a, b)) for a, b in zip(x0, x1)]
    ta = [(R.add(t[0], R.sub(u[0], u[1], kp(4))),            # s0 + xi(s1)
           R.add(t[1], R.add(u[0], u[1])))
          for t, u in zip(s0, s1)]
    tb = [(R.sub(R.sub(v[0], t[0], kp(2)), u[0], kp(2)),
           R.sub(R.sub(v[1], t[1], kp(4)), u[1], kp(4)))
          for v, t, u in zip(sx, s0, s1)]

    def comb_a(t, cc):   # 3t - 2c = 2(t - c) + t
        return tuple(R.add(R.double(R.sub(ti, ci, kp(2))), ti)
                     for ti, ci in zip(t, cc))

    def comb_b(t, cc):   # 3t + 2c = 2(t + c) + t
        return tuple(R.add(R.double(R.add(ti, ci)), ti)
                     for ti, ci in zip(t, cc))

    # A = fp4sq(c0, c4) -> (ta[0], tb[0]); B = fp4sq(c3, c2) -> (ta[1],
    # tb[1]); C = fp4sq(c1, c5) -> (ta[2], tb[2])  (tower.py:459-474)
    xiC1 = (R.sub(tb[2][0], tb[2][1], kp(12)), R.add(tb[2][0], tb[2][1]))
    z = [comb_a(ta[0], c[0]),        # z0 = 3A0 - 2c0
         comb_a(ta[1], c[1]),        # z1 = 3B0 - 2c1
         comb_a(ta[2], c[2]),        # z2 = 3C0 - 2c2
         comb_b(xiC1, c[3]),         # z3 = 3 xi C1 + 2c3
         comb_b(tb[0], c[4]),        # z4 = 3A1 + 2c4
         comb_b(tb[1], c[5])]        # z5 = 3B1 + 2c5
    one = R.rows_of(one_ref, nl)
    red = lambda v: mm(v, one)
    rows = []
    for i in range(2):
        for j in range(3):
            zm = z[3 * i + j]
            rows.extend(red(zm[0]))
            rows.extend(red(zm[1]))
    o_ref[...] = jnp.stack(rows, 0)

# ------------------------------------------------- in-kernel Fq12 helpers
#
# Reusable bodies for the fused Miller-iteration and cyclotomic-pow
# kernels.  An Fq12 value in nested form is a 2-tuple of 3-tuples of Fq2
# row-list pairs (w-coeff, v-coeff, u-coeff order as in _split12).

def _f12_post_red(nl, n0, p, one, c):
    """Post-reduce every coefficient to < 2p (mont-by-one)."""
    red = lambda x: R.mont_mul(nl, n0, p, x, one)
    return tuple(tuple((red(f2[0]), red(f2[1])) for f2 in f6) for f6 in c)


def _f12_sqr_red(nl, n0, p, one, a):
    """Fused Fq12 square, post-reduced; input coeffs < 2p."""
    return _f12_post_red(nl, n0, p, one, _f12_mul(nl, n0, p, a, a))


def _f12_mul_red(nl, n0, p, one, a, b):
    return _f12_post_red(nl, n0, p, one, _f12_mul(nl, n0, p, a, b))


def _sparse_line_mul(nl, n0, p, one, f, la, lb, lc):
    """f * (la + lb v + lc v w), post-reduced to < 2p.

    f: nested Fq12 (coeffs < 2p); la/lb/lc: Fq2 pairs with component
    bounds <= 50p / 2p / 2p (the dbl/add line values after px/py scaling).
    15 Fq2 muls (45 mont) + 12 post-reductions -- the sparse structure of
    the M-twist line value (ops/pairing.py _sparse_to_fq12).
    """
    f2 = lambda x, y: _f2_mul(nl, n0, p, x, y)          # outputs < 6p
    kp6 = R.kp_limbs(p, 6)

    def f6_mul_ab(c6, a, b):
        """(c0 + c1 v + c2 v^2)(a + b v): coeffs < 18p."""
        t00 = f2(c6[0], a)
        t10 = f2(c6[1], a)
        t20 = f2(c6[2], a)
        t01 = f2(c6[0], b)
        t11 = f2(c6[1], b)
        t21 = f2(c6[2], b)
        r0 = _f2_add(t00, _f2_xi(p, t21, 6))            # < 18p
        r1 = _f2_add(t10, t01)                          # < 12p
        r2 = _f2_add(t20, t11)                          # < 12p
        return (r0, r1, r2)

    def f6_mul_cv(c6, c):
        """(c0 + c1 v + c2 v^2)(c v): (xi c2 c, c0 c, c1 c) < 12p."""
        return (_f2_xi(p, f2(c6[2], c), 6), f2(c6[0], c), f2(c6[1], c))

    f0, f1 = f
    t0 = f6_mul_ab(f0, la, lb)                          # < 18p
    t1 = f6_mul_cv(f1, lc)                              # < 12p
    s = _f6_add(f0, f1)                                 # < 4p
    ts = f6_mul_ab(s, la, _f2_add(lb, lc))              # < 18p
    # out0 = t0 + v t1 ; v t1 = (xi t1[2], t1[0], t1[1])
    out0 = (_f2_add(t0[0], _f2_xi(p, t1[2], 12)),       # < 18p + 36p
            _f2_add(t0[1], t1[0]),
            _f2_add(t0[2], t1[1]))
    kp18 = R.kp_limbs(p, 18)
    out1 = tuple(_f2_sub(_f2_sub(x, y, kp18), z, kp18)
                 for x, y, z in zip(ts, t0, t1))        # < 54p
    return _f12_post_red(nl, n0, p, one, (out0, out1))


def _cyc_sqr_body(nl, n0, p, one, c):
    """Granger-Scott cyclotomic square on a nested Fq12 < 2p, post-reduced.

    Same math + bound audit as _cyc_sqr_kernel, on nested values.
    """
    mm = lambda x, y: R.mont_mul(nl, n0, p, x, y)
    kp = lambda k: R.kp_limbs(p, k)
    # flatten nested (2)(3) -> the [c0..c5] Fq2-coefficient list (m = 3i+j)
    cl = [c[0][0], c[0][1], c[0][2], c[1][0], c[1][1], c[1][2]]
    x0 = [cl[0], cl[3], cl[1]]
    x1 = [cl[4], cl[2], cl[5]]

    def f2sqr(a):
        s = R.add(a[0], a[1])
        d = R.sub(a[0], a[1], kp(4))
        return (mm(s, d), R.double(mm(a[0], a[1])))

    s0 = [f2sqr(v) for v in x0]
    s1 = [f2sqr(v) for v in x1]
    sx = [f2sqr(_f2_add(a, b)) for a, b in zip(x0, x1)]
    ta = [(R.add(t[0], R.sub(u[0], u[1], kp(4))),
           R.add(t[1], R.add(u[0], u[1])))
          for t, u in zip(s0, s1)]
    tb = [(R.sub(R.sub(v[0], t[0], kp(2)), u[0], kp(2)),
           R.sub(R.sub(v[1], t[1], kp(4)), u[1], kp(4)))
          for v, t, u in zip(sx, s0, s1)]

    def comb_a(t, cc):
        return tuple(R.add(R.double(R.sub(ti, ci, kp(2))), ti)
                     for ti, ci in zip(t, cc))

    def comb_b(t, cc):
        return tuple(R.add(R.double(R.add(ti, ci)), ti)
                     for ti, ci in zip(t, cc))

    xiC1 = (R.sub(tb[2][0], tb[2][1], kp(12)), R.add(tb[2][0], tb[2][1]))
    z = [comb_a(ta[0], cl[0]), comb_a(ta[1], cl[1]), comb_a(ta[2], cl[2]),
         comb_b(xiC1, cl[3]), comb_b(tb[0], cl[4]), comb_b(tb[1], cl[5])]
    out = ((z[0], z[1], z[2]), (z[3], z[4], z[5]))
    return _f12_post_red(nl, n0, p, one, out)


def _f12_select(mask, a, b):
    return tuple(tuple((R.select(mask, x[0], y[0]), R.select(mask, x[1], y[1]))
                       for x, y in zip(a6, b6)) for a6, b6 in zip(a, b))


def _call12(kernel, arrays, interpret):
    from .fp import FQ
    nl = FQ.n
    m = arrays[0].shape[1]
    rows = nl * 12
    # 1-vreg batch tiles: see pallas_curve._call_curve (scoped-VMEM peak)
    mp = -(-m // PF._VREG) * PF._VREG
    s_tile = PF._SUB
    s_total = mp // PF._LANE
    args = [jnp.pad(x, ((0, 0), (0, mp - x.shape[1]))) if mp != m else x
            for x in arrays]
    args = [x.reshape(rows, s_total, PF._LANE) for x in args]
    in_specs = [pl.BlockSpec((rows, s_tile, PF._LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM) for _ in args]
    from .limbs import int_to_limbs
    for const in (FQ.p_limbs, int_to_limbs(FQ.r_mod_p, nl)):
        args.append(jnp.broadcast_to(
            jnp.asarray(const, dtype=_U32).reshape(nl, 1, 1),
            (nl, s_tile, PF._LANE)))
        in_specs.append(pl.BlockSpec((nl, s_tile, PF._LANE),
                                     lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kernel,
        grid=(s_total // s_tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, s_tile, PF._LANE), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, s_total, PF._LANE), _U32),
        interpret=interpret,
    )(*args)
    out = out.reshape(rows, mp)
    return out[:, :m] if mp != m else out


def _flat12(x):
    """(nl, 12, *batch) -> (nl*12, M): coefficient-major rows."""
    nl = x.shape[0]
    batch = x.shape[2:]
    m = int(np.prod(batch)) if batch else 1
    return jnp.moveaxis(x, 1, 0).reshape(12 * nl, m), batch, m


def _unflat12(rows, batch):
    nl = rows.shape[0] // 12
    m = rows.shape[1]
    out = rows.reshape((12, nl) + (m,))
    out = out.transpose(1, 0, 2)
    return out.reshape((nl, 12) + tuple(batch))


def fq12_mul(a, b, interpret: bool = False):
    """Fused Fq12 multiply; inputs (nl, 12, *batch) < 126p coefficientwise."""
    ar, batch, m = _flat12(a)
    br, _, _ = _flat12(b)
    from .fp import FQ
    out = _call12(functools.partial(_fq12_mul_kernel, FQ.n, FQ.n0),
                  [ar, br], interpret)
    return _unflat12(out, batch)


def fq12_sqr(a, interpret: bool = False):
    """Fused Fq12 square = fq12_mul(a, a) (a dedicated 2-Fq6-mul squaring
    kernel needs an in-kernel pre-reduction to keep its v-mixed operand
    sums in bounds; the saving is ~25%, deferred)."""
    return fq12_mul(a, a, interpret=interpret)


def cyc_sqr(a, interpret: bool = False):
    """Fused Granger-Scott cyclotomic square; inputs < 2p (the kernel's
    own output bound -- final-exp chains stay closed)."""
    ar, batch, m = _flat12(a)
    from .fp import FQ
    out = _call12(functools.partial(_cyc_sqr_kernel, FQ.n, FQ.n0),
                  [ar], interpret)
    return _unflat12(out, batch)


def usable(*arrays) -> bool:
    """Same dispatch guard as pallas_curve: Pallas on, not under vmap."""
    if not PF.enabled():
        return False
    from jax._src.interpreters import batching
    for arr in arrays:
        for leaf in jax.tree_util.tree_leaves(arr):
            if isinstance(leaf, batching.BatchTracer):
                return False
    return True


# ---------------------------------------------- fused Miller-loop step kernels
#
# One pallas_call per Miller doubling/addition step (ops/pairing.py
# _dbl_step/_add_step): the XLA-glue version issues ~20 small mul_wide/redc
# launches per iteration, so the 63-iteration loop is dispatch-bound.
# Formulas and bounds mirror ops/pairing.py exactly; every Fq2 product here
# is post-reduced to < 2p (mont-by-one), keeping the same audit.
# Line coefficients are returned pre-scaled by the G1 coords:
# (l0, l1*px, l2*py) -- ready for the sparse f-update.

def _f2_mulred(nl, n0, p, one, a, b):
    c0, c1 = _f2_mul(nl, n0, p, a, b)
    mm = lambda x: R.mont_mul(nl, n0, p, x, one)
    return (mm(c0), mm(c1))


def _f2_sqrred(nl, n0, p, one, a):
    return _f2_mulred(nl, n0, p, one, a, a)


def _f2_mul_fq(nl, n0, p, s, a):
    """Fq2 * Fq scalar (both < 8p): componentwise mont, out < 2p."""
    return (R.mont_mul(nl, n0, p, a[0], s), R.mont_mul(nl, n0, p, a[1], s))


def _dbl_step_body(nl, n0, p, one, X, Y, Z, tinv):
    """Projective doubling step on row-list Fq2 coords; returns
    ((X3, Y3, Z3), (l0 < 50p, l1 = 3j < 6p, l2 = -h < 8p))."""
    f2m = lambda a, b: _f2_mulred(nl, n0, p, one, a, b)
    f2s = lambda a: _f2_sqrred(nl, n0, p, one, a)
    f2fq = lambda a, s: _f2_mul_fq(nl, n0, p, s, a)
    fadd = lambda a, b: (R.add(a[0], b[0]), R.add(a[1], b[1]))
    fsub = lambda a, b, k: (R.sub(a[0], b[0], R.kp_limbs(p, k)),
                            R.sub(a[1], b[1], R.kp_limbs(p, k)))
    # a = X*Y/2 ; b = Y^2 ; c = Z^2 ; j = X^2
    a = f2fq(f2m(X, Y), tinv)                    # < 2p
    b = f2s(Y)
    c = f2s(Z)
    j = f2s(X)
    # e = 3c * b_twist = 12 * xi(c)  (b = 4(u+1))
    kp2 = R.kp_limbs(p, 2)
    e = (R.mul_small(R.sub(c[0], c[1], kp2), 12),
         R.mul_small(R.add(c[0], c[1]), 12))     # < 48p
    f = (R.add(R.double(e[0]), e[0]), R.add(R.double(e[1]), e[1]))  # < 144p
    g = f2fq(fadd(b, f), tinv)                   # (2p+144p)*tinv mont < 2p
    h = fsub(f2s(fadd(Y, Z)), fadd(b, c), 4)     # < 6p
    i = fsub(e, b, 2)                            # < 50p
    e2 = f2s(e)                                  # < 2p
    X3 = f2m(a, fsub(b, f, 144))                 # < 2p
    Y3 = fsub(f2s(g), (R.add(R.double(e2[0]), e2[0]),
                       R.add(R.double(e2[1]), e2[1])), 8)   # < 10p
    Z3 = f2m(b, h)
    l1 = (R.add(R.double(j[0]), j[0]), R.add(R.double(j[1]), j[1]))  # 3j < 6p
    kp8 = R.kp_limbs(p, 8)
    l2 = (R.neg(h[0], kp8), R.neg(h[1], kp8))    # -h < 8p
    return (X3, Y3, Z3), (i, l1, l2)


def _add_step_body(nl, n0, p, one, X, Y, Z, xq, yq):
    """Mixed addition step with affine Q; line = (j < 4p, -theta < 16p,
    lambda < 4p)."""
    f2m = lambda a, b: _f2_mulred(nl, n0, p, one, a, b)
    f2s = lambda a: _f2_sqrred(nl, n0, p, one, a)
    fadd = lambda a, b: (R.add(a[0], b[0]), R.add(a[1], b[1]))
    fdbl = lambda a: (R.double(a[0]), R.double(a[1]))
    fsub = lambda a, b, k: (R.sub(a[0], b[0], R.kp_limbs(p, k)),
                            R.sub(a[1], b[1], R.kp_limbs(p, k)))
    theta = fsub(Y, f2m(yq, Z), 2)               # < 12p (Y < 10p)
    lam = fsub(X, f2m(xq, Z), 2)                 # < 4p
    cc = f2s(theta)
    d = f2s(lam)
    e = f2m(lam, d)
    f = f2m(Z, cc)
    g = f2m(X, d)
    h = fsub(fadd(e, f), fdbl(g), 4)             # < 8p
    X3 = f2m(lam, h)
    Z3 = f2m(e, Z)
    eY = f2m(e, Y)
    Y3 = fsub(f2m(theta, fsub(g, h, 8)), eY, 2)  # < 4p
    j = fsub(f2m(theta, xq), f2m(lam, yq), 2)    # < 4p
    kp16 = R.kp_limbs(p, 16)
    nt = (R.neg(theta[0], kp16), R.neg(theta[1], kp16))
    return (X3, Y3, Z3), (j, nt, lam)


def _miller_dbl_kernel(nl, n0, X_r, Y_r, Z_r, tinv_r, p_r, one_r,
                       oX, oY, oZ, ol0a, ol0b, ol1, ol2a, ol2b):
    """Projective doubling step; outputs R' and raw line coeffs
    (l0 Fq2, l1 = 3j Fq2, l2 = -h Fq2); px/py scaling happens outside
    (it needs the G1 coords; cheap: 4 mont muls)."""
    p = R.rows_of(p_r, nl)
    one = R.rows_of(one_r, nl)
    tinv = R.rows_of(tinv_r, nl)
    u2 = lambda r: ([r[i] for i in range(nl)],
                    [r[nl + i] for i in range(nl)])
    (X3, Y3, Z3), (i, l1, l2) = _dbl_step_body(
        nl, n0, p, one, u2(X_r), u2(Y_r), u2(Z_r), tinv)
    pack = lambda v: R.stack_rows(list(v[0]) + list(v[1]))
    oX[...] = pack(X3)
    oY[...] = pack(Y3)
    oZ[...] = pack(Z3)
    ol0a[...] = R.stack_rows(i[0])
    ol0b[...] = R.stack_rows(i[1])
    ol1[...] = pack(l1)
    ol2a[...] = R.stack_rows(l2[0])
    ol2b[...] = R.stack_rows(l2[1])


def _miller_add_kernel(nl, n0, X_r, Y_r, Z_r, xq_r, yq_r, p_r, one_r,
                       oX, oY, oZ, ol0a, ol0b, ol1, ol2a, ol2b):
    """Mixed addition step with affine Q; line = (j, -theta, lambda)."""
    p = R.rows_of(p_r, nl)
    one = R.rows_of(one_r, nl)
    u2 = lambda r: ([r[i] for i in range(nl)],
                    [r[nl + i] for i in range(nl)])
    (X3, Y3, Z3), (j, nt, lam) = _add_step_body(
        nl, n0, p, one, u2(X_r), u2(Y_r), u2(Z_r), u2(xq_r), u2(yq_r))
    pack = lambda v: R.stack_rows(list(v[0]) + list(v[1]))
    oX[...] = pack(X3)
    oY[...] = pack(Y3)
    oZ[...] = pack(Z3)
    ol0a[...] = R.stack_rows(j[0])
    ol0b[...] = R.stack_rows(j[1])
    ol1[...] = pack(nt)
    ol2a[...] = R.stack_rows(lam[0])
    ol2b[...] = R.stack_rows(lam[1])


def _call_step(kernel, arrays, row_counts, out_rows, extra_consts,
               interpret=False):
    """Grid a Miller-step kernel over (rows, S, 128) lane blocks."""
    from .fp import FQ
    nl = FQ.n
    m = arrays[0].shape[1]
    mp = -(-m // PF._VREG) * PF._VREG
    s_tile = PF._SUB
    s_total = mp // PF._LANE
    args = [jnp.pad(x, ((0, 0), (0, mp - x.shape[1]))) if mp != m else x
            for x in arrays]
    args = [x.reshape(x.shape[0], s_total, PF._LANE) for x in args]
    in_specs = [pl.BlockSpec((r, s_tile, PF._LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM) for r in row_counts]
    from .limbs import int_to_limbs
    for const in extra_consts + [FQ.p_limbs, int_to_limbs(FQ.r_mod_p, nl)]:
        args.append(jnp.broadcast_to(
            jnp.asarray(const, dtype=_U32).reshape(nl, 1, 1),
            (nl, s_tile, PF._LANE)))
        in_specs.append(pl.BlockSpec((nl, s_tile, PF._LANE),
                                     lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        kernel,
        grid=(s_total // s_tile,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((r, s_tile, PF._LANE), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM) for r in out_rows],
        out_shape=[jax.ShapeDtypeStruct((r, s_total, PF._LANE), _U32)
                   for r in out_rows],
        interpret=interpret,
    )(*args)
    return [o.reshape(r, mp)[:, :m] if mp != m else o.reshape(r, m)
            for o, r in zip(outs, out_rows)]


def _flat2(x):
    """Fq2 (nl, 2, *batch) -> (2nl, M) rows (c0 rows then c1 rows)."""
    nl = x.shape[0]
    batch = x.shape[2:]
    m = int(np.prod(batch)) if batch else 1
    x2 = x.reshape(nl, 2, m)
    return jnp.concatenate([x2[:, 0], x2[:, 1]], 0), batch, m


def _unflat2(rows, batch):
    nl = rows.shape[0] // 2
    return jnp.stack([rows[:nl], rows[nl:]], 1).reshape(
        (nl, 2) + tuple(batch))


# --------------------------------------------- fused FULL Miller iterations
#
# One pallas_call per Miller-loop iteration: f' = f^2 * line(P) together
# with the R update.  The round-4 step kernels left the f-update (an Fq12
# square + sparse multiply) as separate launches plus XLA glue -- ~6
# launches per iteration; the measured pairing path was dispatch-bound at
# ~5% VPU utilization.  Here the doubling iteration is ONE launch
# (~151 mont muls/lane) and the rare addition iteration a second kernel.

def _miller_iter_dbl_kernel(nl, n0, f_r, X_r, Y_r, Z_r, px_r, py_r,
                            tinv_r, p_r, one_r, of, oX, oY, oZ):
    p = R.rows_of(p_r, nl)
    one = R.rows_of(one_r, nl)
    tinv = R.rows_of(tinv_r, nl)
    u2 = lambda r: ([r[i] for i in range(nl)],
                    [r[nl + i] for i in range(nl)])
    f = _split12(f_r, nl)
    px = R.rows_of(px_r, nl)
    py = R.rows_of(py_r, nl)
    fsq = _f12_sqr_red(nl, n0, p, one, f)
    (X3, Y3, Z3), (l0, l1, l2) = _dbl_step_body(
        nl, n0, p, one, u2(X_r), u2(Y_r), u2(Z_r), tinv)
    lb = _f2_mul_fq(nl, n0, p, px, l1)           # < 2p
    lc = _f2_mul_fq(nl, n0, p, py, l2)           # < 2p
    fo = _sparse_line_mul(nl, n0, p, one, fsq, l0, lb, lc)
    pack = lambda v: R.stack_rows(list(v[0]) + list(v[1]))
    of[...] = _join12(fo, nl)
    oX[...] = pack(X3)
    oY[...] = pack(Y3)
    oZ[...] = pack(Z3)


def _miller_iter_add_kernel(nl, n0, f_r, X_r, Y_r, Z_r, xq_r, yq_r,
                            px_r, py_r, p_r, one_r, of, oX, oY, oZ):
    p = R.rows_of(p_r, nl)
    one = R.rows_of(one_r, nl)
    u2 = lambda r: ([r[i] for i in range(nl)],
                    [r[nl + i] for i in range(nl)])
    f = _split12(f_r, nl)
    px = R.rows_of(px_r, nl)
    py = R.rows_of(py_r, nl)
    (X3, Y3, Z3), (l0, nt, lam) = _add_step_body(
        nl, n0, p, one, u2(X_r), u2(Y_r), u2(Z_r), u2(xq_r), u2(yq_r))
    lb = _f2_mul_fq(nl, n0, p, px, nt)           # < 2p
    lc = _f2_mul_fq(nl, n0, p, py, lam)          # < 2p
    fo = _sparse_line_mul(nl, n0, p, one, f, l0, lb, lc)
    pack = lambda v: R.stack_rows(list(v[0]) + list(v[1]))
    of[...] = _join12(fo, nl)
    oX[...] = pack(X3)
    oY[...] = pack(Y3)
    oZ[...] = pack(Z3)


def _flat1(x):
    """Fq (nl, *batch) -> (nl, M) rows."""
    nl = x.shape[0]
    batch = x.shape[1:]
    m = int(np.prod(batch)) if batch else 1
    return x.reshape(nl, m), batch, m


def miller_iter_dbl(f, Rp, px, py, two_inv_int: int,
                    interpret: bool = False):
    """One fused Miller doubling iteration: (f^2 * line(P), 2R)."""
    from .fp import FQ
    from .limbs import int_to_limbs
    nl = FQ.n
    fr, batch, m = _flat12(f)
    arrs = [fr]
    for c in Rp:
        arrs.append(_flat2(c)[0])
    arrs.append(_flat1(px)[0])
    arrs.append(_flat1(py)[0])
    tinv = int_to_limbs(two_inv_int * FQ.r_mod_p % FQ.p, nl)
    outs = _call_step(
        functools.partial(_miller_iter_dbl_kernel, nl, FQ.n0),
        arrs, [12 * nl] + [2 * nl] * 3 + [nl] * 2,
        [12 * nl] + [2 * nl] * 3, [tinv], interpret)
    fo, X3, Y3, Z3 = outs
    u2 = lambda r: _unflat2(r, batch)
    return _unflat12(fo, batch), (u2(X3), u2(Y3), u2(Z3))


def miller_iter_add(f, Rp, q_aff, px, py, interpret: bool = False):
    """One fused Miller addition iteration: (f * line_add(P), R + Q)."""
    from .fp import FQ
    nl = FQ.n
    fr, batch, m = _flat12(f)
    arrs = [fr]
    for c in (*Rp, q_aff[0], q_aff[1]):
        arrs.append(_flat2(c)[0])
    arrs.append(_flat1(px)[0])
    arrs.append(_flat1(py)[0])
    outs = _call_step(
        functools.partial(_miller_iter_add_kernel, nl, FQ.n0),
        arrs, [12 * nl] + [2 * nl] * 5 + [nl] * 2,
        [12 * nl] + [2 * nl] * 3, [], interpret)
    fo, X3, Y3, Z3 = outs
    u2 = lambda r: _unflat2(r, batch)
    return _unflat12(fo, batch), (u2(X3), u2(Y3), u2(Z3))


# ------------------------------------------------- fused cyclotomic pow
#
# a^e for a STATIC exponent as ONE launch: 64 square-and-select-multiply
# iterations over an SMEM bit string padded with leading zeros (squaring
# 1 is free algebraically, so the pad costs only uniform-shape work and
# every exponent <= 64 bits reuses the SAME compiled kernel -- the BLS
# final-exp chain needs exactly V3 (63b), V_ABS (64b) and |x| (64b)).

_CYC_POW_NBITS = 64


def _cyc_pow_kernel(nl, n0, a_ref, bits_ref, p_ref, one_ref, o_ref):
    p = R.rows_of(p_ref, nl)
    one = R.rows_of(one_ref, nl)
    a = _split12(a_ref, nl)
    z = [R._zero_like(one[0])] * nl
    zf2 = (list(z), list(z))
    # canonical carry structure: tuple(2) x tuple(3) x tuple(2) x row lists
    canon = lambda c: tuple(tuple((list(x[0]), list(x[1])) for x in c6)
                            for c6 in c)

    def body(i, acc):
        acc = _cyc_sqr_body(nl, n0, p, one, acc)
        # the multiply runs ONLY on set bits (scf.if on the SMEM scalar):
        # always-multiply-and-select would double the work of the sparse
        # BLS chains (|x| has 6 set bits of 64)
        return jax.lax.cond(
            bits_ref[i] != 0,
            lambda t: canon(_f12_mul_red(nl, n0, p, one, t, a)),
            lambda t: canon(t), acc)

    acc0 = canon((((list(one), list(z)), zf2, zf2), (zf2, zf2, zf2)))
    acc = jax.lax.fori_loop(0, _CYC_POW_NBITS, body, acc0)
    o_ref[...] = _join12(acc, nl)


def cyc_pow(a, e: int, conjugate_result: bool = False,
            interpret: bool = False):
    """a^e in the cyclotomic subgroup, one fused launch; e <= 64 bits."""
    assert 0 < e.bit_length() <= _CYC_POW_NBITS
    ar, batch, m = _flat12(a)
    from .fp import FQ
    nl = FQ.n
    bits = np.zeros(_CYC_POW_NBITS, dtype=np.int32)
    nb = e.bit_length()
    for i in range(nb):
        bits[_CYC_POW_NBITS - nb + i] = (e >> (nb - 1 - i)) & 1

    mp = -(-m // PF._VREG) * PF._VREG
    s_tile = PF._SUB
    s_total = mp // PF._LANE
    if mp != m:
        ar = jnp.pad(ar, ((0, 0), (0, mp - m)))
    a3 = ar.reshape(12 * nl, s_total, PF._LANE)
    from .limbs import int_to_limbs
    consts = []
    for c in (FQ.p_limbs, int_to_limbs(FQ.r_mod_p, nl)):
        consts.append(jnp.broadcast_to(
            jnp.asarray(c, dtype=_U32).reshape(nl, 1, 1),
            (nl, s_tile, PF._LANE)))
    out = pl.pallas_call(
        functools.partial(_cyc_pow_kernel, nl, FQ.n0),
        grid=(s_total // s_tile,),
        in_specs=[
            pl.BlockSpec((12 * nl, s_tile, PF._LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nl, s_tile, PF._LANE), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nl, s_tile, PF._LANE), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((12 * nl, s_tile, PF._LANE),
                               lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((12 * nl, s_total, PF._LANE), _U32),
        interpret=interpret,
    )(a3, jnp.asarray(bits), *consts)
    out = out.reshape(12 * nl, mp)
    out = out[:, :m] if mp != m else out
    res = _unflat12(out, batch)
    if conjugate_result:
        from .tower import FQ12
        res = FQ12.conj(res)
    return res


# ------------------------------------------------- fused dynamic GT pow
#
# a^s for PER-LANE 272-bit scalars (standard-form Fr limbs) as ONE launch:
# 272 square-and-select-multiply iterations in-kernel.  Replaces gt_exp's
# per-bit scan (2 launches x 272 bits) in randomized batch verification.
# Generic Fq12 ops (the base is a Miller ratio, not in the cyclotomic
# subgroup); the current bit is picked arithmetically (a 17-way static
# where-chain on the limb index) -- no dynamic VMEM indexing needed.

def _f12_pow_dyn_kernel(nl, n0, nlimbs, a_ref, s_ref, p_ref, one_ref,
                        o_ref):
    p = R.rows_of(p_ref, nl)
    one = R.rows_of(one_ref, nl)
    a = _split12(a_ref, nl)
    limbs = [s_ref[i] for i in range(nlimbs)]
    z = [R._zero_like(one[0])] * nl
    zf2 = (list(z), list(z))
    canon = lambda c: tuple(tuple((list(x[0]), list(x[1])) for x in c6)
                            for c6 in c)
    acc0 = canon((((list(one), list(z)), zf2, zf2), (zf2, zf2, zf2)))
    nbits = 16 * nlimbs

    def body(i, acc):
        acc = _f12_sqr_red(nl, n0, p, one, acc)
        am = _f12_mul_red(nl, n0, p, one, acc, a)
        b = nbits - 1 - i
        limb_idx = b // 16
        sh = b % 16
        limb = limbs[0] & 0
        for L in range(nlimbs):
            limb = jnp.where(limb_idx == L, limbs[L], limb)
        bit = (limb >> sh.astype(jnp.uint32)) & 1
        return canon(_f12_select(bit != 0, am, acc))

    acc = jax.lax.fori_loop(0, nbits, body, acc0)
    o_ref[...] = _join12(acc, nl)


def f12_pow_dyn(a, scal_std, interpret: bool = False):
    """a^s, per-lane dynamic scalars (uint32[17, *batch] standard limbs),
    one fused launch.  Batch shapes of a and scal must match."""
    from .fp import FQ, FR
    nl = FQ.n
    ar, batch, m = _flat12(a)
    scal = jnp.broadcast_to(scal_std, (FR.n,) + tuple(batch))
    sr = scal.reshape(FR.n, m)

    mp = -(-m // PF._VREG) * PF._VREG
    s_tile = PF._SUB
    s_total = mp // PF._LANE
    if mp != m:
        ar = jnp.pad(ar, ((0, 0), (0, mp - m)))
        sr = jnp.pad(sr, ((0, 0), (0, mp - m)))
    a3 = ar.reshape(12 * nl, s_total, PF._LANE)
    s3 = sr.reshape(FR.n, s_total, PF._LANE)
    from .limbs import int_to_limbs
    consts = []
    for c in (FQ.p_limbs, int_to_limbs(FQ.r_mod_p, nl)):
        consts.append(jnp.broadcast_to(
            jnp.asarray(c, dtype=_U32).reshape(nl, 1, 1),
            (nl, s_tile, PF._LANE)))
    out = pl.pallas_call(
        functools.partial(_f12_pow_dyn_kernel, nl, FQ.n0, FR.n),
        grid=(s_total // s_tile,),
        in_specs=[
            pl.BlockSpec((12 * nl, s_tile, PF._LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FR.n, s_tile, PF._LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nl, s_tile, PF._LANE), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nl, s_tile, PF._LANE), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((12 * nl, s_tile, PF._LANE),
                               lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((12 * nl, s_total, PF._LANE), _U32),
        interpret=interpret,
    )(a3, s3, *consts)
    out = out.reshape(12 * nl, mp)
    out = out[:, :m] if mp != m else out
    return _unflat12(out, batch)


def miller_dbl_step(Rp, two_inv_int: int, interpret: bool = False):
    """(R', (l0, l1, l2)) for the projective doubling step, one launch."""
    from .fp import FQ
    from .limbs import int_to_limbs
    nl = FQ.n
    arrs, batch = [], None
    for c in Rp:
        f, batch, m = _flat2(c)
        arrs.append(f)
    tinv = int_to_limbs(two_inv_int * FQ.r_mod_p % FQ.p, nl)
    outs = _call_step(
        functools.partial(_miller_dbl_kernel, nl, FQ.n0),
        arrs, [2 * nl] * 3, [2 * nl, 2 * nl, 2 * nl, nl, nl, 2 * nl, nl, nl],
        [tinv], interpret)
    X3, Y3, Z3, l0a, l0b, l1, l2a, l2b = outs
    u2 = lambda r: _unflat2(r, batch)
    u1 = lambda a, b: jnp.stack(
        [a.reshape((nl,) + tuple(batch)), b.reshape((nl,) + tuple(batch))], 1)
    return ((u2(X3), u2(Y3), u2(Z3)),
            (u1(l0a, l0b), u2(l1), u1(l2a, l2b)))


def miller_add_step(Rp, q_aff, interpret: bool = False):
    """(R', (l0, l1, l2)) for the mixed addition step, one launch."""
    from .fp import FQ
    nl = FQ.n
    arrs, batch = [], None
    for c in (*Rp, q_aff[0], q_aff[1]):
        f, batch, m = _flat2(c)
        arrs.append(f)
    outs = _call_step(
        functools.partial(_miller_add_kernel, nl, FQ.n0),
        arrs, [2 * nl] * 5, [2 * nl, 2 * nl, 2 * nl, nl, nl, 2 * nl, nl, nl],
        [], interpret)
    X3, Y3, Z3, l0a, l0b, l1, l2a, l2b = outs
    u2 = lambda r: _unflat2(r, batch)
    u1 = lambda a, b: jnp.stack(
        [a.reshape((nl,) + tuple(batch)), b.reshape((nl,) + tuple(batch))], 1)
    return ((u2(X3), u2(Y3), u2(Z3)),
            (u1(l0a, l0b), u2(l1), u1(l2a, l2b)))
