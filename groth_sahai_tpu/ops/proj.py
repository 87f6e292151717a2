"""Complete homogeneous-projective group law for a = 0 short Weierstrass
curves (Renes-Costello-Batina 2016, Algorithms 7-9).

Why this exists: the Jacobian formulas in ops/curve.py are only complete
with select-based exceptional handling -- every `add`/`add_mixed` also
computes a full `double` for the is-doubling lane plus three selects, so a
"single" mixed add costs ~18 field muls.  The RCB complete formulas give
ONE branchless evaluation valid for every input (including infinity and
doubling) at 11-12 muls: the natural shape for vmap/scan/Pallas on TPU,
where data-dependent branching is impossible anyway.  Completeness needs
the curve group to have odd order -- true for both BLS12-381 E(Fq) and
E'(Fq2) (odd cofactors x prime r, ops/bls12_381.py:27-28).

Representation: (X, Y, Z) homogeneous, x = X/Z, y = Y/Z; infinity is
(0, y, 0) for any y != 0.  Mixed inputs are the affine (x, y, inf) triples
of ops/curve.py; the affine point at infinity is handled by ONE select
(the only one in the whole group law).

Bound discipline (ops/fp.py rules; in units of p): coordinate invariant is
< 4p for X, Y, Z; `F.mul` outputs < 2p; every named intermediate stays
<= 6p, far inside both the Fq (2^8 p) and Fq2 (32p) multiplier caps.  The
b3 = 3b multiplications use a precomputed Montgomery constant (full mul)
so the same audit serves Fq and Fq2.

The MSM/commit/scalar-mul hot paths run on this law; per mixed add it
replaces ~18 muls + 9 selects with 11 muls + 1 select (~1.6x) and removes
the miscompile-prone select/double dataflow (see pallas_curve.py notes).

Replaces the arkworks group ops the reference uses via `Com1::add` etc.
(/root/reference/src/data_structures.rs:181-191, :336-342).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _b3(curve):
    """Montgomery-form 3*b constant for the curve (cached numpy constant --
    NOT built with jnp so it can be created inside a trace and reused)."""
    if not hasattr(curve, "_b3_const"):
        from .fp import FQ
        from .limbs import int_to_limbs
        from . import bls12_381 as C
        mont = lambda v: (v % FQ.p) * FQ.r_mod_p % FQ.p
        if curve.ns == 1:
            curve._b3_const = int_to_limbs(mont(3 * C.B_G1), FQ.n)
        else:
            curve._b3_const = np.stack(
                [int_to_limbs(mont(3 * C.B_G2[0]), FQ.n),
                 int_to_limbs(mont(3 * C.B_G2[1]), FQ.n)], axis=1)
    return curve._b3_const


def _b3c(curve, like):
    """b3 shaped to broadcast against a coordinate (trailing batch axes)."""
    b3 = _b3(curve)
    return b3.reshape(b3.shape + (1,) * (like.ndim - b3.ndim))


def inf(curve, batch_shape=()):
    """The point at infinity (0 : 1 : 0)."""
    F = curve.F
    return (F.zeros(batch_shape), F.one(batch_shape), F.zeros(batch_shape))


def is_inf(curve, p):
    return curve.F.is_zero(p[2], k=4)


def from_affine(curve, a):
    """(x, y, inf) -> projective; infinity maps to (0, 1, 0)."""
    x, y, ainf = a
    F = curve.F
    batch = np.shape(ainf)
    one = F.one(batch)
    sel = lambda t, f: curve.select(ainf, t, f)
    return (sel(F.zeros(batch), x), sel(one, y), sel(F.zeros(batch), one))


def to_affine(curve, p):
    """Projective -> (x, y, inf) with ONE batched inversion of Z."""
    X, Y, Z = p
    F = curve.F
    zinf = F.is_zero(Z, k=4)
    zi = F.inv_batch(Z) if hasattr(F, "inv_batch") else F.inv(Z)
    x = F.mul(X, zi)
    y = F.mul(Y, zi)
    zero = F.zeros(np.shape(zinf))
    return (F.select(zinf, zero, x), F.select(zinf, zero, y), zinf)


def to_jacobian(curve, p):
    """(X:Y:Z) homogeneous -> (X Z, Y Z^2, Z) Jacobian (same point)."""
    X, Y, Z = p
    F = curve.F
    return (F.mul(X, Z), F.mul(Y, F.mul(Z, Z)), Z)


def from_jacobian(curve, j):
    """(X:Y:Z) Jacobian -> (X Z, Y, Z^3) homogeneous (same point).

    x = X/Z^2 = XZ/Z^3, y = Y/Z^3.  Jacobian infinity (Z=0) maps to
    (0, Y, 0) which is projective infinity whenever Y != 0 -- guaranteed
    for ops/curve.py Jacobian values (inf_jac Y=1; add/double keep Y
    away from 0 only up to exceptional cases, so prefer `from_affine`
    when provenance is unknown).
    """
    X, Y, Z = j
    F = curve.F
    return (F.mul(X, Z), Y, F.mul(Z, F.mul(Z, Z)))


def madd(curve, p, a):
    """Complete mixed addition P + A (RCB16 Algorithm 8, a = 0).

    p: projective (coords < 4p); a: affine (x, y, inf) with coords < 2p.
    Output coords < 4p.  11 muls (2 of them by the b3 constant).
    """
    F = curve.F
    X1, Y1, Z1 = p
    b3 = _b3c(curve, X1)
    x2, y2, ainf = a
    t0 = F.mul(X1, x2)                       # < 2p
    t1 = F.mul(Y1, y2)                       # < 2p
    t3 = F.mul(F.add(x2, y2), F.add(X1, Y1))     # (4p)(8p) ok; < 2p
    t3 = F.sub(t3, F.add(t0, t1), k=4)       # < 6p
    t4 = F.add(F.mul(y2, Z1), Y1)            # < 6p
    Y3 = F.add(F.mul(x2, Z1), X1)            # < 6p
    t0 = F.add(F.double(t0), t0)             # 3 t0 < 6p
    t2 = F.mul(b3, Z1)                       # < 2p
    Z3 = F.add(t1, t2)                       # < 4p
    t1 = F.sub(t1, t2, k=2)                  # < 4p
    Y3 = F.mul(b3, Y3)                       # < 2p
    X3 = F.sub(F.mul(t3, t1), F.mul(t4, Y3), k=2)     # < 4p
    Y3 = F.add(F.mul(t1, Z3), F.mul(Y3, t0))          # < 4p
    Z3 = F.add(F.mul(Z3, t4), F.mul(t0, t3))          # < 4p
    # affine infinity -> P unchanged (the single select of this group law)
    X3 = curve.select(ainf, X1, X3)
    Y3 = curve.select(ainf, Y1, Y3)
    Z3 = curve.select(ainf, Z1, Z3)
    return (X3, Y3, Z3)


def add(curve, p, q):
    """Complete projective addition P + Q (RCB16 Algorithm 7, a = 0).

    Coords < 4p in, < 4p out.  12 muls (2 by b3), no selects.
    """
    F = curve.F
    X1, Y1, Z1 = p
    b3 = _b3c(curve, X1)
    X2, Y2, Z2 = q
    t0 = F.mul(X1, X2)                       # < 2p
    t1 = F.mul(Y1, Y2)                       # < 2p
    t2 = F.mul(Z1, Z2)                       # < 2p
    t3 = F.mul(F.add(X1, Y1), F.add(X2, Y2))     # (8p)(8p); < 2p
    t3 = F.sub(t3, F.add(t0, t1), k=4)       # < 6p
    t4 = F.mul(F.add(Y1, Z1), F.add(Y2, Z2))     # < 2p
    t4 = F.sub(t4, F.add(t1, t2), k=4)       # < 6p
    Y3 = F.mul(F.add(X1, Z1), F.add(X2, Z2))     # < 2p
    Y3 = F.sub(Y3, F.add(t0, t2), k=4)       # < 6p
    t0 = F.add(F.double(t0), t0)             # < 6p
    t2 = F.mul(b3, t2)                       # < 2p
    Z3 = F.add(t1, t2)                       # < 4p
    t1 = F.sub(t1, t2, k=2)                  # < 4p
    Y3 = F.mul(b3, Y3)                       # < 2p
    X3 = F.sub(F.mul(t3, t1), F.mul(t4, Y3), k=2)     # < 4p
    Y3 = F.add(F.mul(t1, Z3), F.mul(Y3, t0))          # < 4p
    Z3 = F.add(F.mul(Z3, t4), F.mul(t0, t3))          # < 4p
    return (X3, Y3, Z3)


def dbl(curve, p):
    """Complete doubling (RCB16 Algorithm 9, a = 0).

    Coords < 4p in; out X3 < 4p, Y3 < 4p, Z3 < 2p.  6 muls + 2 sqr-like
    (counted 8 muls) + 1 by b3.
    """
    F = curve.F
    X, Y, Z = p
    b3 = _b3c(curve, X)
    t0 = F.mul(Y, Y)                         # < 2p
    Z3 = F.double(F.double(F.double(t0)))    # 8 t0 < 16p
    t1 = F.mul(Y, Z)                         # < 2p
    t2 = F.mul(b3, F.mul(Z, Z))              # < 2p
    X3 = F.mul(t2, Z3)                       # (2p)(16p) ok; < 2p
    Y3 = F.add(t0, t2)                       # < 4p
    Z3 = F.mul(t1, Z3)                       # < 2p
    t2 = F.add(F.double(t2), t2)             # 3 t2 < 6p
    t0 = F.sub(t0, t2, k=8)                  # < 10p
    Y3 = F.add(X3, F.mul(t0, Y3))            # < 4p
    X3 = F.double(F.mul(t0, F.mul(X, Y)))    # < 4p
    return (X3, Y3, Z3)


def dbl_n(curve, p, n: int):
    out = p
    for _ in range(n):
        out = dbl(curve, out)
    return out


def eq(curve, p, q):
    """Projective equality: X1 Z2 == X2 Z1 and Y1 Z2 == Y2 Z1 (+inf cases)."""
    F = curve.F
    ex = F.eq(F.mul(p[0], q[2]), F.mul(q[0], p[2]))
    ey = F.eq(F.mul(p[1], q[2]), F.mul(q[1], p[2]))
    pi, qi = is_inf(curve, p), is_inf(curve, q)
    return (pi & qi) | (~pi & ~qi & ex & ey)


def select(curve, mask, p, q):
    return tuple(curve.select(mask, x, y) for x, y in zip(p, q))


def sum_reduce(curve, p, axis: int = 0):
    """Tree-reduce a batch axis with the complete addition."""
    ax = curve.ns + axis
    pts = p
    size = jax.tree_util.tree_leaves(pts)[0].shape[ax]
    while size > 1:
        half = size // 2
        even = jax.tree_util.tree_map(
            lambda l: lax.slice_in_dim(l, 0, half, axis=ax), pts)
        odd = jax.tree_util.tree_map(
            lambda l: lax.slice_in_dim(l, half, 2 * half, axis=ax), pts)
        summed = add(curve, even, odd)
        if size % 2:
            rest = jax.tree_util.tree_map(
                lambda l: lax.slice_in_dim(l, 2 * half, size, axis=ax), pts)
            summed = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b], axis=ax), summed, rest)
            size = half + 1
        else:
            size = half
        pts = summed
    return jax.tree_util.tree_map(
        lambda l: lax.index_in_dim(l, 0, axis=ax, keepdims=False), pts)
