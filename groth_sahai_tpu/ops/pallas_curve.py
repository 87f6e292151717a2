"""Fused Pallas kernels for whole projective group ops (G1 over Fq, G2
over Fq2) on the COMPLETE addition law (RCB16, ops/proj.py).

One `pallas_call` per group operation instead of ~15 field-op kernels plus
XLA glue.  Three reasons this path exists:

  * PERFORMANCE: in-kernel field math on the ROW-LIST representation
    (pallas_reg.py) measures ~820 M Fq mont_muls/s on a v5e -- 63x the
    round-3 tensor-style kernels; a fused complete mixed add measures
    ~62 M madds/s (11 muls each), 15x the round-3 Jacobian path.
  * SIMPLICITY: the complete law has NO exceptional lanes -- no
    doubling-branch double-evaluation, one select (affine infinity) per
    mixed add.
  * CORRECTNESS: XLA:TPU miscompiled the Jacobian double-chain ->
    select-add scan bodies (round-2 checksum failure; bisected in
    scripts/probe_g2_scan.py).  Pallas kernels sidestep XLA loop
    optimization; the complete law also removes the fragile dataflow.

Formulas and value bounds mirror ops/proj.py (coords < 4p invariant) with
the b3 = 3b multiplications done as in-register small products (x12 (+ xi
twist for Fq2)); the looser (<96p/<144p) named bounds are audited in the
body docstrings.  Fq values are LISTS of (S, 128) limb rows; Fq2 values
are pairs of lists (see pallas_reg.py for why).

Layout contract matches pallas_fp: a field element batch is
``uint32[nl(, 2), *batch]``; batches flatten to lanes and tile as
``(rows, S, 128)`` blocks.  Infinity flags ride as uint32 0/1 rows.
Enable with the same ``GS_PALLAS`` gate as the field kernels.

NOTE interpret=True: the straight-line ~30k-op kernel graphs trigger a
pathological XLA:CPU compile (>10 min); interpret mode is for spot debug
at tiny shapes only.  CPU suites use ops/proj.py directly; the compiled
kernels are validated on-chip by the bench conformance gates and
tests/test_onchip.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limbs import W, MASK
from . import pallas_reg as R
from . import pallas_fp as PF

_U32 = jnp.uint32

# Lane caps before the wrappers fall back to the pure-JAX group law.
# LOOP_LANES guards calls that sit inside lax.scan/fori bodies: XLA pins
# whole pallas operands in VMEM there (observed scoped-vmem OOM at 64k
# lanes: 9 operands x 25 rows x m x 4B).  Straight-line calls (the MSM
# tail reductions) stream blocks through the grid and can go much wider.
MAX_LANES = 1 << 18
LOOP_LANES = 8192


def usable(curve, *arrays) -> bool:
    """Fused-kernel dispatch guard: Pallas enabled and NOT under vmap
    (pallas_call batching inside the protocol layer's vmapped kernels is
    not relied upon; those paths keep the pure-JAX ops)."""
    if not PF.enabled():
        return False
    from jax._src.interpreters import batching
    for arr in arrays:
        for leaf in jax.tree_util.tree_leaves(arr):
            if isinstance(leaf, batching.BatchTracer):
                return False
    return True


# ------------------------------------------------------------ field adapters
#
# A `ctx` bundles (nl, n0, p block, kp cache, mont-one rows).

class _Ctx:
    """nl/n0 + modulus block + Montgomery-one block (both kernel INPUTS --
    pallas kernels cannot capture array constants) + derived k*p cache."""

    def __init__(self, nl, n0, p, one_rows):
        self.nl = nl
        self.n0 = n0
        self.p = p
        self._one = one_rows
        self._kp = {}

    def kp(self, k):
        # NO caching: a value first computed inside a lax.fori_loop body
        # trace would leak into post-loop uses as a captured constant
        # (pallas rejects kernel constvars; cost is trace-time only --
        # Mosaic CSEs identical k*p chains).
        return R.kp_limbs(self.p, k)

    def one(self):
        return self._one


class _FqA:
    """Fq adapter: values are LISTS of (S, L) limb rows; mul output < 2p."""

    @staticmethod
    def mul(ctx, a, b):
        return R.mont_mul(ctx.nl, ctx.n0, ctx.p, a, b)

    @staticmethod
    def add(ctx, a, b):
        return R.add(a, b)

    @staticmethod
    def double(ctx, a):
        return R.double(a)

    @staticmethod
    def sub(ctx, a, b, k):
        return R.sub(a, b, ctx.kp(k))

    @staticmethod
    def select(mask, a, b):
        return R.select(mask, a, b)

    @staticmethod
    def is_zero(ctx, a, k):
        return R.is_zero(a, ctx.p, k)

    @staticmethod
    def eq(ctx, a, b, k):
        return R.is_zero(R.sub(a, b, ctx.kp(k)), ctx.p, 2 * k)

    @staticmethod
    def zero(ctx, like):
        return [R._zero_like(r) for r in like]

    @staticmethod
    def one(ctx, like):
        return ctx.one()

    @staticmethod
    def mul_b3(ctx, a, k):
        """a * 3b = a * 12 for G1 (carry pass, no multiplier).  `k` is the
        static bound of a in units of p (unused for Fq)."""
        return R.mul_small(a, 12)


class _Fq2A:
    """Fq2 adapter: values are (c0, c1) pairs of row lists; mul
    POST-REDUCED to < 2p per component (shared bound audit with Fq)."""

    @staticmethod
    def mul(ctx, a, b):
        mm = lambda x, y: R.mont_mul(ctx.nl, ctx.n0, ctx.p, x, y)
        t0 = mm(a[0], b[0])
        t1 = mm(a[1], b[1])
        t2 = mm(R.add(a[0], a[1]), R.add(b[0], b[1]))
        c0 = R.sub(t0, t1, ctx.kp(2))              # < 4p
        c1 = R.sub(R.sub(t2, t0, ctx.kp(2)), t1, ctx.kp(2))   # < 6p
        one = ctx.one()
        return (mm(c0, one), mm(c1, one))          # < 2p each

    @staticmethod
    def add(ctx, a, b):
        return (R.add(a[0], b[0]), R.add(a[1], b[1]))

    @staticmethod
    def double(ctx, a):
        return (R.double(a[0]), R.double(a[1]))

    @staticmethod
    def sub(ctx, a, b, k):
        kp = ctx.kp(k)
        return (R.sub(a[0], b[0], kp), R.sub(a[1], b[1], kp))

    @staticmethod
    def select(mask, a, b):
        return (R.select(mask, a[0], b[0]), R.select(mask, a[1], b[1]))

    @staticmethod
    def is_zero(ctx, a, k):
        return R.is_zero(a[0], ctx.p, k) & R.is_zero(a[1], ctx.p, k)

    @staticmethod
    def eq(ctx, a, b, k):
        kp = ctx.kp(k)
        return (R.is_zero(R.sub(a[0], b[0], kp), ctx.p, 2 * k)
                & R.is_zero(R.sub(a[1], b[1], kp), ctx.p, 2 * k))

    @staticmethod
    def zero(ctx, like):
        z = [R._zero_like(r) for r in like[0]]
        return (z, z)

    @staticmethod
    def one(ctx, like):
        return (ctx.one(), [R._zero_like(r) for r in like[0]])

    @staticmethod
    def mul_b3(ctx, a, k):
        """a * 3b = a * 12(u+1): xi-twist then x12.  bound(a) <= k*p per
        component; output components < 24(bound(a) + k p) -- callers audit."""
        kp = ctx.kp(k)
        return (R.mul_small(R.sub(a[0], a[1], kp), 12),
                R.mul_small(R.add(a[0], a[1]), 12))


# --------------------------------------------------------------- kernel glue
#
# Coordinates arrive as row-blocks: Fq coords are (nl, S, L); Fq2 coords
# (2nl, S, L) (c0 rows then c1 rows). `_pack`/`_unpack` convert.

def _pack(F2, v):
    """Row-list value -> (rows, S, L) tensor for the kernel output."""
    if not F2:
        return R.stack_rows(v)
    return R.stack_rows(list(v[0]) + list(v[1]))


def _unpack(F2, nl, ref, base=()):
    """Ref (or read tensor) -> row-list value.  Indexing the REF per row is
    the fast path (one vreg load each); `base` prefixes extra indices for
    blocks with leading singleton axes."""
    rd = lambda i: ref[base + (i,)] if base else ref[i]
    if not F2:
        return [rd(i) for i in range(nl)]
    return ([rd(i) for i in range(nl)], [rd(nl + i) for i in range(nl)])


# ------------------------------------------------------------------- wrappers

def _coord_rows(curve):
    from .fp import FQ
    return FQ.n * (2 if curve.ns == 2 else 1)


def _flat_coord(curve, x):
    """(nl(,2), *batch) -> (rows, M) with Fq2 c0 rows then c1 rows."""
    from .fp import FQ
    nl = FQ.n
    if curve.ns == 2:
        batch = x.shape[2:]
        m = int(np.prod(batch)) if batch else 1
        x2 = x.reshape(nl, 2, m)
        return jnp.concatenate([x2[:, 0], x2[:, 1]], 0), batch, m
    batch = x.shape[1:]
    m = int(np.prod(batch)) if batch else 1
    return x.reshape(nl, m), batch, m


def _unflat_coord(curve, rows, batch):
    from .fp import FQ
    nl = FQ.n
    m = rows.shape[1]
    if curve.ns == 2:
        out = jnp.stack([rows[:nl], rows[nl:]], 1)
        return out.reshape((nl, 2) + tuple(batch))
    return rows.reshape((nl,) + tuple(batch))


def _call_curve(curve, kernel, arrays, row_counts, out_rows,
                interpret=False):
    """Grid a multi-input curve op over (rows, S, 128) lane blocks.

    Tile = ONE vreg of batch (8 sublanes x 128 lanes) per grid step: the
    fused curve bodies hold ~100 live (nl, S, L) temporaries and Mosaic
    allocates scoped VMEM for the peak live set -- 4-vreg tiles blew the
    16 MB scoped limit (29 M observed); 1-vreg tiles measure ~7 M.
    """
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
    for const in (FQ.p_limbs, int_to_limbs(FQ.r_mod_p, nl)):
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
                                memory_space=pltpu.VMEM)
                   for r in out_rows],
        out_shape=[jax.ShapeDtypeStruct((r, s_total, PF._LANE), _U32)
                   for r in out_rows],
        interpret=interpret,
    )(*args)
    outs = [o.reshape(r, mp)[:, :m] if mp != m else o.reshape(r, m)
            for o, r in zip(outs, out_rows)]
    return outs


def _curve_args(curve):
    from .fp import FQ
    return curve.ns == 2, FQ.n, FQ.n0


def _g1():
    from .curve import G1
    return G1




# ===========================================================================
# Complete projective group law (RCB16 Algorithms 7-9, a = 0) -- fused
# kernels.  Same formulas + bound audit as ops/proj.py, but with the b3
# multiplications as in-register small-constant products (x12, plus the
# xi twist for Fq2) instead of full field muls: 11 muls per mixed add vs
# the Jacobian bodies' ~18 (madd + always-on double lane + selects).
# Representation: (X, Y, Z) homogeneous, coords < 4p invariant.
# ===========================================================================

def _cmadd_body(F, ctx, X1, Y1, Z1, x2, y2, ainf_m):
    """Complete mixed add; acc coords < 4p, affine < 2p, out < 4p.

    Bound audit (units of p; Fq2 values double once more inside the
    Karatsuba operand sums): t2 < 96, t1/Z3 < 98, Y3' < 144; worst
    product pairs (196)(196) and (12)(288) -- inside the 2^16 p^2 cap.
    """
    mm = lambda a, b: F.mul(ctx, a, b)
    t0 = mm(X1, x2)                                  # < 2p
    t1 = mm(Y1, y2)                                  # < 2p
    t3 = mm(F.add(ctx, x2, y2), F.add(ctx, X1, Y1))  # < 2p
    t3 = F.sub(ctx, t3, F.add(ctx, t0, t1), 4)       # < 6p
    t4 = F.add(ctx, mm(y2, Z1), Y1)                  # < 6p
    Y3 = F.add(ctx, mm(x2, Z1), X1)                  # < 6p
    t0 = F.add(ctx, F.double(ctx, t0), t0)           # < 6p
    t2 = F.mul_b3(ctx, Z1, 4)                        # < 96p
    Z3 = F.add(ctx, t1, t2)                          # < 98p
    t1 = F.sub(ctx, t1, t2, 96)                      # < 98p
    Y3 = F.mul_b3(ctx, Y3, 8)                        # < 144p
    X3 = F.sub(ctx, mm(t3, t1), mm(t4, Y3), 2)       # < 4p
    Y3 = F.add(ctx, mm(t1, Z3), mm(Y3, t0))          # < 4p
    Z3 = F.add(ctx, mm(Z3, t4), mm(t0, t3))          # < 4p
    X3 = F.select(ainf_m, X1, X3)
    Y3 = F.select(ainf_m, Y1, Y3)
    Z3 = F.select(ainf_m, Z1, Z3)
    return X3, Y3, Z3


def _cadd_body(F, ctx, X1, Y1, Z1, X2, Y2, Z2):
    """Complete projective add; coords < 4p in/out, zero selects."""
    mm = lambda a, b: F.mul(ctx, a, b)
    t0 = mm(X1, X2)                                  # < 2p
    t1 = mm(Y1, Y2)                                  # < 2p
    t2 = mm(Z1, Z2)                                  # < 2p
    t3 = mm(F.add(ctx, X1, Y1), F.add(ctx, X2, Y2))  # < 2p
    t3 = F.sub(ctx, t3, F.add(ctx, t0, t1), 4)       # < 6p
    t4 = mm(F.add(ctx, Y1, Z1), F.add(ctx, Y2, Z2))  # < 2p
    t4 = F.sub(ctx, t4, F.add(ctx, t1, t2), 4)       # < 6p
    Y3 = mm(F.add(ctx, X1, Z1), F.add(ctx, X2, Z2))  # < 2p
    Y3 = F.sub(ctx, Y3, F.add(ctx, t0, t2), 4)       # < 6p
    t0 = F.add(ctx, F.double(ctx, t0), t0)           # < 6p
    t2 = F.mul_b3(ctx, t2, 2)                        # < 48p
    Z3 = F.add(ctx, t1, t2)                          # < 50p
    t1 = F.sub(ctx, t1, t2, 48)                      # < 50p
    Y3 = F.mul_b3(ctx, Y3, 8)                        # < 144p
    X3 = F.sub(ctx, mm(t3, t1), mm(t4, Y3), 2)       # < 4p
    Y3 = F.add(ctx, mm(t1, Z3), mm(Y3, t0))          # < 4p
    Z3 = F.add(ctx, mm(Z3, t4), mm(t0, t3))          # < 4p
    return X3, Y3, Z3


def _cdbl_body(F, ctx, X, Y, Z):
    """Complete doubling; coords < 4p in, (<4p, <4p, <2p) out."""
    mm = lambda a, b: F.mul(ctx, a, b)
    t0 = mm(Y, Y)                                    # < 2p
    Z3 = F.double(ctx, F.double(ctx, F.double(ctx, t0)))   # < 16p
    t1 = mm(Y, Z)                                    # < 2p
    t2 = F.mul_b3(ctx, mm(Z, Z), 2)                  # < 48p
    X3 = mm(t2, Z3)                                  # < 2p
    Y3 = F.add(ctx, t0, t2)                          # < 50p
    Z3 = mm(t1, Z3)                                  # < 2p
    t2 = F.add(ctx, F.double(ctx, t2), t2)           # < 144p
    t0 = F.sub(ctx, t0, t2, 144)                     # < 146p
    Y3 = F.add(ctx, X3, mm(t0, Y3))                  # < 4p
    X3 = F.double(ctx, mm(t0, mm(X, Y)))             # < 4p
    return X3, Y3, Z3


def _cmadd_kernel(F2, nl, n0, X1, Y1, Z1, x2, y2, ainf, p_ref, one_ref,
                  oX, oY, oZ):
    ctx = _Ctx(nl, n0, R.rows_of(p_ref, nl), R.rows_of(one_ref, nl))
    F = _Fq2A if F2 else _FqA
    u = lambda r: _unpack(F2, nl, r)
    X3, Y3, Z3 = _cmadd_body(F, ctx, u(X1), u(Y1), u(Z1), u(x2), u(y2),
                             ainf[0] != 0)
    oX[...] = _pack(F2, X3)
    oY[...] = _pack(F2, Y3)
    oZ[...] = _pack(F2, Z3)


def _cadd_kernel(F2, nl, n0, X1, Y1, Z1, X2, Y2, Z2, p_ref, one_ref,
                 oX, oY, oZ):
    ctx = _Ctx(nl, n0, R.rows_of(p_ref, nl), R.rows_of(one_ref, nl))
    F = _Fq2A if F2 else _FqA
    u = lambda r: _unpack(F2, nl, r)
    X3, Y3, Z3 = _cadd_body(F, ctx, u(X1), u(Y1), u(Z1),
                            u(X2), u(Y2), u(Z2))
    oX[...] = _pack(F2, X3)
    oY[...] = _pack(F2, Y3)
    oZ[...] = _pack(F2, Z3)


def _cdbl_n_add_kernel(F2, nl, n0, n_dbl, X1, Y1, Z1, X2, Y2, Z2,
                       p_ref, one_ref, oX, oY, oZ):
    """n_dbl complete doublings of P then P + Q, ONE launch (the scalar-mul
    window ladder step and the MSM window combiner)."""
    ctx = _Ctx(nl, n0, R.rows_of(p_ref, nl), R.rows_of(one_ref, nl))
    F = _Fq2A if F2 else _FqA
    u = lambda r: _unpack(F2, nl, r)
    X, Y, Z = u(X1), u(Y1), u(Z1)
    # fori_loop keeps the kernel graph at ONE doubling body (Mosaic compile
    # time scales with body size; n_dbl=13 inline tripled it)
    def dstep(_, pt):
        return _cdbl_body(F, ctx, *pt)
    X, Y, Z = jax.lax.fori_loop(0, n_dbl, dstep, (X, Y, Z))
    X, Y, Z = _cadd_body(F, ctx, X, Y, Z, u(X2), u(Y2), u(Z2))
    oX[...] = _pack(F2, X)
    oY[...] = _pack(F2, Y)
    oZ[...] = _pack(F2, Z)


def cmadd(proj, aff, interpret: bool = False, curve=None,
          cap: int = MAX_LANES):
    """Complete projective + affine, one fused kernel (ops/proj.py madd)."""
    curve = curve or _g1()
    F2, nl, n0 = _curve_args(curve)
    cr = _coord_rows(curve)
    arrs, batch = [], None
    for leaf in (*proj, aff[0], aff[1]):
        f, batch, m = _flat_coord(curve, leaf)
        arrs.append(f)
    if m > cap and not interpret:
        from . import proj as PJ
        return PJ.madd(curve, proj, aff)
    ainf = aff[2].astype(_U32).reshape(1, -1)
    arrs.append(ainf)
    outs = _call_curve(curve, functools.partial(_cmadd_kernel, F2, nl, n0),
                       arrs, [cr] * 5 + [1], [cr] * 3, interpret)
    return tuple(_unflat_coord(curve, o, batch) for o in outs)


def cadd(p, q, interpret: bool = False, curve=None,
         cap: int = MAX_LANES):
    """Complete projective addition, one fused kernel (ops/proj.py add)."""
    curve = curve or _g1()
    F2, nl, n0 = _curve_args(curve)
    cr = _coord_rows(curve)
    arrs, batch = [], None
    for leaf in (*p, *q):
        f, batch, m = _flat_coord(curve, leaf)
        arrs.append(f)
    if m > cap and not interpret:
        from . import proj as PJ
        return PJ.add(curve, p, q)
    outs = _call_curve(curve, functools.partial(_cadd_kernel, F2, nl, n0),
                       arrs, [cr] * 6, [cr] * 3, interpret)
    return tuple(_unflat_coord(curve, o, batch) for o in outs)


def cdbl_n_add(p, n_dbl: int, q, interpret: bool = False, curve=None,
               cap: int = LOOP_LANES):
    """n_dbl doublings then one add, fused (ladder/window-combine step)."""
    curve = curve or _g1()
    F2, nl, n0 = _curve_args(curve)
    cr = _coord_rows(curve)
    arrs, batch = [], None
    for leaf in (*p, *q):
        f, batch, m = _flat_coord(curve, leaf)
        arrs.append(f)
    if m > cap and not interpret:
        from . import proj as PJ
        return PJ.add(curve, PJ.dbl_n(curve, p, n_dbl), q)
    outs = _call_curve(
        curve, functools.partial(_cdbl_n_add_kernel, F2, nl, n0, n_dbl),
        arrs, [cr] * 6, [cr] * 3, interpret)
    return tuple(_unflat_coord(curve, o, batch) for o in outs)


def _cmsm_scan_kernel(F2, nl, n0, px, py, pinf, p_ref, one_ref,
                      ox, oy, oz, ax_s, ay_s, az_s):
    """Projective running-prefix row scan (complete madd per step)."""
    r = pl.program_id(1)
    ctx = _Ctx(nl, n0, R.rows_of(p_ref, nl), R.rows_of(one_ref, nl))
    F = _Fq2A if F2 else _FqA

    @pl.when(r == 0)
    def _init():
        one = R.stack_rows(ctx.one())
        zero = jnp.zeros_like(one)
        if F2:
            ax_s[...] = jnp.concatenate([zero, zero], 0)
            ay_s[...] = jnp.concatenate([one, zero], 0)
            az_s[...] = jnp.concatenate([zero, zero], 0)
        else:
            ax_s[...] = zero
            ay_s[...] = one
            az_s[...] = zero

    X = _unpack(F2, nl, ax_s)
    Y = _unpack(F2, nl, ay_s)
    Z = _unpack(F2, nl, az_s)
    x2 = _unpack(F2, nl, px, base=(0,))
    y2 = _unpack(F2, nl, py, base=(0,))
    ainf = pinf[0, 0] != 0
    X, Y, Z = _cmadd_body(F, ctx, X, Y, Z, x2, y2, ainf)
    ax_s[...] = _pack(F2, X)
    ay_s[...] = _pack(F2, Y)
    az_s[...] = _pack(F2, Z)
    ox[...] = _pack(F2, X)[None]
    oy[...] = _pack(F2, Y)[None]
    oz[...] = _pack(F2, Z)[None]


def cmsm_row_scan(curve, pts_sorted, interpret: bool = False):
    """Projective msm_row_scan: returns (lane_tot proj, ys proj prefixes)."""
    from .fp import FQ
    F2, nl, n0 = _curve_args(curve)
    cr = _coord_rows(curve)
    x, y, inf = pts_sorted
    rows_n, width = inf.shape

    wpad = -(-width // PF._VREG) * PF._VREG

    def to4(coord):
        if F2:
            c = coord.reshape(nl, 2, rows_n, wpad)
            c = jnp.concatenate([c[:, 0], c[:, 1]], 0)
        else:
            c = coord
        c = jnp.moveaxis(c, 1, 0)
        return c.reshape(rows_n, cr, wpad // 128, 128)

    if wpad != width:
        padw = lambda l: jnp.pad(
            l, [(0, 0)] * (l.ndim - 1) + [(0, wpad - width)])
        x, y = padw(x), padw(y)
        inf = jnp.pad(inf, ((0, 0), (0, wpad - width)),
                      constant_values=True)
    x4 = to4(x)
    y4 = to4(y)
    inf4 = inf.astype(_U32).reshape(rows_n, 1, wpad // 128, 128)
    wb = wpad // PF._VREG

    specs_in = [
        pl.BlockSpec((1, cr, PF._SUB, PF._LANE),
                     lambda w, r: (r, 0, w, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cr, PF._SUB, PF._LANE),
                     lambda w, r: (r, 0, w, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, PF._SUB, PF._LANE),
                     lambda w, r: (r, 0, w, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nl, PF._SUB, PF._LANE), lambda w, r: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nl, PF._SUB, PF._LANE), lambda w, r: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    from .limbs import int_to_limbs
    p_blk = jnp.broadcast_to(
        jnp.asarray(FQ.p_limbs, dtype=_U32).reshape(nl, 1, 1),
        (nl, PF._SUB, PF._LANE))
    one_blk = jnp.broadcast_to(
        jnp.asarray(int_to_limbs(FQ.r_mod_p, nl), dtype=_U32).reshape(
            nl, 1, 1), (nl, PF._SUB, PF._LANE))
    out_spec = pl.BlockSpec((1, cr, PF._SUB, PF._LANE),
                            lambda w, r: (r, 0, w, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_cmsm_scan_kernel, F2, nl, n0),
        grid=(wb, rows_n),
        in_specs=specs_in,
        out_specs=[out_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((rows_n, cr, wpad // 128, PF._LANE),
                                        _U32)] * 3,
        scratch_shapes=[pltpu.VMEM((cr, PF._SUB, PF._LANE), _U32)] * 3,
        interpret=interpret,
    )(x4, y4, inf4, p_blk, one_blk)

    # RAW prefix stream (rows, cr, width): no transposes -- the caller
    # gathers (row, lane) pairs directly (ops/msm.py g_at).
    ys_raw = tuple(o.reshape(rows_n, cr, wpad)[:, :, :width] for o in outs)

    def coord(last):                     # (cr, width) -> structured coords
        if F2:
            return jnp.moveaxis(last.reshape(2, nl, width), 0, 1)
        return last

    lane_tot = tuple(coord(y[rows_n - 1]) for y in ys_raw)
    return lane_tot, ys_raw
