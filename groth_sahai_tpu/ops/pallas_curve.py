"""Fused Pallas kernels for whole Jacobian group ops (G1 over Fq, G2 over
Fq2).

One `pallas_call` per group operation instead of ~15 field-op kernels plus
XLA glue. Two reasons this path exists:

  * PERFORMANCE: the measured MSM/commit/scalar-mul paths are
    dispatch-bound (~2% VPU utilization, BENCH r2/r3); the inner loops are
    sequential scans of exactly these ops.
  * CORRECTNESS: XLA:TPU MISCOMPILES lax.scan bodies that chain the
    doubling ladder into the table-select add (bisected in
    scripts/probe_g2_scan.py; an optimization_barrier fixes batch-8 G2 but
    batch-512 G2 still computes wrong limbs -- scripts/probe_512.py). The
    fused kernels sidestep XLA loop optimization entirely and are verified
    bit-exact on-chip at every shape probed.

Formulas and value bounds mirror ops/curve.py (dbl-2009-l / madd-2007-bl /
add-2007-bl with select-based exceptional cases) over a field adapter:
Fq values are single (nl, S, L) arrays; Fq2 values are pairs. The Fq2
multiply (Karatsuba + per-component post-reduction to < 2p, see
pallas_tower) keeps the SAME <2p product bound as Fq, so one audit serves
both curves.

Layout contract matches pallas_fp: a field element batch is
``uint32[nl(, 2), *batch]``; batches flatten to lanes and tile as
``(rows, S, 128)`` blocks. Infinity flags ride as uint32 0/1 rows.
Enable with the same ``GS_PALLAS`` gate as the field kernels.
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

# Above this many batch lanes, XLA pins whole pallas operands in VMEM when
# the call sits inside a loop body (observed scoped-vmem OOM at 64k lanes:
# 9 operands x 25 rows x m x 4B). The wrappers fall back to the pure-JAX
# group law beyond the cap; every hot loop (MSM width <= 8192, pairing
# batch <= 2048, commit widths) stays under it.
MAX_LANES = 8192


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
        if k not in self._kp:
            self._kp[k] = R.kp_limbs(self.p, k)
        return self._kp[k]

    def one(self):
        return self._one


class _FqA:
    """Fq adapter: values are (nl, S, L) arrays; mul output < 2p."""

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
        return jnp.zeros_like(like)

    @staticmethod
    def one(ctx, like):
        return ctx.one()


class _Fq2A:
    """Fq2 adapter: values are (c0, c1) pairs; mul POST-REDUCED to < 2p
    per component so the shared curve-formula bound audit applies."""

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
        return (jnp.zeros_like(like[0]), jnp.zeros_like(like[1]))

    @staticmethod
    def one(ctx, like):
        return (ctx.one(), jnp.zeros_like(like[0]))


# ------------------------------------------------------------- generic bodies

def _dbl_body(F, ctx, X1, Y1, Z1):
    """dbl-2009-l (a=0); bounds as curve.py:73-93 (products < 2p)."""
    mm = lambda x, y: F.mul(ctx, x, y)
    A = mm(X1, X1)
    B = mm(Y1, Y1)
    YZ = mm(Y1, Z1)
    Cc = mm(B, B)
    S = mm(F.add(ctx, X1, B), F.add(ctx, X1, B))
    D = F.double(ctx, F.sub(ctx, F.sub(ctx, S, A, 2), Cc, 2))   # < 12p
    E = F.add(ctx, F.double(ctx, A), A)                         # < 6p
    Ff = mm(E, E)
    X3 = F.sub(ctx, Ff, F.double(ctx, D), 32)                   # < 34p
    Y3 = F.sub(ctx, mm(E, F.sub(ctx, D, X3, 64)),
               F.double(ctx, F.double(ctx, F.double(ctx, Cc))), 16)  # < 18p
    Z3 = F.double(ctx, YZ)                                      # < 4p
    return X3, Y3, Z3


def _madd_body(F, ctx, X1, Y1, Z1, x2, y2, ainf_m):
    """madd-2007-bl + exceptional select; mirrors curve.py add_mixed."""
    mm = lambda x, y: F.mul(ctx, x, y)
    Z1Z1 = mm(Z1, Z1)
    U2 = mm(x2, Z1Z1)
    S2 = mm(y2, mm(Z1, Z1Z1))
    H = F.sub(ctx, U2, X1, 64)                                  # < 66p
    r = F.double(ctx, F.sub(ctx, S2, Y1, 32))                   # < 68p
    HH = mm(H, H)
    r2 = mm(r, r)
    ZH = mm(F.add(ctx, Z1, H), F.add(ctx, Z1, H))
    I = F.double(ctx, F.double(ctx, HH))                        # < 8p
    J = mm(H, I)
    V = mm(X1, I)
    X3 = F.sub(ctx, F.sub(ctx, r2, J, 2), F.double(ctx, V), 4)  # < 10p
    Y3 = F.sub(ctx, mm(r, F.sub(ctx, V, X3, 16)),
               F.double(ctx, mm(Y1, J)), 4)
    Z3 = F.sub(ctx, F.sub(ctx, ZH, Z1Z1, 2), HH, 2)             # < 6p

    p_inf = F.is_zero(ctx, Z1, 8)
    same_x = F.eq(ctx, U2, X1, 64) & ~p_inf & ~ainf_m
    same_y = F.eq(ctx, S2, Y1, 32)
    is_dbl = same_x & same_y
    dX, dY, dZ = _dbl_body(F, ctx, X1, Y1, Z1)
    X3 = F.select(is_dbl, dX, X3)
    Y3 = F.select(is_dbl, dY, Y3)
    Z3 = F.select(is_dbl, dZ, Z3)
    # a at infinity -> p unchanged
    X3 = F.select(ainf_m, X1, X3)
    Y3 = F.select(ainf_m, Y1, Y3)
    Z3 = F.select(ainf_m, Z1, Z3)
    # p at infinity -> from_affine(a)
    za = F.select(ainf_m, F.zero(ctx, Z1), F.one(ctx, Z1))
    X3 = F.select(p_inf, x2, X3)
    Y3 = F.select(p_inf, y2, Y3)
    Z3 = F.select(p_inf, za, Z3)
    return X3, Y3, Z3


def _add_body(F, ctx, X1, Y1, Z1, X2, Y2, Z2):
    """add-2007-bl + exceptional select; mirrors curve.py add (:95-129)."""
    mm = lambda x, y: F.mul(ctx, x, y)
    Z1Z1 = mm(Z1, Z1)
    Z2Z2 = mm(Z2, Z2)
    U1 = mm(X1, Z2Z2)
    U2 = mm(X2, Z1Z1)
    S1 = mm(mm(Y1, Z2), Z2Z2)
    S2 = mm(mm(Y2, Z1), Z1Z1)
    H = F.sub(ctx, U2, U1, 2)                                   # < 4p
    r = F.double(ctx, F.sub(ctx, S2, S1, 2))                    # < 8p
    I = mm(F.double(ctx, H), F.double(ctx, H))
    r2 = mm(r, r)
    ZZ = mm(F.add(ctx, Z1, Z2), F.add(ctx, Z1, Z2))
    J = mm(H, I)
    V = mm(U1, I)
    X3 = F.sub(ctx, F.sub(ctx, r2, J, 2), F.double(ctx, V), 4)  # < 10p
    Y3 = F.sub(ctx, mm(r, F.sub(ctx, V, X3, 16)),
               F.double(ctx, mm(S1, J)), 4)
    Z3 = mm(F.sub(ctx, F.sub(ctx, ZZ, Z1Z1, 2), Z2Z2, 2), H)
    p_inf = F.is_zero(ctx, Z1, 8)
    q_inf = F.is_zero(ctx, Z2, 8)
    same_x = F.eq(ctx, U1, U2, 2) & ~p_inf & ~q_inf
    same_y = F.eq(ctx, S1, S2, 2)
    is_dbl = same_x & same_y
    dX, dY, dZ = _dbl_body(F, ctx, X1, Y1, Z1)
    X3 = F.select(is_dbl, dX, X3)
    Y3 = F.select(is_dbl, dY, Y3)
    Z3 = F.select(is_dbl, dZ, Z3)
    X3 = F.select(q_inf, X1, X3)
    Y3 = F.select(q_inf, Y1, Y3)
    Z3 = F.select(q_inf, Z1, Z3)
    X3 = F.select(p_inf, X2, X3)
    Y3 = F.select(p_inf, Y2, Y3)
    Z3 = F.select(p_inf, Z2, Z3)
    return X3, Y3, Z3


# --------------------------------------------------------------- kernel glue
#
# Coordinates arrive as row-blocks: Fq coords are (nl, S, L); Fq2 coords
# (2nl, S, L) (c0 rows then c1 rows). `_pack`/`_unpack` convert.

def _pack(F2, v):
    if not F2:
        return v
    return jnp.concatenate([v[0], v[1]], 0)


def _unpack(F2, nl, x):
    if not F2:
        return x
    return (x[:nl], x[nl:])


def _madd_kernel(F2, nl, n0, X1, Y1, Z1, x2, y2, ainf, p_ref, one_ref,
                 oX, oY, oZ):
    ctx = _Ctx(nl, n0, p_ref[...], one_ref[...])
    F = _Fq2A if F2 else _FqA
    u = lambda r: _unpack(F2, nl, r[...])
    X3, Y3, Z3 = _madd_body(F, ctx, u(X1), u(Y1), u(Z1), u(x2), u(y2),
                            ainf[...][0] != 0)
    oX[...] = _pack(F2, X3)
    oY[...] = _pack(F2, Y3)
    oZ[...] = _pack(F2, Z3)


def _add_kernel(F2, nl, n0, X1, Y1, Z1, X2, Y2, Z2, p_ref, one_ref,
                oX, oY, oZ):
    ctx = _Ctx(nl, n0, p_ref[...], one_ref[...])
    F = _Fq2A if F2 else _FqA
    u = lambda r: _unpack(F2, nl, r[...])
    X3, Y3, Z3 = _add_body(F, ctx, u(X1), u(Y1), u(Z1),
                           u(X2), u(Y2), u(Z2))
    oX[...] = _pack(F2, X3)
    oY[...] = _pack(F2, Y3)
    oZ[...] = _pack(F2, Z3)


def _dbl_n_kernel(F2, nl, n0, n_times, X1, Y1, Z1, p_ref, one_ref,
                  oX, oY, oZ):
    ctx = _Ctx(nl, n0, p_ref[...], one_ref[...])
    F = _Fq2A if F2 else _FqA
    u = lambda r: _unpack(F2, nl, r[...])
    X, Y, Z = u(X1), u(Y1), u(Z1)
    for _ in range(n_times):
        X, Y, Z = _dbl_body(F, ctx, X, Y, Z)
    oX[...] = _pack(F2, X)
    oY[...] = _pack(F2, Y)
    oZ[...] = _pack(F2, Z)


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


def madd(jac, aff, interpret: bool = False, curve=None):
    """Jacobian + affine, one fused kernel. Mirrors curve.add_mixed."""
    curve = curve or _g1()
    F2, nl, n0 = _curve_args(curve)
    cr = _coord_rows(curve)
    arrs, batch = [], None
    for leaf in (*jac, aff[0], aff[1]):
        f, batch, m = _flat_coord(curve, leaf)
        arrs.append(f)
    if m > MAX_LANES and not interpret:
        return curve.add_mixed(jac, aff)
    ainf = aff[2].astype(_U32).reshape(1, -1)
    arrs.append(ainf)
    outs = _call_curve(curve, functools.partial(_madd_kernel, F2, nl, n0),
                       arrs, [cr] * 5 + [1], [cr] * 3, interpret)
    return tuple(_unflat_coord(curve, o, batch) for o in outs)


def add(jac_p, jac_q, interpret: bool = False, curve=None):
    """Jacobian + Jacobian, one fused kernel. Mirrors curve.add."""
    curve = curve or _g1()
    F2, nl, n0 = _curve_args(curve)
    cr = _coord_rows(curve)
    arrs, batch = [], None
    for leaf in (*jac_p, *jac_q):
        f, batch, m = _flat_coord(curve, leaf)
        arrs.append(f)
    if m > MAX_LANES and not interpret:
        return curve.add(jac_p, jac_q)
    outs = _call_curve(curve, functools.partial(_add_kernel, F2, nl, n0),
                       arrs, [cr] * 6, [cr] * 3, interpret)
    return tuple(_unflat_coord(curve, o, batch) for o in outs)


def dbl_n(jac, n_times: int, interpret: bool = False, curve=None):
    """n_times chained doublings in ONE kernel (scalar-mul window ladder)."""
    curve = curve or _g1()
    F2, nl, n0 = _curve_args(curve)
    cr = _coord_rows(curve)
    arrs, batch = [], None
    for leaf in jac:
        f, batch, m = _flat_coord(curve, leaf)
        arrs.append(f)
    if m > MAX_LANES and not interpret:
        out = jac
        for _ in range(n_times):
            out = curve.double(out)
        return out
    outs = _call_curve(curve,
                       functools.partial(_dbl_n_kernel, F2, nl, n0, n_times),
                       arrs, [cr] * 3, [cr] * 3, interpret)
    return tuple(_unflat_coord(curve, o, batch) for o in outs)


def dbl(jac, interpret: bool = False, curve=None):
    return dbl_n(jac, 1, interpret=interpret, curve=curve)


def _g1():
    from .curve import G1
    return G1


# ----------------------------------------------- fused MSM row-scan kernel
#
# The MSM inner loop is `rows` sequential mixed-adds per lane (ops/msm.py
# step 4). As a lax.scan of fused madd kernels it still pays one dispatch
# + an HBM round-trip of the accumulator per row. Here the WHOLE scan is
# one pallas_call: grid (width_blocks, rows) iterated rows-innermost, the
# running accumulator lives in VMEM scratch across grid steps (TPU grids
# run sequentially on the core), reset at row 0 of each width block. The
# per-row prefixes stream out as the outputs (ys for the prefix lookup).

def _msm_scan_kernel(F2, nl, n0, px, py, pinf, p_ref, one_ref,
                     ox, oy, oz, ax_s, ay_s, az_s):
    r = pl.program_id(1)
    ctx = _Ctx(nl, n0, p_ref[...], one_ref[...])
    F = _Fq2A if F2 else _FqA

    @pl.when(r == 0)
    def _init():
        one = ctx.one()
        zero = jnp.zeros_like(one)
        if F2:
            ax_s[...] = jnp.concatenate([one, zero], 0)
            ay_s[...] = jnp.concatenate([one, zero], 0)
            az_s[...] = jnp.concatenate([zero, zero], 0)
        else:
            ax_s[...] = one
            ay_s[...] = one
            az_s[...] = zero

    X = _unpack(F2, nl, ax_s[...])
    Y = _unpack(F2, nl, ay_s[...])
    Z = _unpack(F2, nl, az_s[...])
    x2 = _unpack(F2, nl, px[...][0])
    y2 = _unpack(F2, nl, py[...][0])
    ainf = pinf[...][0][0] != 0
    X, Y, Z = _madd_body(F, ctx, X, Y, Z, x2, y2, ainf)
    ax_s[...] = _pack(F2, X)
    ay_s[...] = _pack(F2, Y)
    az_s[...] = _pack(F2, Z)
    ox[...] = _pack(F2, X)[None]
    oy[...] = _pack(F2, Y)[None]
    oz[...] = _pack(F2, Z)[None]


def msm_row_scan(curve, pts_sorted, interpret: bool = False):
    """Running madd prefix down the rows of the sorted MSM layout.

    pts_sorted: affine batch with coords (*struct, rows, width) and inf
    (rows, width). Returns (lane_tot jac (*struct, width),
    ys jac (rows, *struct, width)) exactly like the lax.scan it replaces.
    """
    from .fp import FQ
    F2, nl, n0 = _curve_args(curve)
    cr = _coord_rows(curve)
    x, y, inf = pts_sorted
    rows_n, width = inf.shape

    wpad = -(-width // PF._VREG) * PF._VREG

    def to4(coord):
        # (*struct, rows, wpad) -> (rows, cr, wpad/128, 128)
        if F2:
            c = coord.reshape(nl, 2, rows_n, wpad)
            c = jnp.concatenate([c[:, 0], c[:, 1]], 0)       # (2nl, r, w)
        else:
            c = coord
        c = jnp.moveaxis(c, 1, 0)                            # (rows, cr, w)
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
        functools.partial(_msm_scan_kernel, F2, nl, n0),
        grid=(wb, rows_n),
        in_specs=specs_in,
        out_specs=[out_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((rows_n, cr, wpad // 128, PF._LANE),
                                        _U32)] * 3,
        scratch_shapes=[pltpu.VMEM((cr, PF._SUB, PF._LANE), _U32)] * 3,
        interpret=interpret,
    )(x4, y4, inf4, p_blk, one_blk)

    def from4(o):
        c = o.reshape(rows_n, cr, wpad)[:, :, :width]        # (rows, cr, w)
        if F2:
            c = jnp.stack([c[:, :nl], c[:, nl:]], 2)         # (r, nl, 2, w)
            return jnp.moveaxis(c, 0, 0).transpose(1, 2, 0, 3)
        return jnp.moveaxis(c, 1, 0)                         # (nl, rows, w)

    ys = tuple(jnp.moveaxis(from4(o), curve.ns, 0) for o in outs)
    lane_tot = tuple(
        jax.lax.index_in_dim(yl, rows_n - 1, axis=0, keepdims=False)
        for yl in ys)
    return lane_tot, ys
