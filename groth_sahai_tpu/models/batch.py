"""Batched (and randomized) verification over many equations at once.

New capability beyond the reference (which verifies one equation at a time,
verifier.rs:23-157): verify a batch of B same-shaped proofs -- ANY of the
four equation types -- with

  * `verify_batch`: vmapped signed-Miller-product ratios + ONE batched
    final exponentiation + per-equation equality checks; or
  * `verify_batch_randomized`: sample rho_b, raise each equation's pairing
    ratio to rho_b in GT, multiply everything into a single Fq12 value,
    apply ONE final exponentiation for the WHOLE batch, and compare against
    the rho-weighted product of targets (identity for non-PPE types, whose
    iota_T target joins the Miller product as a conjugated pairing pair).

Multi-chip: pass a `jax.sharding.Mesh` -- the equations axis is reshaped to
(D, B/D), sharded with a NamedSharding, and the per-device partials merge
with the O(D) gather+reduce GSPMD pattern of parallel/sharded.py. This is
the BASELINE.json configs[4] capability (1024 batched PPE verifies) at
SURVEY.md section 7 step 7.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

from ..ops.fp import FR
from ..ops.tower import FQ12
from ..ops.curve import G1, G2
from ..ops import pairing as pr
from ..utils.rng import GsRng
from ..utils import metrics
from . import commit_group as cg
from .crs import CRS
from .statement import EquType
from .prover import _iota_side
from .verifier import _comt_ppe_target, _as_vec1, _target_pair


def _ratio_miller(ty: EquType, x_sc: bool, y_sc: bool, crs,
                  a, b, g, t, c, d, pi, th):
    """Unexponentiated lhs * conj(rhs) for ONE equation; (nl, 12, 2, 2).

    Same 5-term signed Miller product as verifier.verify (the non-PPE
    iota_T target joins the rhs as one extra conjugated pair). Traceable,
    so it vmaps over an equations axis.
    """
    is_ppe = ty == EquType.PairingProduct
    wx = pi[2].shape[-1]
    wy = th[2].shape[-1]
    iota_a = _iota_side(G1, x_sc, a, crs.u_base)
    iota_b = _iota_side(G2, y_sc, b, crs.v_base)
    gd = G2.to_affine(cg.com_matvec(G2, g, d))
    u_used = cg.aff_slice0(G1, crs.u, 1, wx)
    v_used = cg.aff_slice0(G2, crs.v, 1, wy)

    lhs1 = [iota_a, c, c]
    lhs2 = [d, iota_b, gd]
    rhs1 = [u_used, th]
    rhs2 = [pi, v_used]
    if not is_ppe:
        equ_view = _EquView(ty, t)
        tp1, tp2 = _target_pair(equ_view, crs)
        rhs1.append(_as_vec1(G1, tp1))
        rhs2.append(_as_vec1(G2, tp2))

    Pv = cg.aff_concat(G1, lhs1 + rhs1, axis=1)
    Qv = cg.aff_concat(G2, lhs2 + rhs2, axis=1)
    k_l = sum(int(v[2].shape[-1]) for v in lhs1)
    k_r = sum(int(v[2].shape[-1]) for v in rhs1)
    mask = jnp.asarray(np.array([False] * k_l + [True] * k_r))

    Pb = cg.aff_expand(G1, Pv, 1, 2)
    Qb = cg.aff_expand(G2, Qv, 0, 2)
    f = pr.miller_loop(Pb, Qb)                     # (nl, 12, 2, 2, K)
    fc = FQ12.conj(f)
    f = jnp.where(mask[None, None, None, None, :], fc, f)
    return pr._product_reduce(f, axis=2)


class _EquView:
    """Minimal equ-like view for verifier._target_pair inside traces."""

    def __init__(self, ty, target):
        self.equ_type = ty
        self.target = target


# ---------------------------------------------------------------------------
# stacking
# ---------------------------------------------------------------------------

def _stk(leaves):
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *leaves)


def _stack_equ_batch(equs):
    a = _stk([e.a_consts for e in equs])
    b = _stk([e.b_consts for e in equs])
    g = jnp.stack([e.gamma for e in equs])
    t = _stk([e.target for e in equs])
    return a, b, g, t


def _stack_proof_batch(proofs):
    c = _stk([p.xcoms.coms for p in proofs])
    d = _stk([p.ycoms.coms for p in proofs])
    pi = _stk([p.equ_proofs[0].pi for p in proofs])
    th = _stk([p.equ_proofs[0].theta for p in proofs])
    return c, d, pi, th


def _check_same_type(equs, proofs):
    ty = equs[0].equ_type
    assert all(e.equ_type == ty for e in equs), "mixed equation types"
    assert all(p.equ_proofs[0].equ_type == ty for p in proofs)
    return ty, equs[0].x_is_scalar, equs[0].y_is_scalar


# ---------------------------------------------------------------------------
# plain batched verification (per-equation verdicts)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(0, 1, 2))
def _batch_verify_kernel(ty, x_sc, y_sc, crs, a, b, g, t, c, d, pi, th):
    def one(a_, b_, g_, t_, c_, d_, p_, th_):
        return _ratio_miller(ty, x_sc, y_sc, crs,
                             a_, b_, g_, t_, c_, d_, p_, th_)

    ratio = jax.vmap(one, out_axes=2)(a, b, g, t, c, d, pi, th)
    res = pr.final_exp(ratio)                      # (nl, 12, B, 2, 2)
    if ty == EquType.PairingProduct:
        tgt = jax.vmap(_comt_ppe_target, in_axes=2, out_axes=2)(
            jnp.moveaxis(t, 0, 2))
    else:
        B = t[2].shape[0] if isinstance(t, tuple) else t.shape[0]
        tgt = FQ12.one((B, 2, 2))                  # (nl, 12, B, 2, 2)
    return jnp.all(FQ12.eq(res, tgt), axis=(-2, -1))


def verify_batch(equs, proofs, crs: CRS, mesh: Mesh | None = None,
                 axis: str = "chips"):
    """Verify B same-shape proofs (any single equation type); bool[B].

    With `mesh`, the equations axis shards over the mesh (B divisible by
    the device count).
    """
    ty, x_sc, y_sc = _check_same_type(equs, proofs)
    a, b, g, t = _stack_equ_batch(equs)
    c, d, pi, th = _stack_proof_batch(proofs)
    metrics.count("batch_verify_equations", len(equs))
    if mesh is None:
        ok = _batch_verify_kernel(ty, x_sc, y_sc, crs,
                                  a, b, g, t, c, d, pi, th)
        return np.asarray(ok)
    D = mesh.shape[axis]
    B = len(equs)
    assert B % D == 0, f"batch {B} not divisible by {D} devices"

    def shard(leaf):
        arr = leaf.reshape((D, B // D) + leaf.shape[1:])
        spec = [None] * arr.ndim
        spec[0] = axis
        return jax.device_put(arr, NamedSharding(mesh, P(*spec)))

    sharded = jax.tree_util.tree_map(shard, (a, b, g, t, c, d, pi, th))
    ok = _batch_verify_sharded(ty, x_sc, y_sc, crs, *sharded)
    return np.asarray(ok).reshape(B)


@partial(jax.jit, static_argnums=(0, 1, 2))
def _batch_verify_sharded(ty, x_sc, y_sc, crs, a, b, g, t, c, d, pi, th):
    def per_dev(a_, b_, g_, t_, c_, d_, p_, th_):
        def one(*args):
            return _ratio_miller(ty, x_sc, y_sc, crs, *args)

        ratio = jax.vmap(one, out_axes=2)(a_, b_, g_, t_, c_, d_, p_, th_)
        res = pr.final_exp(ratio)                  # (nl, 12, per, 2, 2)
        if ty == EquType.PairingProduct:
            tgt = jax.vmap(_comt_ppe_target, in_axes=2, out_axes=2)(
                jnp.moveaxis(t_, 0, 2))
        else:
            per = t_[2].shape[0] if isinstance(t_, tuple) else t_.shape[0]
            tgt = FQ12.one((per, 2, 2))            # (nl, 12, per, 2, 2)
        return jnp.all(FQ12.eq(res, tgt), axis=(-2, -1))   # (per,)

    return jax.vmap(per_dev)(a, b, g, t, c, d, pi, th)     # (D, per)


# ---------------------------------------------------------------------------
# randomized linear-combination verification (single verdict, ONE final exp)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(0, 1, 2))
def _batch_randomized_kernel(ty, x_sc, y_sc, crs,
                             a, b, g, t, c, d, pi, th, rho):
    def one(a_, b_, g_, t_, c_, d_, p_, th_):
        return _ratio_miller(ty, x_sc, y_sc, crs,
                             a_, b_, g_, t_, c_, d_, p_, th_)

    ratio = jax.vmap(one, out_axes=2)(a, b, g, t, c, d, pi, th)
    powed = pr.gt_exp(ratio, rho[:, :, None, None])        # (nl,12,B,2,2)
    combined = pr._product_reduce(powed, axis=0)           # (nl, 12, 2, 2)
    res = pr.final_exp(combined)
    if ty == EquType.PairingProduct:
        t_powed = pr.gt_exp(jnp.moveaxis(t, 0, 2), rho)    # (nl, 12, B)
        t_comb = pr._product_reduce(t_powed, axis=0)       # (nl, 12)
        expected = _comt_ppe_target(t_comb)
    else:
        expected = cg.comt_one()
    return jnp.all(FQ12.eq(res, expected))


def verify_batch_randomized(equs, proofs, crs: CRS, rng: GsRng,
                            mesh: Mesh | None = None, axis: str = "chips"):
    """Randomized combination check: error probability ~2^-255, ONE final
    exponentiation for the whole batch. Returns a single bool."""
    ty, x_sc, y_sc = _check_same_type(equs, proofs)
    a, b, g, t = _stack_equ_batch(equs)
    c, d, pi, th = _stack_proof_batch(proofs)
    B = len(equs)
    rho = rng.fr_std((B,))
    metrics.count("batch_verify_equations", B)
    if mesh is None:
        return bool(np.asarray(_batch_randomized_kernel(
            ty, x_sc, y_sc, crs, a, b, g, t, c, d, pi, th, rho)))
    D = mesh.shape[axis]
    assert B % D == 0, f"batch {B} not divisible by {D} devices"

    def shard(leaf):
        arr = leaf.reshape((D, B // D) + leaf.shape[1:])
        spec = [None] * arr.ndim
        spec[0] = axis
        return jax.device_put(arr, NamedSharding(mesh, P(*spec)))

    sharded = jax.tree_util.tree_map(
        shard, (a, b, g, t, c, d, pi, th, jnp.moveaxis(rho, 1, 0)))
    ok = _batch_randomized_sharded(ty, x_sc, y_sc, crs, *sharded)
    return bool(np.asarray(ok))


@partial(jax.jit, static_argnums=(0, 1, 2))
def _batch_randomized_sharded(ty, x_sc, y_sc, crs,
                              a, b, g, t, c, d, pi, th, rho):
    """Per-device rho-weighted partial products, O(D) merge, one final exp.

    rho arrives (D, per, 17) so the leading axis shards with the rest.
    """
    def per_dev(a_, b_, g_, t_, c_, d_, p_, th_, rho_):
        def one(*args):
            return _ratio_miller(ty, x_sc, y_sc, crs, *args)

        ratio = jax.vmap(one, out_axes=2)(a_, b_, g_, t_, c_, d_, p_, th_)
        powed = pr.gt_exp(ratio, jnp.moveaxis(rho_, 0, 1)[:, :, None, None])
        part = pr._product_reduce(powed, axis=0)           # (nl, 12, 2, 2)
        if ty == EquType.PairingProduct:
            tp = pr.gt_exp(jnp.moveaxis(t_, 0, 2), jnp.moveaxis(rho_, 0, 1))
            t_part = pr._product_reduce(tp, axis=0)        # (nl, 12)
        else:
            t_part = FQ12.one(())
        return part, t_part

    parts, t_parts = jax.vmap(per_dev, out_axes=(2, 2))(
        a, b, g, t, c, d, pi, th, rho)                     # (nl,12,D,2,2)
    combined = pr._product_reduce(parts, axis=0)
    res = pr.final_exp(combined)
    if ty == EquType.PairingProduct:
        expected = _comt_ppe_target(pr._product_reduce(t_parts, axis=0))
    else:
        expected = cg.comt_one()
    return jnp.all(FQ12.eq(res, expected))


# ---------------------------------------------------------------------------
# backwards-compatible PPE-named wrappers (round-2 API)
# ---------------------------------------------------------------------------

def verify_ppe_batch(equs, proofs, crs: CRS, mesh: Mesh | None = None):
    return verify_batch(equs, proofs, crs, mesh=mesh)


def verify_ppe_batch_randomized(equs, proofs, crs: CRS, rng: GsRng,
                                mesh: Mesh | None = None):
    return verify_batch_randomized(equs, proofs, crs, rng, mesh=mesh)
