"""Batched (and randomized) verification over many equations at once.

New capability beyond the reference (which verifies one equation at a time,
verifier.rs:23-157): verify a batch of B same-shaped PPE proofs with

  * `verify_ppe_batch`: vmapped Miller/ratio computation + ONE batched
    final exponentiation + per-equation equality checks; or
  * `verify_ppe_batch_randomized`: sample rho_b, raise each equation's
    pairing ratio to rho_b in GT, multiply everything into a single Fq12
    value, apply ONE final exponentiation, and compare against the
    rho-weighted product of targets. Statistically sound (error 2^-255-ish)
    and amortizes the final exp + equality over the whole batch.

This is configs[4] of BASELINE.json (1024 batched PPE verifies) and step 7
of SURVEY.md's build plan.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.fp import FR
from ..ops.tower import FQ12
from ..ops.curve import G1, G2
from ..ops import pairing as pr
from ..utils.rng import GsRng
from . import commit_group as cg
from .crs import CRS
from .verifier import _comt_ppe_target


def _ppe_ratio_miller(a_consts, b_consts, gamma, c_coms, d_coms,
                      pi, theta, crs):
    """Unexponentiated lhs * conj(rhs) for one PPE; (nl, 12, 2, 2)."""
    iota_a = cg.iota(G1, a_consts)
    iota_b = cg.iota(G2, b_consts)
    gd = G2.to_affine(cg.com_matvec(G2, gamma, d_coms))
    lhs1 = cg.aff_concat(G1, [iota_a, c_coms, c_coms], axis=1)
    lhs2 = cg.aff_concat(G2, [d_coms, iota_b, gd], axis=1)
    f_l = cg.comt_pairing_sum_miller(lhs1, lhs2)
    u_used = cg.aff_slice0(G1, crs.u, 1, 2)
    v_used = cg.aff_slice0(G2, crs.v, 1, 2)
    f_r = cg.comt_pairing_sum_miller(cg.aff_concat(G1, [u_used, theta], axis=1),
                                     cg.aff_concat(G2, [pi, v_used], axis=1))
    return FQ12.mul(f_l, FQ12.conj(f_r))


def _stack_proof_batch(proofs):
    """List of CProof -> stacked arrays with a leading batch axis."""
    def stk(leaves):
        return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *leaves)

    c = stk([p.xcoms.coms for p in proofs])
    d = stk([p.ycoms.coms for p in proofs])
    pi = stk([p.equ_proofs[0].pi for p in proofs])
    th = stk([p.equ_proofs[0].theta for p in proofs])
    return c, d, pi, th


def _stack_equ_batch(equs):
    def stk(leaves):
        return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *leaves)

    a = stk([e.a_consts for e in equs])
    b = stk([e.b_consts for e in equs])
    g = jnp.stack([e.gamma for e in equs])
    t = jnp.stack([e.target for e in equs])
    return a, b, g, t


def verify_ppe_batch(equs, proofs, crs: CRS):
    """Verify B same-shape PPE proofs; returns bool[B]."""
    a, b, g, t = _stack_equ_batch(equs)
    c, d, pi, th = _stack_proof_batch(proofs)
    ok = jax.jit(_batch_kernel_run)(a, b, g, t, c, d, pi, th, crs)
    return np.asarray(ok)


def _batch_kernel_run(a, b, g, t, c, d, pi, th, crs):
    def one(a_, b_, g_, c_, d_, p_, t_):
        return _ppe_ratio_miller(a_, b_, g_, c_, d_, p_, t_, crs)

    # vmap over the leading batch axis of every stacked pytree
    ratio = jax.vmap(one, out_axes=2)(a, b, g, c, d, pi, th)
    res = pr.final_exp(ratio)                     # (nl, 12, B, 2, 2)
    tgt = jax.vmap(_comt_ppe_target, in_axes=2, out_axes=2)(
        jnp.moveaxis(t, 0, 2))                    # (nl, 12, B, 2, 2)
    return jnp.all(FQ12.eq(res, tgt), axis=(-2, -1))


def verify_ppe_batch_randomized(equs, proofs, crs: CRS, rng: GsRng):
    """Randomized linear-combination batch verification; returns bool.

    Checks prod_b (lhs_b rhs_b^-1)^rho_b == prod_b iota_T(t_b)^rho_b with a
    SINGLE final exponentiation for the whole batch.
    """
    a, b, g, t = _stack_equ_batch(equs)
    c, d, pi, th = _stack_proof_batch(proofs)
    B = t.shape[0]
    rho = rng.fr_std((B,))

    def one(a_, b_, g_, c_, d_, p_, t_):
        return _ppe_ratio_miller(a_, b_, g_, c_, d_, p_, t_, crs)

    ratio = jax.vmap(one, out_axes=2)(a, b, g, c, d, pi, th)  # (nl,12,B,2,2)
    powed = pr.gt_exp(ratio, rho[:, :, None, None])           # rho_b exponent
    combined = pr._product_reduce(powed, axis=0)              # (nl, 12, 2, 2)
    res = pr.final_exp(combined)
    # expected: prod_b iota_T(t_b)^rho_b = (1, 1, 1, prod t_b^rho_b)
    t_powed = pr.gt_exp(jnp.moveaxis(t, 0, 2), rho)           # (nl, 12, B)
    t_comb = pr._product_reduce(t_powed, axis=0)              # (nl, 12)
    expected = _comt_ppe_target(t_comb)
    return bool(np.asarray(jnp.all(FQ12.eq(res, expected))))
