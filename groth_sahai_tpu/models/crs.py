"""CRS (trusted setup) for the SXDH instantiation.

TPU-native analogue of /root/reference/src/generator.rs:36-119:
  u = [(p1, q1), (u1, v1)]  with q1 = a1 p1, u1 = t1 p1, v1 = t1 q1  (binding)
  v = [(p2, q2), (u2, v2)]  symmetric over G2
  plus generators (g1, g2, gt = e(g1, g2)).

Also precomputes the iota' base elements u2 + (O, g1) and v2 + (O, g2)
(data_structures.rs:323-326, :367-371) used by scalar commitments and the
MSME/quadratic target maps.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ..ops.fp import FR
from ..ops.curve import G1, G2, g1_affine_from_ints, g2_affine_from_ints
from ..ops import bls12_381 as C
from ..ops import pairing as pr
from ..utils.rng import GsRng
from . import commit_group as cg


@jax.tree_util.register_dataclass
@dataclass
class CRS:
    u: Any          # Com1 vector (2, 2): [[p1, q1], [u1, v1]] along pair axis
    v: Any          # Com2 vector (2, 2)
    g1_gen: Any     # G1 affine ()
    g2_gen: Any     # G2 affine ()
    gt_gen: Any     # Fq12 (nl, 12)
    u_base: Any     # u2 + (O, g1): iota1' base, Com1 element (2,)
    v_base: Any     # v2 + (O, g2): iota2' base, Com2 element (2,)


def _hidden_key_parts(gen_j, q_j, t_std, curve, hiding: bool, gen_aff):
    """v_i = t_i * q_i (- g_i if hiding)  (generator.rs:48-77)."""
    qt = curve.scalar_mul(curve.to_affine(q_j), t_std)
    if hiding:
        qt = curve.add_mixed(qt, curve.neg_affine(gen_aff))
    return qt


from functools import partial as _partial


@_partial(jax.jit, static_argnums=0)
def _crs_build(hiding, r1, r2, a1, a2, t1, t2):
    g1 = g1_affine_from_ints([(C.G1_GEN_X, C.G1_GEN_Y)])
    g2 = g2_affine_from_ints([(C.G2_GEN_X, C.G2_GEN_Y)])
    g1 = cg.aff_index(G1, g1, 0, 0)
    g2 = cg.aff_index(G2, g2, 0, 0)
    p1j = G1.scalar_mul(g1, r1)
    p2j = G2.scalar_mul(g2, r2)
    p1 = G1.to_affine(p1j)
    p2 = G2.to_affine(p2j)
    q1j = G1.scalar_mul(p1, a1)
    q2j = G2.scalar_mul(p2, a2)
    u1j = G1.scalar_mul(p1, t1)
    u2j = G2.scalar_mul(p2, t2)
    v1j = _hidden_key_parts(None, q1j, t1, G1, hiding, p1)
    v2j = _hidden_key_parts(None, q2j, t2, G2, hiding, p2)
    q1, u1, v1 = G1.to_affine(q1j), G1.to_affine(u1j), G1.to_affine(v1j)
    q2, u2, v2 = G2.to_affine(q2j), G2.to_affine(u2j), G2.to_affine(v2j)
    # batch layout (pair, elem): pair 0 holds (p, u), pair 1 holds (q, v)
    u = cg.aff_stack(G1, [cg.aff_stack(G1, [p1, u1], axis=0),
                          cg.aff_stack(G1, [q1, v1], axis=0)], axis=0)
    v = cg.aff_stack(G2, [cg.aff_stack(G2, [p2, u2], axis=0),
                          cg.aff_stack(G2, [q2, v2], axis=0)], axis=0)
    gt = pr.pairing(p1, p2)
    u_base = cg.iota_prime_base(G1, u, p1)
    v_base = cg.iota_prime_base(G2, v, p2)
    return u, v, p1, p2, gt, u_base, v_base


def generate_crs(rng: GsRng, hiding: bool = False) -> CRS:
    """Sample a binding (default) or hiding CRS (generator.rs:81-118).

    Draw order matches the reference: p1, p2, a1, a2, t1, t2.
    """
    r1 = rng.fr_std(())
    r2 = rng.fr_std(())
    a1 = rng.fr_std(())
    a2 = rng.fr_std(())
    t1 = rng.fr_std(())
    t2 = rng.fr_std(())
    u, v, p1, p2, gt, u_base, v_base = _crs_build(
        hiding, r1, r2, a1, a2, t1, t2)
    return CRS(u=u, v=v, g1_gen=p1, g2_gen=p2, gt_gen=gt,
               u_base=u_base, v_base=v_base)
