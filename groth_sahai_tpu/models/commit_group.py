"""The GS commitment-group algebra: B1 (= G1^2), B2 (= G2^2), BT (= GT^4).

TPU-native replacement for the reference's `Com1`/`Com2`/`ComT` structs and
`B1`/`B2`/`BT` traits (/root/reference/src/data_structures.rs:51-142,
:300-541). Structure-of-arrays everywhere:

  * a Com1 vector of length k = G1 affine batch with batch shape (2, k)
    (axis 0 = the B1 pair component, axis 1 = the vector index);
  * a Com2 vector likewise over G2;
  * a ComT batch = Fq12 coefficient array with batch shape (2, 2).

Shape conventions: an affine point batch is (x, y, inf); `inf` carries the
pure batch shape; coordinate arrays prepend the field structure axes
((nl,) for Fq / G1, (nl, 2) for Fq2 / G2). `curve.ns` gives the number of
structure axes so helpers stay generic over G1/G2.

Linear maps (citations to the reference for parity):
  * iota1(x)       = (O, x)                        data_structures.rs:310-312
  * iota2(y)       = (O, y)                        data_structures.rs:355-357
  * iota1'(x)      = x * (u2 + (O, g1))            data_structures.rs:323-326
  * iota2'(y)      = y * (v2 + (O, g2))            data_structures.rs:367-371
  * iotaT variants (PPE / MSMEG1 / MSMEG2 / quad)  data_structures.rs:509-540
  * ComT::pairing(_sum): 2x2 of (multi-)pairings   data_structures.rs:484-502
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.fp import FQ, FR
from ..ops.tower import FQ2, FQ12
from ..ops.curve import G1, G2
from ..ops import pairing as pr

# ---------------------------------------------------------------------------
# Affine batch utilities
# ---------------------------------------------------------------------------

def aff_map(curve, a, coord_fn, inf_fn):
    x, y, inf = a
    return (coord_fn(x), coord_fn(y), inf_fn(inf))


def aff_bcast(curve, a, batch_shape):
    """Broadcast an affine point (batch ()) over `batch_shape`."""
    ns, nb = curve.ns, len(batch_shape)
    return aff_map(
        curve, a,
        lambda l: jnp.broadcast_to(l.reshape(l.shape + (1,) * nb),
                                   l.shape + tuple(batch_shape)),
        lambda i: jnp.broadcast_to(i.reshape(i.shape + (1,) * nb),
                                   i.shape + tuple(batch_shape)))


def aff_expand(curve, a, axis, size):
    """Insert and broadcast a new batch axis at batch position `axis`."""
    ns = curve.ns

    def cf(l):
        ax = ns + axis
        l2 = jnp.expand_dims(l, ax)
        return jnp.broadcast_to(l2, l2.shape[:ax] + (size,) + l2.shape[ax + 1:])

    def inf_f(i):
        i2 = jnp.expand_dims(i, axis)
        return jnp.broadcast_to(i2, i2.shape[:axis] + (size,) + i2.shape[axis + 1:])

    return aff_map(curve, a, cf, inf_f)


def aff_index(curve, a, axis, i):
    """Index batch axis `axis` at position i."""
    ns = curve.ns
    return aff_map(curve, a,
                   lambda l: lax.index_in_dim(l, i, axis=ns + axis,
                                              keepdims=False),
                   lambda f: lax.index_in_dim(f, i, axis=axis,
                                              keepdims=False))


def aff_slice0(curve, a, axis, stop):
    """Slice batch axis `axis` to [0, stop)."""
    ns = curve.ns
    return aff_map(curve, a,
                   lambda l: lax.slice_in_dim(l, 0, stop, axis=ns + axis),
                   lambda f: lax.slice_in_dim(f, 0, stop, axis=axis))


def aff_stack(curve, elems, axis=0):
    """Stack affine batches along a new batch axis."""
    ns = curve.ns
    return (jnp.stack([e[0] for e in elems], axis=ns + axis),
            jnp.stack([e[1] for e in elems], axis=ns + axis),
            jnp.stack([e[2] for e in elems], axis=axis))


def aff_concat(curve, elems, axis=0):
    """Concatenate affine batches along existing batch axis `axis`."""
    ns = curve.ns
    return (jnp.concatenate([e[0] for e in elems], axis=ns + axis),
            jnp.concatenate([e[1] for e in elems], axis=ns + axis),
            jnp.concatenate([e[2] for e in elems], axis=axis))


# ---------------------------------------------------------------------------
# iota linear maps
# ---------------------------------------------------------------------------

def iota(curve, pts):
    """iota(x) = (O, x): affine batch (*b,) -> Com batch (2, *b)."""
    x, y, inf = pts
    ns = curve.ns
    cx = jnp.stack([jnp.zeros_like(x), x], axis=ns)
    cy = jnp.stack([jnp.zeros_like(y), y], axis=ns)
    cinf = jnp.stack([jnp.ones_like(inf), inf], axis=0)
    return (cx, cy, cinf)


def iota_prime_base(curve, key_vec, gen):
    """u2 + (O, g): the fixed Com element scaling scalar commitments.

    key_vec: CRS u (or v) as a Com vector (2, 2); gen: group generator ().
    Returns a Com element, batch (2,).
    """
    u2 = aff_index(curve, key_vec, 1, 1)         # Com element (2,)
    og = iota(curve, aff_bcast(curve, gen, ()))  # (2,)
    j = curve.add(curve.from_affine(u2), curve.from_affine(og))
    return curve.to_affine(j)


def iota_prime(curve, base_elem, scalars_std):
    """iota'(x) = x * (u2 + (O, g)): scalars (17, m) -> Com batch (2, m)."""
    m = scalars_std.shape[-1]
    b = aff_bcast(curve, base_elem, (m,))        # (2, m)
    return curve.scalar_mul(b, scalars_std[:, None, :])   # jacobian (2, m)


# ---------------------------------------------------------------------------
# Com arithmetic (the reference's Mat<Com> ops, data_structures.rs:545-747)
# ---------------------------------------------------------------------------

def com_matvec(curve, scal_std, com_vec):
    """(I, K) Fr matrix x Com vector (2, K) -> Com vector (2, I), Jacobian.

    scal_std: uint32[17, I, K] standard-form scalars.
    The reference computes this entry-by-entry with rayon
    (data_structures.rs:696-742). Here: for small K, one batched windowed
    scalar-mul over (2, I, K) plus a tree reduction over K; for K >= 16
    (the verifier's Gamma*d at m = n = 334 is 2*334 MSMs of length 334),
    a vmapped Pippenger MSM (ops/msm.py) -- ~4x fewer group ops.
    """
    I, K = scal_std.shape[1], scal_std.shape[2]
    if K >= 16:
        from ..ops import msm as msm_mod
        w = 4 if K < 512 else 8
        oa = (curve.ns,) * 3

        def one(p, s):
            return msm_mod.msm(curve, p, s, window=w)

        inner = jax.vmap(one, in_axes=(None, 1), out_axes=oa)
        outer = jax.vmap(inner, in_axes=((curve.ns, curve.ns, 0), None),
                         out_axes=oa)
        return outer(com_vec, scal_std)          # jac (2, I)
    pts = aff_expand(curve, com_vec, 1, I)       # (2, I, K)
    prods = curve.scalar_mul(pts, scal_std[:, None, :, :])   # jac (2, I, K)
    return curve.sum_reduce(prods, axis=2)       # jac (2, I)


def com_collapse(curve, scal_std, com_vec):
    """sum_k s_k * C_k: scalars (17, K) x Com (2, K) -> Com element (2,)."""
    prods = curve.scalar_mul(com_vec, scal_std[:, None, :])
    return curve.sum_reduce(prods, axis=1)


def com_add_aff(curve, a, b):
    return curve.to_affine(curve.add(curve.from_affine(a),
                                     curve.from_affine(b)))


# ---------------------------------------------------------------------------
# ComT: 2x2 GT matrices
# ---------------------------------------------------------------------------

def comt_pairing_sum_miller(com1, com2):
    """Miller part of ComT::pairing_sum.

    com1: Com1 vector (2, k); com2: Com2 vector (2, k). Returns the
    UNexponentiated Fq12 with batch (2, 2): entry [i, j] = prod_k
    miller(com1[i, k], com2[j, k]). Callers multiply several of these
    together and run ONE final exponentiation -- cheaper than the
    reference's per-entry multi_pairing (data_structures.rs:493-502).
    """
    P = aff_expand(G1, com1, 1, 2)     # (2, 2, k): [i, j, k] P = com1[i, k]
    Q = aff_expand(G2, com2, 0, 2)     # (2, 2, k): Q = com2[j, k]
    f = pr.miller_loop(P, Q)           # (nl, 12, 2, 2, k)
    return pr._product_reduce(f, axis=2)


def comt_pairing_miller(com1_elem, com2_elem):
    """Single-pair ComT::pairing Miller part: (2,) x (2,) -> (2, 2)."""
    P = aff_expand(G1, com1_elem, 1, 2)   # (2, 2)
    Q = aff_expand(G2, com2_elem, 0, 2)
    return pr.miller_loop(P, Q)


def comt_eq(a, b):
    """ComT equality = 4 GT equalities (data_structures.rs:391-396)."""
    return jnp.all(FQ12.eq(a, b), axis=(0, 1))


def comt_mul(a, b):
    """BT 'addition' (the reference's +) = entry-wise GT multiplication."""
    return FQ12.mul(a, b)


def comt_one(batch_shape=()):
    return FQ12.one((2, 2) + tuple(batch_shape))
