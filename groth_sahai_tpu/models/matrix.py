"""Matrix / commitment-group algebra: full `Mat` + `B1/B2/BT` trait parity.

TPU-native analogue of the reference's generic dense-matrix trait and the
entry-wise commitment-group operations:

  * `Mat<Elem>`: add, neg, scalar_mul, transpose, left_mul, right_mul
    (/root/reference/src/data_structures.rs:37-46, field impl :768-913,
    Com impls via macro :545-747);
  * `B1/B2/BT` entry-wise ops: add, sub, neg, sum
    (/root/reference/src/data_structures.rs:51-123, macros :162-255);
  * `col_vec_to_vec` / `vec_to_col_vec` (:145-160) — in this framework a
    "column vector" IS an array axis, so these become reshape helpers.

Representations (structure-of-arrays, SURVEY.md section 7 design stance):

  * Fr matrix (I, J): uint32[17, I, J] standard-form limbs;
  * Com1/Com2 matrix (I, J): affine batch with batch shape (I, J) plus the
    leading B-pair axis where the object is a Com *vector* — the protocol
    layer keeps Com vectors as (2, k); these helpers treat ALL batch axes
    uniformly, so they work for (2, k) vectors, (I, J) matrices, or any
    other batch layout;
  * the reference's `is_parallel: bool` flag (rayon fork-join) has no
    analogue: XLA vectorizes everything by default (SURVEY.md section 2c).

The hot paths (commit, prove, verify) do NOT call these; they use the
shape-bucketed kernels in models/kernels.py. This module exists for API
parity, tests, and host-side tooling.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.fp import FR
from ..ops.tower import FQ12
from ..ops import pairing as pr
from . import commit_group as cg


# ---------------------------------------------------------------------------
# Fr matrices  (Mat<F> impl, data_structures.rs:768-913)
# ---------------------------------------------------------------------------

def fr_mat_add(a_std, b_std):
    """Entry-wise a + b mod r (canonical std-form output)."""
    return FR.normalize(FR.add(a_std, b_std), k=2)


def fr_mat_neg(a_std):
    """Entry-wise -a mod r."""
    return FR.normalize(FR.neg(a_std, k=1), k=1)


def fr_mat_scalar_mul(s_std, a_std):
    """s * A for one scalar s: uint32[17] x uint32[17, *shape]."""
    sm = FR.to_mont(s_std)
    shaped = sm.reshape(sm.shape[:1] + (1,) * (a_std.ndim - 1))
    return FR.normalize(FR.mul(shaped, a_std), k=2)


def fr_mat_transpose(a_std):
    """(I, J) -> (J, I) (axes 1 and 2 of the limb array)."""
    return jnp.swapaxes(a_std, 1, 2)


def fr_mat_mul(a_std, b_std):
    """(I, K) x (K, J) -> (I, J) mod r.

    Covers both `left_mul` (lhs x self) and `right_mul` (self x rhs) of the
    reference field impl (data_structures.rs:820-899): matrix product is
    the same primitive either way around.
    """
    from .kernels import fr_matmul_std
    return fr_matmul_std(a_std, b_std)


def vec_to_col_vec(v_std):
    """uint32[17, K] -> uint32[17, K, 1]  (data_structures.rs:154-160)."""
    return v_std[:, :, None]


def col_vec_to_vec(m_std):
    """uint32[17, K, 1] -> uint32[17, K]  (data_structures.rs:145-151)."""
    assert m_std.shape[-1] == 1
    return m_std[:, :, 0]


# ---------------------------------------------------------------------------
# Com1 / Com2 batches: entry-wise B ops (data_structures.rs:162-255)
# ---------------------------------------------------------------------------

def com_add(curve, a, b):
    """Entry-wise B addition of two affine Com batches (affine out)."""
    return curve.to_affine(curve.add(curve.from_affine(a),
                                     curve.from_affine(b)))


def com_sub(curve, a, b):
    """Entry-wise a - b."""
    return com_add(curve, a, curve.neg_affine(b))


def com_neg(curve, a):
    """Entry-wise negation (data_structures.rs macro `neg`)."""
    return curve.neg_affine(a)


def com_sum(curve, a, axis: int = 0):
    """B::sum over batch axis `axis` (data_structures.rs:62-64)."""
    j = curve.from_affine(a)
    # jacobian leaves put the batch axes after curve.ns structure axes
    return curve.to_affine(curve.sum_reduce(j, axis=axis))


def com_scalar_mul(curve, s_std, a):
    """Entry-wise [s] * entry for a single Fr scalar s (uint32[17])."""
    ns = curve.ns
    shaped = s_std.reshape(s_std.shape[:1] + (1,) * (a[2].ndim))
    return curve.to_affine(curve.scalar_mul(a, shaped))


def com_transpose(curve, a, ax0: int = 0, ax1: int = 1):
    """Swap two batch axes of a Com matrix."""
    ns = curve.ns
    return (jnp.swapaxes(a[0], ns + ax0, ns + ax1),
            jnp.swapaxes(a[1], ns + ax0, ns + ax1),
            jnp.swapaxes(a[2], ax0, ax1))


def com_matmul(curve, fr_mat_std, com_mat, affine_out: bool = True):
    """(I, K) Fr matrix x Com batch (K, *rest) -> Com batch (I, *rest).

    The one MSM-shaped primitive that every Mat<Com> product reduces to
    (SURVEY.md section 7 hard part 6): out[i, ...] = sum_k s[i,k] M[k, ...].
    One batched windowed scalar-mul + tree reduction instead of the
    reference's per-entry rayon tasks (data_structures.rs:696-742).
    """
    I = fr_mat_std.shape[1]
    rest = com_mat[2].shape[1:]
    pts = cg.aff_expand(curve, com_mat, 0, I)       # (I, K, *rest)
    # scalars (17, I, K) -> (17, I, K, 1 x len(rest)) to broadcast over rest
    s = fr_mat_std.reshape(fr_mat_std.shape + (1,) * len(rest))
    prods = curve.scalar_mul(pts, s)                # jacobian (I, K, *rest)
    out = curve.sum_reduce(prods, axis=1)           # contract K -> (I, *rest)
    return curve.to_affine(out) if affine_out else out


def com_left_mul(curve, fr_mat_std, com_mat, affine_out: bool = True):
    """`Mat<Com>::left_mul` (data_structures.rs:696-742): lhs x self."""
    return com_matmul(curve, fr_mat_std, com_mat, affine_out)


def com_right_mul(curve, com_mat, fr_mat_std, affine_out: bool = True):
    """Com (I, K) x Fr (K, J) -> Com (I, J) (data_structures.rs:645-694)."""
    out_t = com_matmul(curve, fr_mat_transpose(fr_mat_std),
                       com_transpose(curve, com_mat), affine_out)
    return com_transpose(curve, out_t)


# ---------------------------------------------------------------------------
# ComT (BT) full ops  (data_structures.rs:391-541)
# ---------------------------------------------------------------------------

def comt_pairing(com1_elem, com2_elem):
    """ComT::pairing (data_structures.rs:484-491): full 2x2 of pairings."""
    return pr.final_exp(cg.comt_pairing_miller(com1_elem, com2_elem))


def comt_pairing_sum(com1_vec, com2_vec):
    """ComT::pairing_sum (data_structures.rs:493-502): 4 multi-pairings,
    computed with a single shared final exponentiation."""
    return pr.final_exp(cg.comt_pairing_sum_miller(com1_vec, com2_vec))


def comt_add(a, b):
    """BT '+' = entry-wise GT multiplication (data_structures.rs:399-414)."""
    return FQ12.mul(a, b)


def comt_neg(a):
    """BT negation = entry-wise GT inverse (data_structures.rs:430-445)."""
    return FQ12.inv(a)


def comt_sub(a, b):
    return FQ12.mul(a, FQ12.inv(b))


def comt_sum(ts):
    """BT sum of a list of ComT values."""
    acc = ts[0]
    for t in ts[1:]:
        acc = FQ12.mul(acc, t)
    return acc


def comt_scalar_mul(s_std, a):
    """BT scalar mul = entry-wise GT exponentiation (data_structures.rs:448)."""
    return pr.gt_exp(a, s_std.reshape(s_std.shape[:1] + (1,) * (a.ndim - 2)))
