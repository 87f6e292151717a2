"""Mat / B1/B2/BT trait parity + commit append + extended serde tests.

Mirrors the reference's in-file unit tests for matrix algebra
(data_structures.rs:1605-2633), commitment-group laws (:921-1603),
Commit::append (commit.rs:42-52 tests :294-335), and equation serde
(statement.rs:210-392).
"""

import random

import jax.numpy as jnp
import numpy as np

from groth_sahai_tpu.ops.fp import FR
from groth_sahai_tpu.ops.limbs import ints_to_limbs, limbs_to_ints
from groth_sahai_tpu.ops.curve import G1, G2, g1_affine_from_ints
from groth_sahai_tpu.ops.tower import FQ12
from groth_sahai_tpu.models import matrix as M
from groth_sahai_tpu.models.prover import (
    batch_commit_G1, batch_commit_G2, append_commit1, append_commit2)
from groth_sahai_tpu.models.crs import generate_crs
from groth_sahai_tpu.models.statement import PPE, MSMEG1, MSMEG2, QuadEqu, EquType
from groth_sahai_tpu.utils.rng import GsRng
from groth_sahai_tpu.utils import serde as S

from . import oracle as O
from .test_gs_e2e import o_g1, o_g2, dev_g1, dev_g2, dev_fr, dev_gt


def fr_mat(vals):
    """[[ints]] -> uint32[17, I, J] std limbs."""
    I, J = len(vals), len(vals[0])
    flat = [v % FR.p for row in vals for v in row]
    return jnp.asarray(ints_to_limbs(flat, FR.n)).reshape(FR.n, I, J)


def mat_ints(std):
    arr = np.asarray(std)
    I, J = arr.shape[1], arr.shape[2]
    return [[limbs_to_ints(arr[:, i, j][:, None])[0] for j in range(J)]
            for i in range(I)]


# ---------------------------------------------------------------------------
# Mat<F> parity (data_structures.rs:768-913 + tests :1605-1837)
# ---------------------------------------------------------------------------

def test_fr_matrix_ops():
    a = [[1, 2], [3, 4]]
    b = [[5, 6], [7, 8]]
    A, B = fr_mat(a), fr_mat(b)
    assert mat_ints(M.fr_mat_add(A, B)) == [[6, 8], [10, 12]]
    assert mat_ints(M.fr_mat_neg(A)) == [[FR.p - 1, FR.p - 2],
                                         [FR.p - 3, FR.p - 4]]
    s = dev_fr([3])[:, 0]
    assert mat_ints(M.fr_mat_scalar_mul(s, A)) == [[3, 6], [9, 12]]
    assert mat_ints(M.fr_mat_transpose(A)) == [[1, 3], [2, 4]]
    assert mat_ints(M.fr_mat_mul(A, B)) == [[19, 22], [43, 50]]
    # vec <-> col-vec helpers (data_structures.rs:145-160)
    v = dev_fr([9, 11])
    assert M.col_vec_to_vec(M.vec_to_col_vec(v)).shape == v.shape


# ---------------------------------------------------------------------------
# Mat<Com> parity (data_structures.rs:545-747 + tests :1947-2633)
# ---------------------------------------------------------------------------

def test_com_matrix_ops():
    g1o = O.G1_GEN
    # Com matrix (2, 2): rows index the B pair, cols the vector
    pts = [O.g1_mul(g1o, k) for k in (1, 2, 3, 4)]
    com = dev_g1(pts)
    com = tuple(l.reshape(l.shape[:-1] + (2, 2)) for l in com)

    # entry-wise add / sub / neg roundtrip: (a + b) - b == a
    com_b = tuple(jnp.flip(l, axis=-1) for l in com)
    s = M.com_add(G1, com, com_b)
    back = M.com_sub(G1, s, com_b)
    assert bool(np.asarray(jnp.all(G1.eq_affine(back, com))))

    # com_sum over the column axis == adding the columns
    total = M.com_sum(G1, com, axis=1)
    want = dev_g1([O.g1_add(pts[0], pts[1]), O.g1_add(pts[2], pts[3])])
    assert bool(np.asarray(jnp.all(G1.eq_affine(total, want))))

    # left_mul: [[2, 0], [1, 1]] x [g, 2g] == [2g, 3g]
    fr = fr_mat([[2, 0], [1, 1]])
    vec = dev_g1([O.g1_mul(g1o, 1), O.g1_mul(g1o, 2)])
    out = M.com_matmul(G1, fr, vec)
    want = dev_g1([O.g1_mul(g1o, 2), O.g1_mul(g1o, 3)])
    assert bool(np.asarray(jnp.all(G1.eq_affine(out, want))))

    # right_mul (I,K)x(K,J): com (1, 2) x fr (2, 1): [g, 2g] * [[3],[4]] = 11g
    com12 = tuple(l[..., None, :] if i < 2 else l[None, :]
                  for i, l in enumerate(vec))
    out2 = M.com_right_mul(G1, com12, fr_mat([[3], [4]]))
    want2 = dev_g1([O.g1_mul(g1o, 11)])
    w2 = tuple(l[..., None, :] if i < 2 else l[None, :]
               for i, l in enumerate(want2))
    assert bool(np.asarray(jnp.all(G1.eq_affine(out2, w2))))

    # scalar_mul: 5 * [g, 2g] == [5g, 10g]
    s5 = dev_fr([5])[:, 0]
    out3 = M.com_scalar_mul(G1, s5, vec)
    want3 = dev_g1([O.g1_mul(g1o, 5), O.g1_mul(g1o, 10)])
    assert bool(np.asarray(jnp.all(G1.eq_affine(out3, want3))))


# ---------------------------------------------------------------------------
# BT ops (data_structures.rs:391-541)
# ---------------------------------------------------------------------------

def test_comt_group_laws():
    e = O.pairing(O.G1_GEN, O.G2_GEN)
    from .test_tower import fq12_vals
    a = FQ12.from_ints([fq12_vals(e)])[:, :, 0]
    a = jnp.broadcast_to(a[:, :, None, None], a.shape + (2, 2))

    one = FQ12.one((2, 2))
    # a + (-a) == 0  (GT: a * a^-1 == 1)
    z = M.comt_add(a, M.comt_neg(a))
    assert bool(np.asarray(jnp.all(FQ12.eq(z, one))))
    # 2 * a == a + a
    two = dev_fr([2])[:, 0]
    lhs = M.comt_scalar_mul(two, a)
    rhs = M.comt_add(a, a)
    assert bool(np.asarray(jnp.all(FQ12.eq(lhs, rhs))))
    # sum
    srm = M.comt_sum([a, a, M.comt_neg(a)])
    assert bool(np.asarray(jnp.all(FQ12.eq(srm, a))))
    # sub
    assert bool(np.asarray(jnp.all(FQ12.eq(M.comt_sub(a, a), one))))


# ---------------------------------------------------------------------------
# Commit::append (commit.rs:42-52)
# ---------------------------------------------------------------------------

def test_commit_append():
    rng = GsRng(77)
    crs = generate_crs(GsRng(2024))
    xs = dev_g1([O.g1_mul(O.G1_GEN, 2), O.g1_mul(O.G1_GEN, 3)])
    r_all = rng.fr_std((2, 2))
    c_all = batch_commit_G1(xs, crs, rand=r_all)

    x0 = tuple(l[..., :1] for l in xs)
    x1 = tuple(l[..., 1:] for l in xs)
    c0 = batch_commit_G1(x0, crs, rand=r_all[:, :1])
    c1 = batch_commit_G1(x1, crs, rand=r_all[:, 1:])
    joined = append_commit1(c0, c1)
    assert bool(np.asarray(jnp.all(G1.eq_affine(joined.coms, c_all.coms))))
    assert np.array_equal(np.asarray(joined.rand), np.asarray(c_all.rand))
