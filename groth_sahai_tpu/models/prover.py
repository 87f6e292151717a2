"""GS commitments and the unified prover.

TPU-native analogue of /root/reference/src/prover/commit.rs (commitments)
and prove.rs (proofs). The reference implements four nearly identical
~100-line provers (prove.rs:92-171, :174-275, :277-380, :382-489); here a
single generic routine serves all four equation types, parameterised by
which side is scalar-committed (SURVEY.md section 7 design stance):

  pi    = R^T iota*(B) + (R^T Gamma) iota*(Y) + (R^T Gamma S - T^T) v[:wy]
  theta = S^T iota*(A) + (S^T Gamma^T) iota*(X) + T u[:wx]

with R (m x wx), S (n x wy), T (wy x wx); wx/wy = 2 for group-committed
sides, 1 for scalar-committed sides. Randomness is passed explicitly
(functional style) or drawn from a GsRng by the convenience wrappers.

All heavy work happens in the shape-bucketed jitted kernels of
models/kernels.py so compiled executables are shared across equation
types and sizes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..ops.fp import FR
from ..ops.curve import G1, G2
from ..utils.rng import GsRng
from . import commit_group as cg
from . import kernels as K
from .kernels import fr_matmul, fr_transpose, fr_sub_std, fr_matmul_std
from .crs import CRS
from .statement import EquType


# ---------------------------------------------------------------------------
# Commitments (commit.rs:58-256)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclass
class Commit1:
    coms: Any            # Com1 vector (2, m) affine
    rand: Any            # uint32[17, m, wx] std-form
    # Per-row true randomness widths, or None when uniform (= rand's last
    # dim). Set by mixed-kind `append` (the reference's ragged Vec<Vec<Fr>>,
    # commit.rs:42-52): narrower rows are zero-padded in `rand` (r*u1 ==
    # r*u1 + 0*u2, so padding is algebraically neutral) and their true
    # widths recorded here so serde reproduces the ragged reference layout.
    row_widths: Any = field(default=None, metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclass
class Commit2:
    coms: Any            # Com2 vector (2, n) affine
    rand: Any            # uint32[17, n, wy] std-form
    row_widths: Any = field(default=None, metadata=dict(static=True))


def _commit_group(curve, key_vec, vars_aff, rand_std):
    """c = iota(X) + R u   (commit.rs:78-100 batched form)."""
    lin = cg.iota(curve, vars_aff)                   # (2, m) affine
    # rand (17, m, 2) contracts with the key's element axis
    ru = K.com_matvec(curve, rand_std, key_vec)      # jac (2, m)
    return K.to_affine(curve, K.point_add(curve, curve.from_affine(lin), ru))


def _commit_scalar(curve, key_vec, base_elem, scalar_vars_std, rand_std):
    """c = iota'(x) + r u1   (commit.rs:103-156 batched form)."""
    lin = K.iota_prime(curve, base_elem, scalar_vars_std)    # jac (2, m)
    u1 = cg.aff_index(curve, key_vec, 1, 0)
    m = scalar_vars_std.shape[-1]
    u1b = cg.aff_bcast(curve, u1, (m,))                      # (2, m)
    ru = K.scalar_mul_vec(curve, u1b, rand_std[:, :, 0])     # jac (2, m)
    return K.to_affine(curve, K.point_add(curve, lin, ru))


def batch_commit_G1(xvars, crs: CRS, rng: Optional[GsRng] = None,
                    rand=None) -> Commit1:
    m = xvars[2].shape[-1]
    if rand is None:
        rand = rng.fr_std((m, 2))
    return Commit1(coms=_commit_group(G1, crs.u, xvars, rand), rand=rand)


def batch_commit_G2(yvars, crs: CRS, rng: Optional[GsRng] = None,
                    rand=None) -> Commit2:
    n = yvars[2].shape[-1]
    if rand is None:
        rand = rng.fr_std((n, 2))
    return Commit2(coms=_commit_group(G2, crs.v, yvars, rand), rand=rand)


def batch_commit_scalar_B1(scalar_xvars, crs: CRS,
                           rng: Optional[GsRng] = None, rand=None) -> Commit1:
    m = scalar_xvars.shape[-1]
    if rand is None:
        rand = rng.fr_std((m, 1))
    return Commit1(coms=_commit_scalar(G1, crs.u, crs.u_base,
                                       scalar_xvars, rand), rand=rand)


def batch_commit_scalar_B2(scalar_yvars, crs: CRS,
                           rng: Optional[GsRng] = None, rand=None) -> Commit2:
    n = scalar_yvars.shape[-1]
    if rand is None:
        rand = rng.fr_std((n, 1))
    return Commit2(coms=_commit_scalar(G2, crs.v, crs.v_base,
                                       scalar_yvars, rand), rand=rand)


def _widths_of(c) -> tuple:
    if c.row_widths is not None:
        return tuple(c.row_widths)
    return (int(c.rand.shape[-1]),) * int(c.rand.shape[1])


def _pad_rand(rand, to_w: int):
    w = rand.shape[-1]
    if w == to_w:
        return rand
    return jnp.pad(rand, ((0, 0), (0, 0), (0, to_w - w)))


def _append_commits(cls, curve, a, b):
    """Commit::append (commit.rs:42-52): concatenate commitment vectors.

    The reference's rand is a ragged Vec<Vec<Fr>> (group rows w=2, scalar
    rows w=1) and append just concatenates rows. Here mixed-kind appends
    zero-pad the narrower rows (algebraically neutral: r*u1 == r*u1 + 0*u2)
    and record true per-row widths for ragged-exact serde round-trips.
    """
    wa, wb = int(a.rand.shape[-1]), int(b.rand.shape[-1])
    w = max(wa, wb)
    rand = jnp.concatenate([_pad_rand(a.rand, w), _pad_rand(b.rand, w)],
                           axis=1)
    widths = None
    if wa != wb or a.row_widths is not None or b.row_widths is not None:
        widths = _widths_of(a) + _widths_of(b)
    return cls(coms=cg.aff_concat(curve, [a.coms, b.coms], axis=1),
               rand=rand, row_widths=widths)


def append_commit1(a: Commit1, b: Commit1) -> Commit1:
    return _append_commits(Commit1, G1, a, b)


def append_commit2(a: Commit2, b: Commit2) -> Commit2:
    return _append_commits(Commit2, G2, a, b)


# ---------------------------------------------------------------------------
# Proofs
# ---------------------------------------------------------------------------

@dataclass
class EquProof:
    pi: Any              # Com2 vector (2, wx) affine
    theta: Any           # Com1 vector (2, wy) affine
    equ_type: EquType


@dataclass
class CProof:
    """Commitments + per-equation proofs (prove.rs:64-69).

    NOTE: unlike the reference, the private proof randomness T is NOT kept
    on the proof object (the reference serializes it -- prove.rs:60 -- which
    leaks prover randomness; SURVEY.md section 5 flags this as a defect we
    fix).
    """
    xcoms: Commit1
    ycoms: Commit2
    equ_proofs: list


def _iota_side(curve, is_scalar, consts_or_vars, base_elem):
    """iota(X) or iota'(x), affine Com batch (2, k)."""
    if is_scalar:
        return K.to_affine(curve,
                           K.iota_prime(curve, base_elem, consts_or_vars))
    return cg.iota(curve, consts_or_vars)


def _prove_kernel(x_is_scalar, y_is_scalar,
                  xvars, yvars, gamma, a_consts, b_consts,
                  R, S, T, crs):
    """The unified prover (see module docstring for the formulas)."""
    wx = R.shape[-1]
    wy = S.shape[-1]
    Rt = fr_transpose(R)                          # (wx, m)
    St = fr_transpose(S)                          # (wy, n)

    # ---- pi ---------------------------------------------------------------
    iota_b = _iota_side(G2, y_is_scalar, b_consts, crs.v_base)       # (2, m)
    pi1 = K.com_matvec(G2, Rt, iota_b)            # jac (2, wx)
    rg = fr_matmul(Rt, gamma)                     # (wx, n)
    iota_y = _iota_side(G2, y_is_scalar, yvars, crs.v_base)          # (2, n)
    pi2 = K.com_matvec(G2, rg, iota_y)            # jac (2, wx)
    rgs = fr_matmul(rg, S)                        # (wx, wy)
    pf = fr_sub_std(rgs, fr_transpose(T))         # (wx, wy)
    v_used = cg.aff_slice0(G2, crs.v, 1, wy)
    pi3 = K.com_matvec(G2, pf, v_used)            # jac (2, wx)
    pi = K.to_affine(G2, K.point_add(G2, K.point_add(G2, pi1, pi2), pi3))

    # ---- theta ------------------------------------------------------------
    iota_a = _iota_side(G1, x_is_scalar, a_consts, crs.u_base)       # (2, n)
    th1 = K.com_matvec(G1, St, iota_a)            # jac (2, wy)
    sgt = fr_matmul(St, fr_transpose(gamma))      # (wy, m)
    iota_x = _iota_side(G1, x_is_scalar, xvars, crs.u_base)          # (2, m)
    th2 = K.com_matvec(G1, sgt, iota_x)           # jac (2, wy)
    u_used = cg.aff_slice0(G1, crs.u, 1, wx)
    th3 = K.com_matvec(G1, T, u_used)             # jac (2, wy)
    theta = K.to_affine(G1, K.point_add(G1, K.point_add(G1, th1, th2), th3))
    return pi, theta


def prove(equ, xvars, yvars, xcoms: Commit1, ycoms: Commit2, crs: CRS,
          rng: Optional[GsRng] = None, T=None) -> EquProof:
    """Produce (pi, theta) for an equation over committed variables.

    Mirrors `Provable::prove` (prove.rs:41-52); T is the (wy, wx) proof
    randomness (drawn from rng if not given; row-major draw order matches
    the reference's T sampling, prove.rs:123-126).
    """
    wx = xcoms.rand.shape[-1]
    wy = ycoms.rand.shape[-1]
    if T is None:
        T = rng.fr_std((wy, wx))
    pi, theta = _prove_kernel(
        equ.x_is_scalar, equ.y_is_scalar,
        xvars, yvars, equ.gamma, equ.a_consts, equ.b_consts,
        xcoms.rand, ycoms.rand, T, crs)
    return EquProof(pi=pi, theta=theta, equ_type=equ.equ_type)


def commit_and_prove(equ, xvars, yvars, crs: CRS, rng: GsRng) -> CProof:
    """Commit to both sides then prove (prove.rs:72-90 and analogues)."""
    if equ.x_is_scalar:
        xcoms = batch_commit_scalar_B1(xvars, crs, rng)
    else:
        xcoms = batch_commit_G1(xvars, crs, rng)
    if equ.y_is_scalar:
        ycoms = batch_commit_scalar_B2(yvars, crs, rng)
    else:
        ycoms = batch_commit_G2(yvars, crs, rng)
    proof = prove(equ, xvars, yvars, xcoms, ycoms, crs, rng)
    return CProof(xcoms=xcoms, ycoms=ycoms, equ_proofs=[proof])
