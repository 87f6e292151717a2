"""Shape-bucketed jitted kernels shared by commit / prove / verify.

XLA compiles one executable per (function, shape) pair; without care every
equation type and size would recompile multi-minute pairing graphs. This
module provides the protocol layer's heavy primitives as MODULE-LEVEL jits
with all variable-length axes padded to powers of two:

  * padding points with infinity and scalars with zero is semantically
    neutral for sums/MSMs, and an infinity pair contributes the identity to
    a Miller-loop product (ops/pairing.py);
  * the verifier's five pairing_sum terms plus the rhs fold become ONE
    signed Miller product (`miller_product_signed`) whose conjugation mask
    is data, so a single compiled kernel serves every equation type of the
    same padded size;
  * `final_exp` compiles exactly once for the (2, 2) ComT shape.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.fp import FR
from ..ops.tower import FQ12
from ..ops.curve import G1, G2
from ..ops import pairing as pr
from . import commit_group as cg


def next_pow2(k: int) -> int:
    return 1 if k <= 1 else 1 << (k - 1).bit_length()


# ---------------------------------------------------------------------------
# padding helpers (host-driven, shapes static)
# ---------------------------------------------------------------------------

def pad_aff(curve, a, axis: int, to: int):
    """Pad an affine batch axis with points at infinity."""
    n = a[2].shape[axis]
    if n == to:
        return a
    ns = curve.ns

    def padc(l):
        widths = [(0, 0)] * l.ndim
        widths[ns + axis] = (0, to - n)
        return jnp.pad(l, widths)

    def padi(i):
        widths = [(0, 0)] * i.ndim
        widths[axis] = (0, to - n)
        return jnp.pad(i, widths, constant_values=True)

    return (padc(a[0]), padc(a[1]), padi(a[2]))


def pad_scal(s, axis: int, to: int):
    """Pad a scalar-limb array batch axis with zeros (axis counts from the
    limb axis: axis=1 is the first batch axis)."""
    n = s.shape[axis]
    if n == to:
        return s
    widths = [(0, 0)] * s.ndim
    widths[axis] = (0, to - n)
    return jnp.pad(s, widths)


# ---------------------------------------------------------------------------
# jitted primitives
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=0)
def _com_matvec_jit(curve, scal_std, com_vec):
    return cg.com_matvec(curve, scal_std, com_vec)


def com_matvec(curve, scal_std, com_vec):
    """Padded + jitted (I, K) x Com(2, K) -> jac Com(2, I)."""
    from ..utils import metrics
    I, K = scal_std.shape[1], scal_std.shape[2]
    metrics.count("com_matvec_points", 2 * I * K)
    Kp = next_pow2(K)
    out = _com_matvec_jit(curve, pad_scal(scal_std, 2, Kp),
                          pad_aff(curve, com_vec, 1, Kp))
    return out


@partial(jax.jit, static_argnums=0)
def _to_affine_jit(curve, jac):
    return curve.to_affine(jac)


def to_affine(curve, jac):
    return _to_affine_jit(curve, jac)


@partial(jax.jit, static_argnums=0)
def _add_jit(curve, a, b):
    return curve.add(a, b)


def point_add(curve, a, b):
    return _add_jit(curve, a, b)


@partial(jax.jit, static_argnums=0)
def _scalar_mul_jit(curve, pts, scal):
    return curve.scalar_mul(pts, scal)


def scalar_mul(curve, pts, scal):
    return _scalar_mul_jit(curve, pts, scal)


@partial(jax.jit, static_argnums=0)
def _iota_prime_jit(curve, base_elem, scalars_std):
    return cg.iota_prime(curve, base_elem, scalars_std)


def iota_prime(curve, base_elem, scalars_std, m: int | None = None):
    """iota'(x), padded to pow2 and sliced back to m."""
    m = scalars_std.shape[-1] if m is None else m
    mp = next_pow2(m)
    out = _iota_prime_jit(curve, base_elem, pad_scal(scalars_std, 1, mp))
    ns = curve.ns
    return jax.tree_util.tree_map(
        lambda l: jax.lax.slice_in_dim(l, 0, m, axis=ns + 1), out)


@jax.jit
def _miller_product_signed_jit(P, Q, conj_mask):
    """prod_k f_k^(+-1): (2, 2, K) miller batch with per-k conjugation.

    conj_mask: bool[K]; True entries contribute their conjugate (the rhs
    fold: final_exp(conj(f)) == final_exp(f)^-1).
    """
    f = pr.miller_loop(P, Q)                    # (nl, 12, 2, 2, K)
    fc = FQ12.conj(f)
    f = jnp.where(conj_mask[None, None, None, None, :], fc, f)
    return pr._product_reduce(f, axis=2)        # (nl, 12, 2, 2)


def miller_product_signed(com1_concat, com2_concat, conj_mask_np):
    """Pad the pair axis to pow2 and run the shared Miller-product kernel.

    com1_concat: Com1 vector (2, K); com2_concat: Com2 vector (2, K);
    conj_mask_np: numpy bool (K,).
    """
    K = com1_concat[2].shape[-1]
    Kp = next_pow2(K)
    P = pad_aff(G1, com1_concat, 1, Kp)
    Q = pad_aff(G2, com2_concat, 1, Kp)
    mask = jnp.asarray(np.pad(conj_mask_np, (0, Kp - K)))
    Pb = cg.aff_expand(G1, P, 1, 2)             # (2, 2, Kp)
    Qb = cg.aff_expand(G2, Q, 0, 2)
    return _miller_product_signed_jit(Pb, Qb, mask)


@jax.jit
def final_exp(f):
    return pr.final_exp(f)


def fr_matmul_std(a_std, b_std):
    """(I, K) x (K, J) Fr matmul on std-form limbs; canonical std output.

    One wide-domain product batch + tree add + single redc per entry
    (mont(a) * std(b) -> std(a*b)). Replaces the reference's Mat<F> ops
    (data_structures.rs:768-913).
    """
    am = FR.to_mont(a_std)                       # (17, I, K)
    wide = FR.mul_wide(am[:, :, :, None], b_std[:, None, :, :])  # (35,I,K,J)
    s = _add_wide_reduce(wide, axis=2)           # contract K (array axis 2)
    return FR.normalize(FR.redc(s), k=2)


def _add_wide_reduce(w, axis):
    """Tree-sum wide values along ARRAY axis `axis` (axis 0 is limbs)."""
    ax = axis
    size = w.shape[ax]
    while size > 1:
        half = size // 2
        a = jax.lax.slice_in_dim(w, 0, half, axis=ax)
        b = jax.lax.slice_in_dim(w, half, 2 * half, axis=ax)
        s = FR.add_wide(a, b)
        if size % 2:
            s = jnp.concatenate(
                [s, jax.lax.slice_in_dim(w, 2 * half, size, axis=ax)],
                axis=ax)
            size = half + 1
        else:
            size = half
        w = s
    return jax.lax.index_in_dim(w, 0, axis=ax, keepdims=False)


def fr_transpose(a_std):
    return jnp.swapaxes(a_std, 1, 2)


@jax.jit
def _fr_sub_jit(a_std, b_std):
    return FR.normalize(FR.sub(a_std, b_std, k=2), k=4)


def fr_sub_std(a_std, b_std):
    """Canonical a - b mod r on std limbs (jitted)."""
    return _fr_sub_jit(a_std, b_std)


_fr_matmul_jit = jax.jit(fr_matmul_std)


def fr_matmul(a_std, b_std):
    """Padded jitted Fr matmul (pads the contraction axis)."""
    K = a_std.shape[2]
    Kp = next_pow2(K)
    return _fr_matmul_jit(pad_scal(a_std, 2, Kp), pad_scal(b_std, 1, Kp))


@partial(jax.jit, static_argnums=0)
def _scalar_mul_pad_jit(curve, pts, scal):
    return curve.scalar_mul(pts, scal)


def scalar_mul_vec(curve, pts, scal_vec):
    """[s_i] P_i over a Com-style (2, m) batch, padded to pow2 and sliced.

    scal_vec: uint32[17, m] (one scalar per vector element).
    """
    m = pts[2].shape[-1]
    mp = next_pow2(m)
    out = _scalar_mul_pad_jit(curve, pad_aff(curve, pts, 1, mp),
                              pad_scal(scal_vec, 1, mp)[:, None, :])
    ns = curve.ns
    return jax.tree_util.tree_map(
        lambda l: jax.lax.slice_in_dim(l, 0, m, axis=ns + 1), out)
