"""In-kernel ("register-level") field math for fused Pallas kernels.

The building blocks of :mod:`pallas_fp` (sliding-window CIOS Montgomery
multiply, exact carry chains) exposed as plain functions over in-kernel
``(nl, S, 128)`` u32 arrays, so whole curve formulas / tower multiplies can
run as ONE `pallas_call` instead of a kernel per field op. Dispatch/glue
overhead between tiny kernels is what keeps the VPU under ~2% utilization
on the measured pairing/MSM paths (BENCH r2/r3) -- fusing a full Jacobian
mixed-add into one launch removes ~15 launches + HBM round-trips per
group op.

Bound discipline matches ops/fp.py exactly:
  * all limb arrays hold exact 16-bit limbs (carried) unless noted;
  * `mont_mul` requires value(a) * value(b) <= 2^16 * p^2, output < 2p;
  * `sub(a, b, k)` = a - b + k*p needs bound(b) <= k*p;
  * accumulator columns stay < 2^26 before each carry pass.

Everything here is TRACED INSIDE a kernel body; no pallas_call in this
module. The modulus limb rows arrive as a (nl, S, L) block (kernels cannot
close over array constants); k*p offsets are derived in-kernel from it.
"""

from __future__ import annotations

import jax.numpy as jnp

from .limbs import W, MASK

_U32 = jnp.uint32


def carry(cols):
    """Exact carry propagation down limb axis 0 (columns < 2^26)."""
    c = jnp.zeros_like(cols[0:1])
    mask = _U32(MASK)
    outs = []
    for k in range(cols.shape[0]):
        v = cols[k:k + 1] + c
        outs.append(v & mask)
        c = v >> W
    return jnp.concatenate(outs, 0)


def add(a, b):
    """a + b, exact limbs. Bound: bound(a) + bound(b)."""
    return carry(a + b)


def double(a):
    return carry(a + a)


def mul_small(a, k: int):
    """a * k for small python int k (columns k * 2^16 < 2^26 => k <= 64)."""
    assert 1 <= k <= 64
    if k == 1:
        return a
    return carry(a * _U32(k))


def kp_limbs(p_blk, k: int):
    """Exact limb rows of k * p derived from the modulus block (k <= 64)."""
    return mul_small(p_blk, k)


def sub(a, b, kp_rows):
    """a - b + k*p via a single add/sub chain; kp_rows = kp_limbs(p, k).

    Requires bound(b) <= k*p. Result bound: bound(a) + k*p, exact limbs.
    """
    mask = _U32(MASK)
    c = jnp.ones_like(a[0:1])
    outs = []
    for i in range(a.shape[0]):
        v = a[i:i + 1] + kp_rows[i:i + 1] + mask - b[i:i + 1] + c
        outs.append(v & mask)
        c = v >> W
    # final carry out is exactly 1 (the complement's 2^(16n)); dropped
    return jnp.concatenate(outs, 0)


def mont_mul(nl: int, n0: int, p_blk, a, b):
    """Fused CIOS Montgomery product (pallas_fp._mont_mul_kernel inlined).

    a, b: (nl, S, L) exact limbs with value(a)*value(b) <= 2^16 p^2.
    Output < 2p, exact limbs.
    """
    mask = _U32(MASK)
    n0c = _U32(n0)
    acc = jnp.zeros((nl + 1,) + a.shape[1:], _U32)
    z1 = acc[0:1]
    for i in range(nl):
        prod = a[i:i + 1] * b                      # (nl, S, L)
        acc = acc + jnp.concatenate([prod & mask, z1], 0) \
                  + jnp.concatenate([z1, prod >> W], 0)
        v = acc[0:1]
        m = (v * n0c) & mask
        mp = m * p_blk
        acc = acc + jnp.concatenate([mp & mask, z1], 0) \
                  + jnp.concatenate([z1, mp >> W], 0)
        cr = acc[0:1] >> W
        acc = jnp.concatenate([acc[1:], z1], 0)
        acc = jnp.concatenate([acc[0:1] + cr, acc[1:]], 0)
    return carry(acc)[:nl]


def sqr(nl: int, n0: int, p_blk, a):
    return mont_mul(nl, n0, p_blk, a, a)


def is_zero(a, p_blk, k: int):
    """a == 0 mod p for bound(a) <= k*p; returns bool (S, L).

    Compares against 0, p, ..., (k-1) p with an incrementally-built
    multiple (k <= 64 so limbs of m*p stay exact via mul_small).
    """
    zero = jnp.all(a == 0, axis=0)
    mp = p_blk
    for m in range(1, k):
        zero = zero | jnp.all(a == mp, axis=0)
        if m + 1 < k:
            mp = add(mp, p_blk)
    return zero


def eq(a, b, p_blk, kp_rows, k: int):
    """a == b mod p for bounds <= k*p each; kp_rows = kp_limbs(p, k)."""
    return is_zero(sub(a, b, kp_rows), p_blk, 2 * k)


def select(mask, a, b):
    """mask (S, L) ? a : b over (nl, S, L)."""
    return jnp.where(mask[None], a, b)
