"""In-kernel ("register-level") field math for fused Pallas kernels.

The building blocks of :mod:`pallas_fp` (CIOS Montgomery multiply, exact
carry chains) exposed as plain functions so whole curve formulas / tower
multiplies run as ONE `pallas_call` instead of a kernel per field op.

REPRESENTATION (the round-4 63x lesson): a field element inside a kernel
is a python LIST of ``n_limbs`` separate ``(S, 128)`` u32 arrays -- one
vreg-shaped value per limb row -- NOT an ``(nl, S, 128)`` tensor.  The
tensor form forced every window-slide / row-select through
``jnp.concatenate`` / slicing, which Mosaic lowered to whole-window
copies: the measured mont_mul throughput was 13 M/s.  The same math on
per-row values lowers to straight-line vreg ops and measures 818 M
mont_muls/s on the v5e (~1 T u32 muls/s) -- within ~5x of the raw VPU
mul+add ceiling.  List indexing/slicing happens at trace time and costs
nothing.

Bound discipline matches ops/fp.py exactly:
  * all limb rows hold exact 16-bit limbs (carried) unless noted;
  * `mont_mul` requires value(a) * value(b) <= 2^16 * p^2, output < 2p;
  * `sub(a, b, kp)` = a - b + k*p needs bound(b) <= k*p;
  * accumulator columns stay < 2^27 before each carry pass.

Everything here is TRACED INSIDE a kernel body; no pallas_call in this
module.  The modulus limb rows arrive as kernel inputs (kernels cannot
close over array constants); k*p offsets are derived in-kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

from .limbs import W, MASK

_U32 = jnp.uint32


def rows_of(x, n: int):
    """(n, S, L) tensor ref-read -> list of n (S, L) rows."""
    return [x[i] for i in range(n)]


def stack_rows(rows):
    """List of (S, L) rows -> (n, S, L) tensor (for the kernel output)."""
    return jnp.stack(rows, 0)


def carry(cols):
    """Exact carry propagation down a list of limb columns (< 2^27)."""
    mask = _U32(MASK)
    c = None
    outs = []
    for v in cols:
        if c is not None:
            v = v + c
        outs.append(v & mask)
        c = v >> W
    return outs


def add(a, b):
    """a + b, exact limbs. Bound: bound(a) + bound(b)."""
    return carry([x + y for x, y in zip(a, b)])


def double(a):
    return carry([x + x for x in a])


def mul_small(a, k: int):
    """a * k for small python int k (columns k * 2^16 < 2^27 => k <= 512)."""
    assert 1 <= k <= 512
    if k == 1:
        return a
    kk = _U32(k)
    return carry([x * kk for x in a])


def kp_limbs(p_rows, k: int):
    """Exact limb rows of k * p derived from the modulus rows (k <= 512)."""
    return mul_small(p_rows, k)


def _zero_like(x):
    """Zero with NO constant materialization (x ^ x stays a traced value:
    jnp.zeros_like would become a kernel-captured constant inside
    fori_loop bodies, which pallas_call rejects)."""
    return x ^ x


def sub(a, b, kp_rows):
    """a - b + k*p via a single add/sub chain; kp_rows = kp_limbs(p, k).

    Requires bound(b) <= k*p. Result bound: bound(a) + k*p, exact limbs.
    """
    mask = _U32(MASK)
    c = _zero_like(a[0]) + _U32(1)
    outs = []
    for ai, bi, ki in zip(a, b, kp_rows):
        v = ai + ki + mask - bi + c
        outs.append(v & mask)
        c = v >> W
    # final carry out is exactly 1 (the complement's 2^(16n)); dropped
    return outs


def neg(a, kp_rows):
    """k*p - a with bound(a) <= k*p."""
    mask = _U32(MASK)
    c = _zero_like(a[0]) + _U32(1)
    outs = []
    for ai, ki in zip(a, kp_rows):
        v = ki + mask - ai + c
        outs.append(v & mask)
        c = v >> W
    return outs


def mont_mul(nl: int, n0: int, p_rows, a, b):
    """Fused CIOS Montgomery product a*b*R^{-1} mod p.

    a, b, p_rows: lists of nl (S, L) rows, exact limbs, with
    value(a)*value(b) <= 2^16 p^2.  Output < 2p, exact limbs.

    Column audit: acc[j] accumulates <= 4 values < 2^16 per outer
    iteration over at most nl iterations before shifting out:
    < 4 * 25 * 2^16 = 2^22.6 -- far under u32.
    """
    mask = _U32(MASK)
    n0c = _U32(n0)
    z = _zero_like(a[0])
    acc = [z] * (nl + 1)
    for i in range(nl):
        ai = a[i]
        for j in range(nl):
            pr = ai * b[j]
            acc[j] = acc[j] + (pr & mask)
            acc[j + 1] = acc[j + 1] + (pr >> W)
        m = (acc[0] * n0c) & mask
        for j in range(nl):
            mp = m * p_rows[j]
            acc[j] = acc[j] + (mp & mask)
            acc[j + 1] = acc[j + 1] + (mp >> W)
        cr = acc[0] >> W
        acc = acc[1:] + [z]
        acc[0] = acc[0] + cr
    return carry(acc)[:nl]


def sqr(nl: int, n0: int, p_rows, a):
    return mont_mul(nl, n0, p_rows, a, a)


def mul_wide(nl: int, a, b):
    """Exact 2nl+1-limb product (no reduction): list of 2nl+1 rows."""
    mask = _U32(MASK)
    z = _zero_like(a[0])
    acc = [z] * (2 * nl + 1)
    for i in range(nl):
        ai = a[i]
        for j in range(nl):
            pr = ai * b[j]
            acc[i + j] = acc[i + j] + (pr & mask)
            acc[i + j + 1] = acc[i + j + 1] + (pr >> W)
    # columns accumulate <= 2 * nl values < 2^16 -> < 2^21.6; exact carry
    return carry(acc)


def redc(nl: int, n0: int, p_rows, t):
    """Montgomery-reduce a wide value (2nl+1 rows, < p*R): out < 2p."""
    mask = _U32(MASK)
    n0c = _U32(n0)
    acc = list(t[:nl + 1])
    for i in range(nl):
        m = (acc[0] * n0c) & mask
        for j in range(nl):
            mp = m * p_rows[j]
            acc[j] = acc[j] + (mp & mask)
            acc[j + 1] = acc[j + 1] + (mp >> W)
        cr = acc[0] >> W
        tail = t[nl + 1 + i] if nl + 1 + i < len(t) else _zero_like(acc[0])
        acc = acc[1:] + [tail]
        acc[0] = acc[0] + cr
    return carry(acc)[:nl]


def is_zero(a, p_rows, k: int):
    """a == 0 mod p for bound(a) <= k*p; returns bool (S, L)."""
    zero = None
    for ai in a:
        e = ai == 0
        zero = e if zero is None else (zero & e)
    mp = p_rows
    for m in range(1, k):
        eqm = None
        for ai, mi in zip(a, mp):
            e = ai == mi
            eqm = e if eqm is None else (eqm & e)
        zero = zero | eqm
        if m + 1 < k:
            mp = add(mp, p_rows)
    return zero


def eq(a, b, p_rows, kp_rows, k: int):
    """a == b mod p for bounds <= k*p each; kp_rows = kp_limbs(p, k)."""
    return is_zero(sub(a, b, kp_rows), p_rows, 2 * k)


def select(mask, a, b):
    """mask (S, L) ? a : b over row lists."""
    return [jnp.where(mask, x, y) for x, y in zip(a, b)]
