"""Limb-sliced prime-field arithmetic for TPU (pure JAX ops; Pallas later).

A field element is `uint32[n, *batch]` of 16-bit limbs, little-endian along
axis 0 (see :mod:`groth_sahai_tpu.ops.limbs`). Elements are kept in Montgomery
form (`x_bar = x * R mod p`, `R = 2^(16 n)`) and always fully reduced to
`[0, p)`, so limb-wise equality is well defined.

Design notes (TPU-first, replaces arkworks `ark_ff::Fp` used throughout the
reference, e.g. /root/reference/src/data_structures.rs:22-27):
  * All loops over limbs are static Python loops -> unrolled, fused by XLA.
  * Exponentiation runs as a `lax.scan` over exponent bits so trace size stays
    O(one multiply) regardless of exponent length.
  * No data-dependent control flow anywhere; exceptional cases are selects.
  * Inversion is Fermat (a^(p-2)) -- fully batch-parallel, unlike the
    sequential Montgomery batch-inversion trick, which would serialize lanes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .limbs import W, MASK, int_to_limbs, ints_to_limbs, limbs_to_int, limbs_to_ints

_U32 = jnp.uint32


class PrimeField:
    """Montgomery arithmetic mod `modulus` on 16-bit limb arrays."""

    def __init__(self, modulus: int, n_limbs: int, name: str = "Fp"):
        assert modulus % 2 == 1 and modulus < 1 << (W * n_limbs)
        self.p = modulus
        self.n = n_limbs
        self.name = name
        self.R_int = 1 << (W * n_limbs)
        assert self.R_int > modulus
        # -p^{-1} mod 2^16 (Montgomery constant)
        self.n0 = (-pow(modulus, -1, 1 << W)) % (1 << W)
        self.p_limbs = int_to_limbs(modulus, n_limbs)                  # np (n,)
        self.r_mod_p = self.R_int % modulus
        self.r2_mod_p = (self.r_mod_p * self.r_mod_p) % modulus

    # ---------------------------------------------------------------- helpers

    def _const(self, value_int: int, ndim: int) -> jnp.ndarray:
        """Raw (non-Montgomery, NOT reduced) limb constant shaped (n, 1, ...).

        Used for the modulus itself and for pre-reduced values; callers must
        pass value_int < 2^(16 n).
        """
        c = int_to_limbs(value_int, self.n)
        return jnp.asarray(c.reshape((self.n,) + (1,) * max(ndim - 1, 0)))

    def zeros(self, batch_shape=()) -> jnp.ndarray:
        return jnp.zeros((self.n,) + tuple(batch_shape), dtype=_U32)

    def one(self, batch_shape=()) -> jnp.ndarray:
        """Montgomery form of 1 (i.e. R mod p)."""
        c = int_to_limbs(self.r_mod_p, self.n)
        return jnp.broadcast_to(
            jnp.asarray(c).reshape((self.n,) + (1,) * len(batch_shape)),
            (self.n,) + tuple(batch_shape)).astype(_U32)

    # ------------------------------------------------------- carry primitives

    def _carry(self, cols, extra: int = 1):
        """Propagate carries over `cols` (list or array along axis 0).

        Each input column must be < 2^26 or so; output limbs are exact 16-bit
        with `extra` additional top limbs appended.
        """
        ncols = cols.shape[0] if hasattr(cols, "shape") else len(cols)
        xs = [cols[i] for i in range(ncols)]
        outs = []
        c = jnp.zeros_like(xs[0])
        for i in range(ncols):
            v = xs[i] + c
            outs.append(v & MASK)
            c = v >> W
        for _ in range(extra):
            outs.append(c & MASK)
            c = c >> W
        return jnp.stack(outs)

    @staticmethod
    def _sub_borrow(a, b):
        """(a - b) limbwise over equal-length limb arrays.

        Returns (diff_limbs, borrow_out) with borrow_out in {0, 1}.
        """
        nl = a.shape[0]
        outs = []
        borrow = jnp.zeros_like(a[0])
        for i in range(nl):
            v = a[i] + _U32(1 << W) - b[i] - borrow
            outs.append(v & MASK)
            borrow = _U32(1) - (v >> W)
        return jnp.stack(outs), borrow

    def _cond_sub_p(self, s):
        """Reduce s in [0, 2p) given as n+1 exact limbs -> n limbs in [0, p)."""
        p_ext = self._const(self.p, s.ndim)
        p_ext = jnp.concatenate([p_ext, jnp.zeros_like(p_ext[:1])], axis=0)
        d, borrow = self._sub_borrow(s, jnp.broadcast_to(p_ext, s.shape))
        take_s = borrow.astype(bool)  # s < p
        return jnp.where(take_s[None], s[: self.n], d[: self.n])

    # ----------------------------------------------------------- field ops

    def add(self, a, b):
        s = self._carry(a + b, extra=1)
        return self._cond_sub_p(s)

    def sub(self, a, b):
        d, borrow = self._sub_borrow(a, b)
        p_b = jnp.broadcast_to(self._const(self.p, a.ndim), a.shape)
        dp = self._carry(d + p_b, extra=0)  # carry cancels the borrow
        return jnp.where(borrow.astype(bool)[None], dp, d)

    def neg(self, a):
        p_b = jnp.broadcast_to(self._const(self.p, a.ndim), a.shape)
        d, _ = self._sub_borrow(p_b, a)
        return jnp.where(self.is_zero(a)[None], a, d)

    def double(self, a):
        return self.add(a, a)

    def mul(self, a, b):
        """Montgomery product a * b * R^{-1} mod p. Inputs/outputs reduced."""
        n = a.ndim >= b.ndim and a.ndim or b.ndim
        if a.ndim < n:
            a = a.reshape(a.shape[:1] + (1,) * (n - a.ndim) + a.shape[1:])
        if b.ndim < n:
            b = b.reshape(b.shape[:1] + (1,) * (n - b.ndim) + b.shape[1:])
        return self._mont_mul(a, b)

    def _mont_mul(self, a, b):
        nl = self.n
        batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        # ---- full schoolbook product with lazy columns -----------------
        acc = jnp.zeros((2 * nl + 1,) + batch, dtype=_U32)
        for i in range(nl):
            prod = a[i] * b            # (nl, *batch) exact 16x16 -> 32-bit
            acc = acc.at[i:i + nl].add(prod & MASK)
            acc = acc.at[i + 1:i + nl + 1].add(prod >> W)
        # ---- exact carry so Montgomery m-digits are computable ---------
        acc = self._carry(acc, extra=0)
        # ---- Montgomery reduction --------------------------------------
        p_col = self._const(self.p, 1 + len(batch))  # (nl, 1...)
        carry = jnp.zeros(batch, dtype=_U32)
        n0 = _U32(self.n0)
        for i in range(nl):
            v = acc[i] + carry
            m = (v * n0) & MASK
            mp = m * p_col             # (nl, *batch) exact
            mp_lo = mp & MASK
            mp_hi = mp >> W
            v = v + mp_lo[0]
            carry = v >> W
            acc = acc.at[i + 1:i + nl].add(mp_lo[1:])
            acc = acc.at[i + 1:i + nl + 1].add(mp_hi)
        res = acc[nl:2 * nl + 1]
        res = res.at[0].add(carry)
        res = self._carry(res, extra=0)   # (nl+1, *batch) exact, value < 2p
        return self._cond_sub_p(res)

    def sqr(self, a):
        return self._mont_mul(a, a)

    def mul_small(self, a, k: int):
        """a * k for a small positive Python int k (k <= 1024)."""
        assert 1 <= k <= 1024
        if k == 1:
            return a
        cols = a * _U32(k)                     # limbs < 2^26
        s = self._carry(cols, extra=1)         # (n+1) exact limbs, value < k*p
        # Reduce v < k*p to [0, p) by conditionally subtracting 2^j * p for
        # j = floor(log2(k-1)) .. 0 (invariant: v < 2^(j+1) * p).
        for j in range(max((k - 1).bit_length() - 1, 0), -1, -1):
            ph = jnp.broadcast_to(
                jnp.asarray(int_to_limbs((1 << j) * self.p, self.n + 1))
                .reshape((self.n + 1,) + (1,) * (s.ndim - 1)), s.shape)
            d, borrow = self._sub_borrow(s, ph)
            s = jnp.where(borrow.astype(bool)[None], s, d)
        return s[: self.n]

    # ----------------------------------------------------------- predicates

    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def eq(self, a, b):
        return jnp.all(a == b, axis=0)

    @staticmethod
    def select(mask, a, b):
        """mask ? a : b, with mask shaped like the batch dims."""
        return jnp.where(mask[None], a, b)

    # -------------------------------------------------------------- pow / inv

    def pow_const(self, a, e: int):
        """a^e (Montgomery in/out) for a fixed Python-int exponent via scan."""
        if e == 0:
            return jnp.broadcast_to(self.one(a.shape[1:]), a.shape)
        nbits = e.bit_length()
        bits = jnp.asarray(
            np.array([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)],
                     dtype=np.uint32))
        one = jnp.broadcast_to(self.one(a.shape[1:]), a.shape)

        def body(acc, bit):
            acc = self._mont_mul(acc, acc)
            acc2 = self._mont_mul(acc, a)
            return jnp.where((bit > 0)[None], acc2, acc), None

        out, _ = lax.scan(body, one, bits)
        return out

    def inv(self, a):
        """a^{-1} via Fermat; Montgomery in/out. inv(0) = 0 (by convention)."""
        return self.pow_const(a, self.p - 2)

    # ------------------------------------------------------------- conversion

    def to_mont(self, a):
        r2 = self._const(self.r2_mod_p, a.ndim)
        return self._mont_mul(a, jnp.broadcast_to(r2, a.shape))

    def from_mont(self, a):
        one = self._const(1, a.ndim)
        return self._mont_mul(a, jnp.broadcast_to(one, a.shape))

    def from_ints(self, values) -> jnp.ndarray:
        """Python ints -> Montgomery-form device array (n, len(values))."""
        arr = ints_to_limbs([v % self.p for v in values], self.n)
        return self.to_mont(jnp.asarray(arr))

    def from_int(self, value: int) -> jnp.ndarray:
        """Python int -> Montgomery-form device array (n,)."""
        arr = int_to_limbs(value % self.p, self.n)
        return self.to_mont(jnp.asarray(arr))

    def to_ints(self, a) -> list:
        """Montgomery-form device array (n, B) -> list of Python ints."""
        std = np.asarray(self.from_mont(a))
        if std.ndim == 1:
            return [limbs_to_int(std)]
        flat = std.reshape(self.n, -1)
        return limbs_to_ints(flat)

    def to_int(self, a) -> int:
        return self.to_ints(a)[0]


# Field instances for BLS12-381.
from . import bls12_381 as _c

FQ = PrimeField(_c.P, 24, "Fq")    # 384-bit capacity for the 381-bit modulus
FR = PrimeField(_c.R, 16, "Fr")    # 256-bit capacity for the 255-bit modulus
