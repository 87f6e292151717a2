"""Limb-sliced prime-field arithmetic for TPU (pure JAX ops; Pallas later).

A field element is `uint32[n, *batch]` of exact 16-bit limbs, little-endian
along axis 0 (see :mod:`groth_sahai_tpu.ops.limbs`). Elements are kept in
Montgomery form (`x_bar = x * R mod p`, `R = 2^(16 n)`).

Redundant representation
------------------------
The capacity `R` is chosen ~2^19 x larger than the modulus (25 limbs for the
381-bit Fq, 17 for the 255-bit Fr) so values need NOT be canonically reduced
after every op. The static bound discipline is:

  * `mul`/`sqr` outputs are < 2p (Montgomery, no conditional subtraction);
  * `add(a, b)` = a + b (bounds add; single carry pass, no reduction);
  * `sub(a, b, k)` = a + k*p - b, requires bound(b) <= k*p (static k);
  * any value fed to `mul` must be < 2^8 * p (so the product < p*R);
  * `normalize` canonically reduces to [0, p); `eq`/`is_zero`/serialization
    work on non-canonical values by checking against small multiples of p.

This removes the ~40% of equation count and VPU work that per-op conditional
subtraction would cost, which matters both for XLA graph size (compile time)
and runtime. Every op is select/carry-chain based -- no data-dependent
control flow (TPU/vmap/scan safe).

Replaces arkworks `ark_ff::Fp` used throughout the reference
(e.g. /root/reference/src/data_structures.rs:22-27).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .limbs import W, MASK, int_to_limbs, ints_to_limbs, limbs_to_int, limbs_to_ints
from . import pallas_fp

_U32 = jnp.uint32

_unroll_cache = {}


def _unroll(kind: str = "mul") -> int:
    """Scan unroll factor for the limb loops.

    On TPU the hot mul/redc loops run as Pallas kernels (fully unrolled
    in-kernel), so the scan paths here matter only for CPU tests and the
    multichip dryrun -- where XLA graph size (compile time) dominates and
    unrolling only bloats it. Keep unroll=1 off-TPU, modest on TPU for the
    carry chains that always run as scans.
    """
    if kind not in _unroll_cache:
        try:
            tpu = jax.default_backend() == "tpu"
        except Exception:
            tpu = False
        _unroll_cache[kind] = (5 if kind == "mul" else 8) if tpu else 1
    return _unroll_cache[kind]


class PrimeField:
    """Montgomery arithmetic mod `modulus` on 16-bit limb arrays."""

    def __init__(self, modulus: int, n_limbs: int, name: str = "Fp"):
        assert modulus % 2 == 1 and modulus < 1 << (W * n_limbs)
        self.p = modulus
        self.n = n_limbs
        self.name = name
        self.R_int = 1 << (W * n_limbs)
        # Headroom for the redundant representation: need 2^16 * p < R so
        # that mul inputs bounded by 2^8 p keep T = a*b < p*R.
        assert (modulus << 16) < self.R_int, "need 16 bits of limb headroom"
        self.n0 = (-pow(modulus, -1, 1 << W)) % (1 << W)   # -p^{-1} mod 2^16
        self.p_limbs = int_to_limbs(modulus, n_limbs)
        self.r_mod_p = self.R_int % modulus
        self.r2_mod_p = (self.r_mod_p * self.r_mod_p) % modulus

    # ---------------------------------------------------------------- helpers

    def _const(self, value_int: int, ndim: int) -> jnp.ndarray:
        """Raw limb constant (NOT reduced, NOT Montgomery), shaped (n, 1...)."""
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

    def _carry(self, cols):
        """Exact carry propagation along axis 0 (columns < 2^26 -> 16-bit).

        The final carry out of the top limb must be zero (value < capacity);
        callers guarantee this via the bound discipline. Scanned (sequential
        chain) with partial unroll.
        """
        if not hasattr(cols, "shape"):
            cols = jnp.stack(cols)

        def body(c, x):
            v = x + c
            return v >> W, v & MASK

        _, out = lax.scan(body, jnp.zeros_like(cols[0]), cols,
                          unroll=_unroll('carry'))
        return out

    @staticmethod
    def _sub_borrow(a, b):
        """(a - b) limbwise (equal length); returns (diff, borrow_out in {0,1})."""
        def body(borrow, ab):
            ai, bi = ab
            v = ai + _U32(1 << W) - bi - borrow
            return _U32(1) - (v >> W), v & MASK

        borrow, out = lax.scan(body, jnp.zeros_like(a[0]), (a, b),
                               unroll=_unroll('carry'))
        return out, borrow

    # ----------------------------------------------------------- field ops

    def add(self, a, b):
        """a + b. Bound: bound(a) + bound(b). One carry pass, no reduction."""
        return self._carry(a + b)

    def sub(self, a, b, k: int = 4):
        """a - b + k*p, for a static k with bound(b) <= k*p.

        Bound of result: bound(a) + k*p. Single fused add/sub chain.
        """
        kpm = jnp.asarray(
            int_to_limbs(k * self.p, self.n).astype(np.int64) + MASK
        ).astype(_U32).reshape((self.n,) + (1,) * (a.ndim - 1))
        kpm = jnp.broadcast_to(kpm, a.shape)

        def body(c, abk):
            ai, bi, ki = abk
            v = ai + ki - bi + c
            return v >> W, v & MASK

        b = jnp.broadcast_to(b, a.shape)
        _, out = lax.scan(body, jnp.ones_like(a[0]), (a, b, kpm),
                          unroll=_unroll('carry'))
        # final carry out is exactly 1 (the 2^(16n) of the complement); dropped
        return out

    def neg(self, a, k: int = 2):
        """k*p - a with bound(a) <= k*p. Result bound: k*p."""
        kp = self._const(k * self.p, a.ndim)
        d, _ = self._sub_borrow(jnp.broadcast_to(kp, a.shape), a)
        return d

    def double(self, a):
        return self._carry(a + a)

    def mul(self, a, b):
        """Montgomery product a*b*R^{-1} mod p.

        Requires bound(a)*bound(b) <= 2^16 * p^2 (e.g. both < 2^8 p).
        Output bound: < 2p. Batch shapes broadcast against each other.
        """
        nd = max(a.ndim, b.ndim)
        if a.ndim < nd:
            a = a.reshape(a.shape[:1] + (1,) * (nd - a.ndim) + a.shape[1:])
        if b.ndim < nd:
            b = b.reshape(b.shape[:1] + (1,) * (nd - b.ndim) + b.shape[1:])
        return self._mont_mul(a, b)

    def _mont_mul(self, a, b):
        if pallas_fp.enabled():
            batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
            a = jnp.broadcast_to(a, (self.n,) + batch)
            b = jnp.broadcast_to(b, (self.n,) + batch)
            return pallas_fp.mont_mul(self, a, b)
        return self.redc(self.mul_wide(a, b))

    def sqr(self, a):
        return self._mont_mul(a, a)

    # ------------------------------------------- wide (lazy-reduction) domain
    #
    # A "wide" value is a 2n+1-limb exact product-domain integer (< p*R).
    # Tower multiplications compute Karatsuba combinations on wide values and
    # Montgomery-reduce ONCE per output coefficient ("lazy reduction", as in
    # high-performance pairing libraries). Budget: wide values must stay
    # < 2^18 * p^2 so that redc input < p*R and output < 2p.

    # Loop unroll factor for the scanned limb loops: keeps the XLA graph
    # ~UNROLL x the single-step body while cutting while-loop overhead.
    UNROLL = 5

    def mul_wide(self, a, b):
        """Exact 2n+1-limb product a*b (16-bit limbs). No reduction.

        The schoolbook outer loop runs as a `lax.scan` over the limbs of `a`
        so the traced graph is O(one step), not O(n_limbs) -- crucial for
        XLA compile times of pairing-sized programs.
        """
        nl = self.n
        nd = max(a.ndim, b.ndim)
        if a.ndim < nd:
            a = a.reshape(a.shape[:1] + (1,) * (nd - a.ndim) + a.shape[1:])
        if b.ndim < nd:
            b = b.reshape(b.shape[:1] + (1,) * (nd - b.ndim) + b.shape[1:])
        batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
        a = jnp.broadcast_to(a, (nl,) + batch)
        b = jnp.broadcast_to(b, (nl,) + batch)
        if pallas_fp.enabled():
            return pallas_fp.mul_wide(self, a, b)
        acc0 = jnp.zeros((2 * nl + 1,) + batch, dtype=_U32)
        zrow = jnp.zeros((1,) + batch, dtype=_U32)
        idx0 = (jnp.zeros((), jnp.int32),) * len(batch)

        def body(acc_i, ai):
            acc, i = acc_i
            prod = ai * b                                    # (nl, *batch)
            contrib = (jnp.concatenate([prod & MASK, zrow], 0)
                       + jnp.concatenate([zrow, prod >> W], 0))  # (nl+1,...)
            seg = lax.dynamic_slice(acc, (i,) + idx0,
                                    (nl + 1,) + batch)
            acc = lax.dynamic_update_slice(acc, seg + contrib, (i,) + idx0)
            return (acc, i + 1), None

        (acc, _), _ = lax.scan(body, (acc0, jnp.int32(0)), a,
                               unroll=_unroll('mul'))
        return self._carry(acc)

    def redc(self, t):
        """Montgomery-reduce a wide value: t * R^{-1} mod p, output < 2p.

        Requires t < p*R (2n+1 exact limbs). Scanned over limb index.
        """
        if pallas_fp.enabled():
            return pallas_fp.redc(self, t)
        nl = self.n
        batch = t.shape[1:]
        p_col = jnp.broadcast_to(self._const(self.p, 1 + len(batch)),
                                 (nl,) + batch)
        zrow = jnp.zeros((1,) + batch, dtype=_U32)
        n0 = _U32(self.n0)
        idx0 = (jnp.zeros((), jnp.int32),) * len(batch)

        def body(state, _):
            acc, carry, i = state
            v = lax.dynamic_index_in_dim(acc, i, 0, keepdims=False) + carry
            m = (v * n0) & MASK
            mp = m * p_col                                   # (nl, *batch)
            carry = (v + (mp[0] & MASK)) >> W
            # columns i+1 .. i+nl: lo[1:] and hi[0:nl]
            contrib = (jnp.concatenate([mp[1:] & MASK, zrow], 0)
                       + (mp >> W))                          # (nl, *batch)
            seg = lax.dynamic_slice(acc, (i + 1,) + idx0, (nl,) + batch)
            acc = lax.dynamic_update_slice(acc, seg + contrib,
                                           (i + 1,) + idx0)
            return (acc, carry, i + 1), None

        (acc, carry, _), _ = lax.scan(
            body, (t, jnp.zeros(batch, dtype=_U32), jnp.int32(0)), None,
            length=nl, unroll=_unroll('mul'))
        res = acc[nl:2 * nl + 1]
        res = jnp.concatenate([(res[0] + carry)[None], res[1:]], 0)
        return self._carry(res)[: nl]

    def add_wide(self, a, b):
        """Wide + wide (exact carry pass)."""
        return self._carry(a + b)

    def double_wide(self, a):
        return self._carry(a + a)

    def sub_wide(self, a, b, k2: int = 1 << 8):
        """a - b + k2 * p^2 on wide values; requires bound(b) <= k2 * p^2."""
        nw = 2 * self.n + 1
        kpm = jnp.asarray(
            int_to_limbs(k2 * self.p * self.p, nw).astype(np.int64) + MASK
        ).astype(_U32).reshape((nw,) + (1,) * (a.ndim - 1))
        kpm = jnp.broadcast_to(kpm, a.shape)

        def body(c, abk):
            ai, bi, ki = abk
            v = ai + ki - bi + c
            return v >> W, v & MASK

        b = jnp.broadcast_to(b, a.shape)
        _, out = lax.scan(body, jnp.ones_like(a[0]), (a, b, kpm),
                          unroll=_unroll('carry'))
        return out

    def mul_small(self, a, k: int):
        """a * k for small positive Python int k (<= 2^6). Bound: k*bound(a)."""
        assert 1 <= k <= 64
        if k == 1:
            return a
        return self._carry(a * _U32(k))

    def fold(self, a):
        """Cheap partial reduction: fold the top limb back mod p.

        For a with exact limbs and any value < capacity, returns
        a' = (a mod 2^(16(n-1))) + floor(a / 2^(16(n-1))) * (2^(16(n-1)) mod p)
        which is congruent mod p and bounded by 2^(16(n-1)) + (bound/2^(16(n-1))) * p.
        Used to keep scan-carried values bound-stable without a full reduce.
        """
        nl = self.n
        c_fold = int_to_limbs((1 << (W * (nl - 1))) % self.p, nl - 1)
        c_col = jnp.asarray(
            c_fold.reshape((nl - 1,) + (1,) * (a.ndim - 1)))
        hi = a[nl - 1]
        prod = hi * c_col                      # (nl-1, ...), exact 16x16
        cols = jnp.concatenate(
            [a[:nl - 1] + (prod & MASK), jnp.zeros_like(a[:1])], axis=0)
        cols = cols.at[1:nl].add(prod >> W)
        return self._carry(cols)

    # ------------------------------------------------- normalization & tests

    def normalize(self, a, k: int = 2):
        """Canonical value in [0, p) for bound(a) <= k*p (static small k)."""
        s = a
        j = max((k - 1).bit_length() - 1, 0)
        for jj in range(j, -1, -1):
            ph = jnp.broadcast_to(
                self._const((1 << jj) * self.p, a.ndim), s.shape)
            d, borrow = self._sub_borrow(s, ph)
            s = jnp.where(borrow.astype(bool)[None], s, d)
        return s

    def is_zero(self, a, k: int = 2):
        """a == 0 mod p, for bound(a) <= k*p: compare against 0, p, .. (k-.)p."""
        zero = jnp.all(a == 0, axis=0)
        for m in range(1, k):
            mp = self._const(m * self.p, a.ndim)
            zero = zero | jnp.all(a == mp, axis=0)
        return zero

    def eq(self, a, b, k: int = 2):
        """a == b mod p for bounds <= k*p each."""
        d = self.sub(a, b, k=k)            # bound 2k*p
        return self.is_zero(d, k=2 * k)

    @staticmethod
    def select(mask, a, b):
        """mask ? a : b, with mask shaped like the batch dims."""
        return jnp.where(mask[None], a, b)

    # ---- stacking helpers: batch independent ops into one call -------------

    @staticmethod
    def stack(elems):
        """Stack field elements along a new axis 1 (one fused op downstream)."""
        return jnp.stack(elems, axis=1)

    @staticmethod
    def unstack(x, n):
        return [x[:, i] for i in range(n)]

    # -------------------------------------------------------------- pow / inv

    def pow_const(self, a, e: int):
        """a^e (Montgomery in/out) for a fixed Python-int exponent via scan.

        On TPU the whole square/multiply chain runs as ONE fused Pallas
        kernel (pallas_fp.pow_const): the scan path dispatches a mont
        kernel per bit (~380 sequential launches for a Fermat inversion).
        """
        if e == 0:
            return jnp.broadcast_to(self.one(a.shape[1:]), a.shape)
        if e > 1 and pallas_fp.enabled() and pallas_fp.no_batch_tracer(a):
            return pallas_fp.pow_const(self, a, e)
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

    def inv_batch(self, a, k: int = 8, rows: int = 32):
        """Batched a^{-1} via the blocked Montgomery trick; inv(0) = 0.

        One Fermat exponentiation per `rows` elements instead of one per
        element (SURVEY.md section 7 step 3 "batched affine conversion via
        Montgomery batch inversion"): forward product scan over `rows`
        steps, ONE batched Fermat inversion of the row totals, backward
        recovery scan. ~3 muls/element + Fermat/rows vs ~450 muls/element.

        `k`: static bound multiplier of the input (bound(a) <= k*p) for the
        zero test; zeros are replaced by 1 and restored to 0 at the end.
        """
        batch = a.shape[1:]
        total = int(np.prod(batch)) if batch else 1
        if total < 4 * rows:
            return self.pow_const(a, self.p - 2)

        zero = self.is_zero(a, k=k)
        onev = self.one(batch)
        a = jnp.where(zero[None], onev, a)

        cols = -(-total // rows)
        pad = rows * cols - total
        flat = a.reshape(self.n, total)
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.broadcast_to(self.one((pad,)), (self.n, pad))],
                axis=1)
        g = flat.reshape(self.n, rows, cols)

        # forward: P[r] = a[0] * ... * a[r]  (exclusive prefix emitted)
        def fwd(carry, ar):
            return self._mont_mul(carry, ar), carry

        incl, excl = lax.scan(fwd, self.one((cols,)),
                              jnp.moveaxis(g, 1, 0))
        # incl = total product (cols,); excl[r] = product of a[<r]
        tinv = self.pow_const(incl, self.p - 2)

        # backward: inv_a[r] = excl[r] * acc;  acc *= a[r]
        def bwd(acc, ar_ex):
            ar, ex = ar_ex
            out = self._mont_mul(ex, acc)
            return self._mont_mul(acc, ar), out

        _, outs = lax.scan(bwd, tinv, (jnp.moveaxis(g, 1, 0), excl),
                           reverse=True)
        inv_flat = jnp.moveaxis(outs, 0, 1).reshape(self.n, rows * cols)
        inv_flat = inv_flat[:, :total].reshape((self.n,) + batch)
        return jnp.where(zero[None], jnp.zeros_like(inv_flat), inv_flat)

    # ------------------------------------------------------------- conversion

    def to_mont(self, a):
        r2 = self._const(self.r2_mod_p, a.ndim)
        return self._mont_mul(a, jnp.broadcast_to(r2, a.shape))

    def from_mont(self, a):
        """Montgomery -> standard form, canonically reduced to [0, p)."""
        one = self._const(1, a.ndim)
        return self.normalize(self._mont_mul(a, jnp.broadcast_to(one, a.shape)))

    def from_ints(self, values) -> jnp.ndarray:
        """Python ints -> Montgomery-form device array (n, len(values)).

        The Montgomery conversion (v * R mod p) runs on the HOST in exact
        integer math: constructing constants/inputs must cost zero device
        compiles and zero eager dispatches (it is on the test/setup path
        thousands of times).
        """
        arr = ints_to_limbs([(v % self.p) * self.r_mod_p % self.p
                             for v in values], self.n)
        return jnp.asarray(arr)

    def from_int(self, value: int) -> jnp.ndarray:
        arr = int_to_limbs((value % self.p) * self.r_mod_p % self.p, self.n)
        return jnp.asarray(arr)

    def to_ints(self, a) -> list:
        """Montgomery-form device array (n, *batch) -> flat list of ints."""
        if not hasattr(self, "_from_mont_jit"):
            self._from_mont_jit = jax.jit(self.from_mont)
        std = np.asarray(self._from_mont_jit(a))
        if std.ndim == 1:
            return [limbs_to_int(std)]
        flat = std.reshape(self.n, -1)
        return limbs_to_ints(flat)

    def to_int(self, a) -> int:
        return self.to_ints(a)[0]


# Field instances for BLS12-381 (extra limb = redundant-representation room).
from . import bls12_381 as _c

FQ = PrimeField(_c.P, 25, "Fq")    # 400-bit capacity for the 381-bit modulus
FR = PrimeField(_c.R, 17, "Fr")    # 272-bit capacity for the 255-bit modulus
