"""Extension-field tower Fq2 / Fq6 / Fq12 over the limb field core.

Tower (identical to arkworks ark-bls12-381, which the reference uses through
`E::pairing` at /root/reference/src/data_structures.rs:484-502):

    Fq2  = Fq[u]  / (u^2 + 1)
    Fq6  = Fq2[v] / (v^3 - (u+1))
    Fq12 = Fq6[w] / (w^2 - v)

TPU-native design
-----------------
* Coefficient-axis arrays, not structs:
      Fq2  = uint32[nl, 2, *batch]
      Fq6  = uint32[nl, 6, *batch]    (index 2j+u: coeff of v^j u^u)
      Fq12 = uint32[nl, 12, *batch]   (index 6i+2j+u: w^i v^j u^u)
* Stacked multiplies: all independent base-field products inside a tower
  multiply are issued as ONE `mul_wide` call (an Fq12 product = a single
  (nl, 54, *batch) multiply), keeping the XLA graph small and VPU lanes full.
* Lazy reduction: Karatsuba combinations happen on 2n+1-limb *wide* values;
  each output coefficient is Montgomery-reduced exactly once (`redc`).
  Wide-value bounds (in units of p^2) are tracked via static k2 offsets.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .fp import FQ, FR
from . import bls12_381 as C

_stack = jnp.stack


def _pairs(a):
    """(nl, 2k, *batch) -> (nl, 2, k, *batch): move Fq2 pair axis to front."""
    nl = a.shape[0]
    k = a.shape[1] // 2
    return jnp.moveaxis(a.reshape((nl, k, 2) + a.shape[2:]), 2, 1)


def _unpairs(a):
    """(nl, 2, k, *batch) -> (nl, 2k, *batch)."""
    nl = a.shape[0]
    k = a.shape[2]
    return jnp.moveaxis(a, 1, 2).reshape((nl, 2 * k) + a.shape[3:])


# ===========================================================================
# Fq2: uint32[nl, 2, *batch]
# ===========================================================================

class _Fq2:
    name = "Fq2"
    DIM = 2

    # ---- structural ----
    def zeros(self, batch_shape=()):
        return FQ.zeros((2,) + tuple(batch_shape))

    def one(self, batch_shape=()):
        return _stack([FQ.one(batch_shape), FQ.zeros(batch_shape)], axis=1)

    # ---- linear ops (narrow) ----
    def add(self, a, b):
        return FQ.add(a, b)

    def sub(self, a, b, k: int = 8):
        return FQ.sub(a, b, k=k)

    def neg(self, a, k: int = 8):
        return FQ.neg(a, k=k)

    def double(self, a):
        return FQ.double(a)

    # ---- multiplication (wide Karatsuba) ----
    def mul_wide2(self, a, b):
        """Unreduced Fq2 product: wide coeffs (2nl+1, 2, *batch).

        Inputs narrow < 32p each; wide outputs < 2^13 p^2.
        """
        a0, a1 = a[:, 0], a[:, 1]
        b0, b1 = b[:, 0], b[:, 1]
        sa = FQ.add(a0, a1)                       # < 64p
        sb = FQ.add(b0, b1)
        t = FQ.mul_wide(_stack([a0, a1, sa], axis=1),
                        _stack([b0, b1, sb], axis=1))   # (2nl+1, 3, *batch)
        t0, t1, t2 = t[:, 0], t[:, 1], t[:, 2]          # each < 2^12 p^2
        c0 = FQ.sub_wide(t0, t1, k2=1 << 12)            # u^2 = -1 ; < 2^13 p^2
        c1 = FQ.sub_wide(t2, FQ.add_wide(t0, t1), k2=1 << 13)
        return _stack([c0, c1], axis=1)

    def redc2(self, w):
        return FQ.redc(w)   # shape-polymorphic over the coeff axis

    def mul(self, a, b):
        """Reduced product; output coeffs < 2p."""
        return self.redc2(self.mul_wide2(a, b))

    def sqr_wide2(self, a):
        """(a0+a1)(a0-a1), 2 a0 a1 -- complex squaring, unreduced."""
        a0, a1 = a[:, 0], a[:, 1]
        s = FQ.add(a0, a1)
        d = FQ.sub(a0, a1, k=32)
        t = FQ.mul_wide(_stack([s, a0], axis=1), _stack([d, a1], axis=1))
        return _stack([t[:, 0], FQ.double_wide(t[:, 1])], axis=1)

    def sqr(self, a):
        return self.redc2(self.sqr_wide2(a))

    def mul_fq(self, a, s):
        """Both coefficients times an Fq element s (shape (nl, *batch))."""
        return FQ.mul(a, s[:, None])

    # ---- xi = u + 1 ----
    def mul_by_xi(self, a, k: int = 8):
        """(c0 - c1, c0 + c1). Narrow; bound b(a) + max(k p, b(a))."""
        return _stack([FQ.sub(a[:, 0], a[:, 1], k=k),
                       FQ.add(a[:, 0], a[:, 1])], axis=1)

    def xi_wide(self, w, k2: int = 1 << 14):
        """Wide-domain * (u+1)."""
        return _stack([FQ.sub_wide(w[:, 0], w[:, 1], k2=k2),
                       FQ.add_wide(w[:, 0], w[:, 1])], axis=1)

    def conj(self, a, k: int = 8):
        return _stack([a[:, 0], FQ.neg(a[:, 1], k=k)], axis=1)

    def inv(self, a):
        """(c0 - c1 u)/(c0^2 + c1^2); output < 2p."""
        t = FQ.mul(a, a)                               # (nl, 2, *b): c0^2, c1^2
        norm = FQ.add(t[:, 0], t[:, 1])                # < 4p
        ni = FQ.inv(norm)
        return FQ.mul(_stack([a[:, 0], FQ.neg(a[:, 1], k=8)], axis=1),
                      ni[:, None])

    def inv_batch(self, a, k: int = 8):
        """Batched inverse: one Fq Montgomery-trick inversion of the norms
        (norm = 0 iff a = 0 since -1 is a non-residue mod p)."""
        t = FQ.mul(a, a)
        norm = FQ.add(t[:, 0], t[:, 1])                # < 4p
        ni = FQ.inv_batch(norm, k=4)
        return FQ.mul(_stack([a[:, 0], FQ.neg(a[:, 1], k=k)], axis=1),
                      ni[:, None])

    # ---- predicates / io ----
    def is_zero(self, a, k: int = 8):
        return FQ.is_zero(a[:, 0], k=k) & FQ.is_zero(a[:, 1], k=k)

    def eq(self, a, b, k: int = 8):
        return FQ.eq(a[:, 0], b[:, 0], k=k) & FQ.eq(a[:, 1], b[:, 1], k=k)

    @staticmethod
    def select(mask, a, b):
        return jnp.where(mask[None, None], a, b)

    @staticmethod
    def stack(elems):
        """Stack Fq2 elements along a new axis 2 (after the pair axis)."""
        return jnp.stack(elems, axis=2)

    @staticmethod
    def unstack(x, n):
        return [x[:, :, i] for i in range(n)]

    def normalize(self, a, k: int = 8):
        return FQ.normalize(a, k=k)

    def from_ints(self, pairs):
        flat = [x for pr in pairs for x in pr]
        arr = FQ.from_ints(flat)                       # (nl, 2*len)
        return arr.reshape(FQ.n, len(pairs), 2).transpose(0, 2, 1)

    def from_int_pair(self, c0: int, c1: int):
        return FQ.from_ints([c0, c1])                  # (nl, 2)

    def to_ints(self, a):
        flat = jnp.moveaxis(a, 1, -1).reshape(FQ.n, -1)
        vals = FQ.to_ints(flat)
        return [(vals[2 * i], vals[2 * i + 1]) for i in range(len(vals) // 2)]


FQ2 = _Fq2()


# ===========================================================================
# Fq6: uint32[nl, 6, *batch]
# ===========================================================================

class _Fq6:
    name = "Fq6"
    DIM = 6

    def zeros(self, batch_shape=()):
        return FQ.zeros((6,) + tuple(batch_shape))

    def one(self, batch_shape=()):
        z = FQ.zeros((5,) + tuple(batch_shape))
        return jnp.concatenate([FQ.one(batch_shape)[:, None], z], axis=1)

    def c(self, a, j):
        return a[:, 2 * j:2 * j + 2]

    def build(self, c0, c1, c2):
        return jnp.concatenate([c0, c1, c2], axis=1)

    def add(self, a, b):
        return FQ.add(a, b)

    def sub(self, a, b, k: int = 8):
        return FQ.sub(a, b, k=k)

    def neg(self, a, k: int = 8):
        return FQ.neg(a, k=k)

    def double(self, a):
        return FQ.double(a)

    def mul_wide6(self, a, b):
        """Unreduced Fq6 product; ONE stacked base mul (18 products).

        Inputs < 16p; outputs wide < 2^16 p^2.
        """
        F2 = FQ2
        a012 = _stack([self.c(a, 0), self.c(a, 1), self.c(a, 2)], axis=2)
        b012 = _stack([self.c(b, 0), self.c(b, 1), self.c(b, 2)], axis=2)
        # Karatsuba operand sums: (a1+a2, a0+a1, a0+a2) -- one batched add
        A = FQ.add(_stack([self.c(a, 1), self.c(a, 0), self.c(a, 0)], axis=2),
                   _stack([self.c(a, 2), self.c(a, 1), self.c(a, 2)], axis=2))
        B = FQ.add(_stack([self.c(b, 1), self.c(b, 0), self.c(b, 0)], axis=2),
                   _stack([self.c(b, 2), self.c(b, 1), self.c(b, 2)], axis=2))
        X = jnp.concatenate([a012, A], axis=2)     # (nl, 2, 6, *batch)
        Y = jnp.concatenate([b012, B], axis=2)
        T = F2.mul_wide2(X, Y)                     # (2nl+1, 2, 6, *batch)
        t0, t1, t2 = T[:, :, 0], T[:, :, 1], T[:, :, 2]
        s1, s2, s3 = T[:, :, 3], T[:, :, 4], T[:, :, 5]
        # c0 = t0 + xi*(s1 - t1 - t2)
        u = FQ.sub_wide(s1, FQ.add_wide(t1, t2), k2=1 << 15)
        c0 = FQ.add_wide(t0, F2.xi_wide(u, k2=1 << 16))
        # c1 = s2 - t0 - t1 + xi*t2
        c1 = FQ.add_wide(FQ.sub_wide(s2, FQ.add_wide(t0, t1), k2=1 << 15),
                         F2.xi_wide(t2, k2=1 << 14))
        # c2 = s3 - t0 - t2 + t1
        c2 = FQ.add_wide(FQ.sub_wide(s3, FQ.add_wide(t0, t2), k2=1 << 15), t1)
        return jnp.concatenate([c0, c1, c2], axis=1)   # (2nl+1, 6, *batch)

    def mul(self, a, b):
        return FQ.redc(self.mul_wide6(a, b))

    def sqr(self, a):
        return self.mul(a, a)

    def mul_by_v(self, a, k: int = 8):
        """* v (narrow): (xi*c2, c0, c1)."""
        return self.build(FQ2.mul_by_xi(self.c(a, 2), k=k), self.c(a, 0),
                          self.c(a, 1))

    def v_wide(self, w, k2: int = 1 << 17):
        """Wide-domain * v."""
        return jnp.concatenate(
            [FQ2.xi_wide(w[:, 4:6], k2=k2), w[:, 0:2], w[:, 2:4]], axis=1)

    def mul_fq2(self, a, s):
        """All three coefficients times one Fq2 element s (nl, 2, *batch)."""
        ap = _pairs(a)                               # (nl, 2, 3, *batch)
        r = FQ2.mul(ap, s[:, :, None])
        return _unpairs(r)

    def inv(self, a):
        F2 = FQ2
        a0, a1, a2 = self.c(a, 0), self.c(a, 1), self.c(a, 2)
        # batched squares and cross products
        sq = F2.redc2(F2.sqr_wide2(_stack([a0, a1, a2], axis=2)))
        s0, s1, s2 = sq[:, :, 0], sq[:, :, 1], sq[:, :, 2]
        cr = F2.mul(_stack([a1, a0, a0], axis=2), _stack([a2, a1, a2], axis=2))
        a12, a01, a02 = cr[:, :, 0], cr[:, :, 1], cr[:, :, 2]
        t0 = F2.sub(s0, F2.mul_by_xi(a12, k=8), k=16)
        t1 = F2.sub(F2.mul_by_xi(s2, k=8), a01, k=8)
        t2 = F2.sub(s1, a02, k=2)
        d = FQ.add(F2.redc2(F2.mul_wide2(a0, t0)),
                   F2.mul_by_xi(
                       FQ.add(F2.mul(a2, t1), F2.mul(a1, t2)), k=8))
        di = F2.inv(d)
        r = F2.mul(_stack([t0, t1, t2], axis=2), di[:, :, None])
        return _unpairs(r)

    def is_zero(self, a, k: int = 32):
        return FQ.is_zero(_pairs(a)[:, 0], k=k).all(axis=0) & \
               FQ.is_zero(_pairs(a)[:, 1], k=k).all(axis=0)

    def eq(self, a, b, k: int = 32):
        d = FQ.sub(a, b, k=k)
        return jnp.all(
            _stack([FQ.is_zero(d[:, i], k=2 * k) for i in range(6)]), axis=0)

    @staticmethod
    def select(mask, a, b):
        return jnp.where(mask[None, None], a, b)


FQ6 = _Fq6()


# ===========================================================================
# Fq12: uint32[nl, 12, *batch]
# ===========================================================================

class _Fq12:
    name = "Fq12"
    DIM = 12

    def zeros(self, batch_shape=()):
        return FQ.zeros((12,) + tuple(batch_shape))

    def one(self, batch_shape=()):
        z = FQ.zeros((11,) + tuple(batch_shape))
        return jnp.concatenate([FQ.one(batch_shape)[:, None], z], axis=1)

    def c(self, a, i):
        return a[:, 6 * i:6 * i + 6]

    def build(self, c0, c1):
        return jnp.concatenate([c0, c1], axis=1)

    def add(self, a, b):
        return FQ.add(a, b)

    def sub(self, a, b, k: int = 8):
        return FQ.sub(a, b, k=k)

    def double(self, a):
        return FQ.double(a)

    def mul(self, a, b):
        """Karatsuba over Fq6; ONE stacked (nl, 54-wide) base multiply.

        Inputs < 8p, output < 2p. On TPU (outside vmap) the whole multiply
        runs as ONE fused Pallas kernel (ops/pallas_tower.py) -- the
        pairing path is dispatch-bound without it.
        """
        from . import pallas_tower as PT
        import numpy as _np
        if (PT.usable(a, b)
                and int(_np.prod(a.shape[2:], dtype=_np.int64)) <= 4096
                and int(_np.prod(b.shape[2:], dtype=_np.int64)) <= 4096):
            return PT.fq12_mul(a, b)
        F6 = FQ6
        a0, a1 = self.c(a, 0), self.c(a, 1)
        b0, b1 = self.c(b, 0), self.c(b, 1)
        sa = FQ.add(a0, a1)
        sb = FQ.add(b0, b1)
        X = _stack([a0, a1, sa], axis=2)       # (nl, 6, 3, *batch)
        Y = _stack([b0, b1, sb], axis=2)
        T = F6.mul_wide6(X, Y)                 # (2nl+1, 6, 3, *batch)
        t0, t1, ts = T[:, :, 0], T[:, :, 1], T[:, :, 2]
        c0 = FQ.add_wide(t0, F6.v_wide(t1))
        c1 = FQ.sub_wide(ts, FQ.add_wide(t0, t1), k2=1 << 18)
        return FQ.redc(self.build(c0, c1))

    def sqr(self, a):
        """Dedicated squaring: 2 Fq6 wide products instead of mul's 3.

        c0 = (a0+a1)(a0+v a1) - t - v t,  c1 = 2t,  t = a0 a1.
        Input bound: coeffs < 4p (Miller-loop f values are < 2p).
        """
        from . import pallas_tower as PT
        import numpy as _np
        if (PT.usable(a)
                and int(_np.prod(a.shape[2:], dtype=_np.int64)) <= 4096):
            return PT.fq12_sqr(a)
        F6 = FQ6
        a0, a1 = self.c(a, 0), self.c(a, 1)
        s = FQ.add(a0, a1)                       # < 8p
        sv = FQ.add(a0, F6.mul_by_v(a1, k=8))    # < 4p + 12p = 16p
        X = _stack([s, a0], axis=2)              # (nl, 6, 2, *batch)
        Y = _stack([sv, a1], axis=2)
        T = F6.mul_wide6(X, Y)                   # wide < 2^16 p^2
        t0, t1 = T[:, :, 0], T[:, :, 1]          # s*sv, a0*a1
        u = FQ.add_wide(t1, F6.v_wide(t1))       # < (2^16 + 2^17.6) p^2
        c0 = FQ.sub_wide(t0, u, k2=1 << 18)      # < 2^18.4 p^2 < p*R
        c1 = FQ.double_wide(t1)
        return FQ.redc(self.build(c0, c1))

    def conj(self, a, k: int = 2):
        return self.build(self.c(a, 0), FQ.neg(self.c(a, 1), k=k))

    def inv(self, a):
        F6 = FQ6
        a0, a1 = self.c(a, 0), self.c(a, 1)
        t = F6.sub(F6.mul(a0, a0), F6.mul_by_v(F6.mul(a1, a1), k=2), k=8)
        ti = F6.inv(t)
        return self.build(F6.mul(a0, ti), F6.mul(F6.neg(a1, k=2), ti))

    def mul_fq6(self, a, s):
        """Both Fq6 halves times one Fq6 element s."""
        h = _stack([self.c(a, 0), self.c(a, 1)], axis=2)  # (nl, 6, 2, *b)
        r = FQ6.mul(h, s[:, :, None])
        return self.build(r[:, :, 0], r[:, :, 1])

    # ---- predicates ----
    def is_zero(self, a, k: int = 32):
        return jnp.all(
            _stack([FQ.is_zero(a[:, i], k=k) for i in range(12)]), axis=0)

    def eq(self, a, b, k: int = 16):
        d = FQ.sub(a, b, k=k)
        return jnp.all(
            _stack([FQ.is_zero(d[:, i], k=2 * k) for i in range(12)]), axis=0)

    @staticmethod
    def select(mask, a, b):
        return jnp.where(mask[None, None], a, b)

    def normalize(self, a, k: int = 32):
        return FQ.normalize(a, k=k)

    # ---- Frobenius ----
    _frob_cache: dict = {}

    def _frob_consts(self, power: int):
        """gamma_m = xi^((2j+i)(p^k-1)/6) packed as (nl, 2, 6), pair = 3i+j."""
        if power not in self._frob_cache:
            pairs = []
            for i in range(2):
                for j in range(3):
                    pairs.append(
                        C._fq2_pow(C._XI, ((2 * j + i) * (C.P ** power - 1)) // 6))
            self._frob_cache[power] = pairs
        return FQ2.from_ints(self._frob_cache[power])   # (nl, 2, 6)

    def frobenius(self, a, power: int = 1):
        """a^(p^power)."""
        k = power % 12
        if k == 0:
            return a
        batch = a.shape[2:]
        ap = _pairs(a)                                  # (nl, 2, 6, *batch)
        if k % 2 == 1:
            ap = _stack([ap[:, 0], FQ.neg(ap[:, 1], k=8)], axis=1)
        g = self._frob_consts(k).reshape((FQ.n, 2, 6) + (1,) * len(batch))
        return _unpairs(FQ2.mul(ap, g))

    # ---- cyclotomic subgroup ops (for the final exponentiation) ----

    def cyclotomic_sqr(self, a):
        """Granger-Scott squaring; valid when a^(p^6+1) = 1 (after easy part).

        Verified against generic sqr in tests.
        """
        from . import pallas_tower as PT
        import numpy as _np
        if (PT.usable(a)
                and int(_np.prod(a.shape[2:], dtype=_np.int64)) <= 4096):
            return PT.cyc_sqr(a)
        F2 = FQ2
        batch = a.shape[2:]
        ap = jnp.moveaxis(a.reshape((FQ.n, 6, 2) + batch), 2, 1)
        # ap[:, :, m]: Fq2 coefficient m = 3i + j  <-> w^i v^j
        c0, c1, c2 = ap[:, :, 0], ap[:, :, 1], ap[:, :, 2]
        c3, c4, c5 = ap[:, :, 3], ap[:, :, 4], ap[:, :, 5]

        # three Fq4 squarings, batched into one wide mul via sqr/mul stacks
        x0 = _stack([c0, c3, c1], axis=2)      # (nl, 2, 3, *batch)
        x1 = _stack([c4, c2, c5], axis=2)
        t_sq = F2.redc2(F2.sqr_wide2(
            jnp.concatenate([x0, x1], axis=2)))          # squares of all six
        s0, s1 = t_sq[:, :, 0:3], t_sq[:, :, 3:6]
        sx = F2.redc2(F2.sqr_wide2(FQ.add(x0, x1)))      # (x0+x1)^2
        ta = FQ.add(s0, _stack([FQ.sub(s1[:, 0], s1[:, 1], k=8),
                                FQ.add(s1[:, 0], s1[:, 1])], axis=1))
        # ta = x0^2 + xi x1^2 ; tb = sx - x0^2 - x1^2 = 2 x0 x1
        tb = FQ.sub(sx, FQ.add(s0, s1), k=8)

        # Fq4 squares: A = fp4sq(c0, c4), B = fp4sq(c3, c2), C = fp4sq(c1, c5)
        A0, B0, C0 = ta[:, :, 0], ta[:, :, 1], ta[:, :, 2]
        A1, B1, C1 = tb[:, :, 0], tb[:, :, 1], tb[:, :, 2]

        def comb_a(t, cc):   # 3t - 2c = 2(t - c) + t
            return FQ.add(FQ.double(FQ.sub(t, cc, k=32)), t)

        def comb_b(t, cc):   # 3t + 2c = 2(t + c) + t
            return FQ.add(FQ.double(FQ.add(t, cc)), t)

        z0 = comb_a(A0, c0)                      # c00' = 3 A0 - 2 c00
        z1 = comb_a(B0, c1)                      # c01' = 3 B0 - 2 c01
        z2 = comb_a(C0, c2)                      # c02' = 3 C0 - 2 c02
        z3 = comb_b(FQ2.mul_by_xi(C1, k=32), c3)  # c10' = 3 xi C1 + 2 c10
        z4 = comb_b(A1, c4)                      # c11' = 3 A1 + 2 c11
        z5 = comb_b(B1, c5)                      # c12' = 3 B1 + 2 c12
        out = _stack([z0, z1, z2, z3, z4, z5], axis=2)   # (nl, 2, 6, *batch)
        # fold + normalize: scan-carried value reduced to < p so every
        # downstream Fq12 multiply sees comfortably-bounded inputs.
        return FQ.normalize(FQ.fold(_unpairs(out)), k=32)

    def cyclotomic_pow(self, a, e: int, conjugate_result: bool = False):
        """a^e (fixed positive exponent) in the cyclotomic subgroup.

        Low-Hamming-weight exponents (the BLS parameter family) run as a
        static schedule -- runs of cyclotomic squarings via `lax.scan` with
        the few true multiplies unrolled between them -- so a 64-bit chain
        costs 63 squarings + (weight-1) muls instead of 63 of each.
        Dense exponents keep the uniform square-and-select-multiply scan.
        """
        assert e > 0
        nbits = e.bit_length()
        if nbits == 1:
            return self.conj(a) if conjugate_result else a
        # On TPU a <= 64-bit static exponent runs as ONE fused launch (64
        # square-and-select-multiply iterations in-kernel); the BLS
        # final-exp chain (V3 63b, V_ABS 64b, |x| 64b) is exactly this
        # case, cutting the hard part from ~500 launches to 5.
        from . import pallas_tower as PT
        import numpy as _np
        if (nbits <= PT._CYC_POW_NBITS and PT.usable(a)
                and int(_np.prod(a.shape[2:], dtype=_np.int64)) <= 4096):
            return PT.cyc_pow(a, e, conjugate_result=conjugate_result)
        bit_list = [(e >> (nbits - 1 - i)) & 1 for i in range(nbits)]

        if sum(bit_list) <= 8:                   # sparse exponent
            # ONE scan; the rare multiply runs under lax.cond on a static
            # per-iteration flag. Same op count as a segmented static
            # schedule (n-1 squarings + weight-1 muls), but a single
            # compiled scan body instead of one scan instance per
            # squaring run -- final-exp cold-compile drops several-fold.
            flags = jnp.asarray(np.array(bit_list[1:], dtype=np.bool_))

            def body(acc, mul_flag):
                acc = self.cyclotomic_sqr(acc)
                acc = lax.cond(mul_flag,
                               lambda t: self.mul(t, a),
                               lambda t: t, acc)
                return acc, None

            out, _ = lax.scan(body, a, flags)
        else:
            bits = jnp.asarray(np.array(bit_list[1:], dtype=np.uint32))

            def body(acc, bit):
                acc = self.cyclotomic_sqr(acc)
                acc2 = self.mul(acc, a)
                return jnp.where((bit > 0)[None, None], acc2, acc), None

            out, _ = lax.scan(body, a, bits)
        if conjugate_result:
            out = self.conj(out)
        return out

    def pow_x(self, a):
        """a^x for the (negative) BLS parameter x: conj(a^|x|)."""
        return self.cyclotomic_pow(a, abs(C.X), conjugate_result=True)

    # ---- io ----
    def from_ints(self, vals):
        """vals: [((3 Fq2-pairs), (3 Fq2-pairs)), ...] (oracle layout)."""
        flat = []
        for v in vals:
            for i in range(2):
                for j in range(3):
                    flat.append(v[i][j][0])
                    flat.append(v[i][j][1])
        arr = FQ.from_ints(flat)
        return arr.reshape(FQ.n, len(vals), 12).transpose(0, 2, 1)

    def to_ints(self, a):
        if a.ndim == 2:
            a = a[:, :, None]
        flat = jnp.moveaxis(a, 1, -1).reshape(FQ.n, -1)   # batch-major, coeff minor
        vals = FQ.to_ints(flat)
        out = []
        for b in range(len(vals) // 12):
            def cf(m):
                return vals[12 * b + m]
            out.append(tuple(
                tuple((cf(6 * i + 2 * j), cf(6 * i + 2 * j + 1))
                      for j in range(3))
                for i in range(2)))
        return out


FQ12 = _Fq12()
