"""Pure-Python BLS12-381 oracle for testing the TPU implementation.

This is a deliberately simple, slow, independent implementation using Python
big integers. It exists because the arkworks reference cannot run in this
environment (no Rust toolchain); it fills the role the arkworks test vectors
play in the reference's tests (e.g. /root/reference/tests/prover.rs:24-172).

Tower (matches arkworks ark-bls12-381):
    Fq2  = Fq[u]  / (u^2 + 1)
    Fq6  = Fq2[v] / (v^3 - (u+1))
    Fq12 = Fq6[w] / (w^2 - v)
M-type twist: E'/Fq2: y^2 = x^3 + 4(u+1); untwist (x,y) -> (x * w^-2, y * w^-3)
with w^6 = u+1.
"""

from __future__ import annotations

P = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
R = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
X_PARAM = -0xD201000000010000


# ----------------------------------------------------------------------------
# Field tower
# ----------------------------------------------------------------------------

class Fq:
    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v % P

    def __add__(self, o): return Fq(self.v + o.v)
    def __sub__(self, o): return Fq(self.v - o.v)
    def __mul__(self, o): return Fq(self.v * o.v)
    def __neg__(self): return Fq(-self.v)
    def __eq__(self, o): return self.v == o.v
    def __hash__(self): return hash(self.v)

    def inv(self): return Fq(pow(self.v, P - 2, P))
    def conj(self): return self

    @staticmethod
    def zero(): return Fq(0)
    @staticmethod
    def one(): return Fq(1)

    def is_zero(self): return self.v == 0

    def sqrt(self):
        # p % 4 == 3
        s = Fq(pow(self.v, (P + 1) // 4, P))
        return s if s * s == self else None


class _Ext:
    """Generic extension element: list of base-field coeffs."""
    __slots__ = ("c",)
    DEG = None
    BASE = None

    def __init__(self, c):
        self.c = list(c)
        assert len(self.c) == self.DEG

    def __add__(self, o): return type(self)([a + b for a, b in zip(self.c, o.c)])
    def __sub__(self, o): return type(self)([a - b for a, b in zip(self.c, o.c)])
    def __neg__(self): return type(self)([-a for a in self.c])
    def __eq__(self, o): return all(a == b for a, b in zip(self.c, o.c))
    def __hash__(self): return hash(tuple(self.c))

    @classmethod
    def zero(cls): return cls([cls.BASE.zero()] * cls.DEG)

    @classmethod
    def one(cls):
        c = [cls.BASE.zero()] * cls.DEG
        c[0] = cls.BASE.one()
        return cls(c)

    def is_zero(self): return all(a.is_zero() for a in self.c)

    def pow(self, e):
        r, b = type(self).one(), self
        while e:
            if e & 1:
                r = r * b
            b = b * b
            e >>= 1
        return r


class Fq2(_Ext):
    DEG, BASE = 2, Fq

    def __mul__(self, o):
        a0, a1 = self.c
        b0, b1 = o.c
        return Fq2([a0 * b0 - a1 * b1, a0 * b1 + a1 * b0])

    def inv(self):
        a0, a1 = self.c
        t = (a0 * a0 + a1 * a1).inv()
        return Fq2([a0 * t, -(a1 * t)])

    def conj(self): return Fq2([self.c[0], -self.c[1]])

    def mul_by_xi(self):
        # * (u + 1)
        a0, a1 = self.c
        return Fq2([a0 - a1, a0 + a1])

    def sqrt(self):
        # Generic Tonelli–Shanks-free sqrt for p^2 with p % 4 == 3
        # (algorithm from "Square root computation over even extension fields")
        a = self
        a1 = a.pow((P * P - 9) // 16) if False else None
        # Fall back: brute exponent (p^2+7)/16 invalid; use simple method:
        # candidate via pow((p^2 + 7) // 8)? Instead use the classic:
        cand = a.pow((P * P + 7) // 16) if False else None
        # Simplest correct approach: complex method since p % 4 == 3.
        a0, b0 = self.c
        if b0.is_zero():
            s = a0.sqrt()
            if s is not None:
                return Fq2([s, Fq.zero()])
            s = (-a0).sqrt()
            assert s is not None
            return Fq2([Fq.zero(), s])
        # alpha = a0^2 + a1^2 ; need sqrt of norm
        n = a0 * a0 + b0 * b0
        sn = n.sqrt()
        if sn is None:
            return None
        two_inv = Fq(pow(2, P - 2, P))
        x0sq = (a0 + sn) * two_inv
        x0 = x0sq.sqrt()
        if x0 is None:
            x0sq = (a0 - sn) * two_inv
            x0 = x0sq.sqrt()
            if x0 is None:
                return None
        x1 = b0 * (x0 + x0).inv()
        cand = Fq2([x0, x1])
        return cand if cand * cand == self else None


XI = Fq2([Fq(1), Fq(1)])


class Fq6(_Ext):
    DEG, BASE = 3, Fq2

    def __mul__(self, o):
        a0, a1, a2 = self.c
        b0, b1, b2 = o.c
        t0, t1, t2 = a0 * b0, a1 * b1, a2 * b2
        c0 = t0 + ((a1 + a2) * (b1 + b2) - t1 - t2).mul_by_xi()
        c1 = (a0 + a1) * (b0 + b1) - t0 - t1 + t2.mul_by_xi()
        c2 = (a0 + a2) * (b0 + b2) - t0 - t2 + t1
        return Fq6([c0, c1, c2])

    def mul_by_v(self):
        a0, a1, a2 = self.c
        return Fq6([a2.mul_by_xi(), a0, a1])

    def inv(self):
        a0, a1, a2 = self.c
        t0 = a0 * a0 - (a1 * a2).mul_by_xi()
        t1 = (a2 * a2).mul_by_xi() - a0 * a1
        t2 = a1 * a1 - a0 * a2
        d = (a0 * t0 + (a2 * t1).mul_by_xi() + (a1 * t2).mul_by_xi()).inv()
        return Fq6([t0 * d, t1 * d, t2 * d])


class Fq12(_Ext):
    DEG, BASE = 2, Fq6

    def __mul__(self, o):
        a0, a1 = self.c
        b0, b1 = o.c
        t0, t1 = a0 * b0, a1 * b1
        return Fq12([t0 + t1.mul_by_v(),
                     (a0 + a1) * (b0 + b1) - t0 - t1])

    def inv(self):
        a0, a1 = self.c
        t = (a0 * a0 - (a1 * a1).mul_by_v()).inv()
        return Fq12([a0 * t, -(a1 * t)])

    def conj(self):
        return Fq12([self.c[0], -self.c[1]])

    def frobenius(self):
        """x -> x^p."""
        # On the Fq-coefficient basis w^i v^j: conjugate Fq2 coeffs and
        # multiply by gamma powers; easier: map through Fq2 coeff list.
        g = [XI.pow((P**1 - 1) * k // 6) for k in range(6)]
        # Represent as c[i][j]: Fq12 = sum_{i<2, j<3} c_ij v^j w^i
        out6 = []
        for i, f6 in enumerate(self.c):
            coeffs = []
            for j, f2 in enumerate(f6.c):
                k = 2 * j + i  # power of w: w^(i) v^(j) = w^(i + 2j)
                coeffs.append(f2.conj() * g[k])
            out6.append(Fq6(coeffs))
        return Fq12(out6)


# ----------------------------------------------------------------------------
# Curves (affine, None = infinity)
# ----------------------------------------------------------------------------

B1 = Fq(4)
B2 = Fq2([Fq(4), Fq(4)])


def _add(pt1, pt2, field):
    if pt1 is None:
        return pt2
    if pt2 is None:
        return pt1
    x1, y1 = pt1
    x2, y2 = pt2
    if x1 == x2:
        if y1 == y2 and not y1.is_zero():
            lam = (x1 * x1 + x1 * x1 + x1 * x1) * (y1 + y1).inv()
        else:
            return None
    else:
        lam = (y2 - y1) * (x2 - x1).inv()
    x3 = lam * lam - x1 - x2
    y3 = lam * (x1 - x3) - y1
    return (x3, y3)


def _mul(pt, k, field):
    k %= R
    acc = None
    while k:
        if k & 1:
            acc = _add(acc, pt, field)
        pt = _add(pt, pt, field)
        k >>= 1
    return acc


def g1_add(p, q): return _add(p, q, Fq)
def g1_mul(p, k): return _mul(p, k, Fq)
def g2_add(p, q): return _add(p, q, Fq2)
def g2_mul(p, k): return _mul(p, k, Fq2)


G1_GEN = (
    Fq(0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB),
    Fq(0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1),
)
G2_GEN = (
    Fq2([Fq(0x024AA2B2F08F0A91260805272DC51051C6E47AD4FA403B02B4510B647AE3D1770BAC0326A805BBEFD48056C8C121BDB8),
         Fq(0x13E02B6052719F607DACD3A088274F65596BD0D09920B61AB5DA61BBDC7F5049334CF11213945D57E5AC7D055D042B7E)]),
    Fq2([Fq(0x0CE5D527727D6E118CC9CDC6DA2E351AADFD9BAA8CBDD3A76D429A695160D12C923AC9CC3BACA289E193548608B82801),
         Fq(0x0606C4A02EA734CC32ACD2B02BC28B99CB3E287E85A763AF267492AB572E99AB3F370D275CEC1DA1AAA9075FF05F79BE)]),
)


def on_curve_g1(p):
    if p is None:
        return True
    x, y = p
    return y * y == x * x * x + B1


def on_curve_g2(p):
    if p is None:
        return True
    x, y = p
    return y * y == x * x * x + B2


# ----------------------------------------------------------------------------
# Pairing (generic Miller loop over E(Fq12) after untwist; slow but simple)
# ----------------------------------------------------------------------------

def _fq_to_fq12(a: Fq) -> Fq12:
    return Fq12([Fq6([Fq2([a, Fq.zero()]), Fq2.zero(), Fq2.zero()]),
                 Fq6.zero()])


def _fq2_to_fq12(a: Fq2) -> Fq12:
    return Fq12([Fq6([a, Fq2.zero(), Fq2.zero()]), Fq6.zero()])


# w as an Fq12 element
_W = Fq12([Fq6.zero(), Fq6.one()])
_W2_INV = (_W * _W).inv()
_W3_INV = (_W * _W * _W).inv()


def untwist(q):
    """E'(Fq2) -> E(Fq12) for the M-type twist."""
    if q is None:
        return None
    x, y = q
    return (_fq2_to_fq12(x) * _W2_INV, _fq2_to_fq12(y) * _W3_INV)


def _line(pt1, pt2, at):
    """Evaluate the line through pt1, pt2 (on E(Fq12)) at affine point `at`."""
    x1, y1 = pt1
    x2, y2 = pt2
    xt, yt = at
    if x1 == x2 and y1 == y2:
        three, two = _fq_to_fq12(Fq(3)), _fq_to_fq12(Fq(2))
        lam = x1 * x1 * three * (y1 * two).inv()
    elif x1 == x2:
        # vertical
        return xt - x1
    else:
        lam = (y2 - y1) * (x2 - x1).inv()
    return yt - y1 - lam * (xt - x1)


def miller_loop(p, q):
    """f_{|x|, Q'}(P') over E(Fq12), with Q' = untwist(Q), P' = embed(P)."""
    if p is None or q is None:
        return Fq12.one()
    P_ = (_fq_to_fq12(p[0]), _fq_to_fq12(p[1]))
    Q_ = untwist(q)
    t = abs(X_PARAM)
    bits = bin(t)[3:]  # skip MSB
    f = Fq12.one()
    T = Q_
    for b in bits:
        f = f * f * _line(T, T, P_)
        T = _add_fq12(T, T)
        if b == "1":
            f = f * _line(T, Q_, P_)
            T = _add_fq12(T, Q_)
    if X_PARAM < 0:
        f = f.conj()
    return f


def _add_fq12(pt1, pt2):
    if pt1 is None:
        return pt2
    if pt2 is None:
        return pt1
    x1, y1 = pt1
    x2, y2 = pt2
    if x1 == x2:
        if y1 == y2 and not y1.is_zero():
            three, two = _fq_to_fq12(Fq(3)), _fq_to_fq12(Fq(2))
            lam = x1 * x1 * three * (y1 * two).inv()
        else:
            return None
    else:
        lam = (y2 - y1) * (x2 - x1).inv()
    x3 = lam * lam - x1 - x2
    y3 = lam * (x1 - x3) - y1
    return (x3, y3)


def final_exp(f: Fq12) -> Fq12:
    return f.pow((P**12 - 1) // R)


def pairing(p, q) -> Fq12:
    """Full ate pairing e(P, Q), P in G1, Q in G2 (affine or None)."""
    return final_exp(miller_loop(p, q))
