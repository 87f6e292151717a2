"""arkworks-canonical serialization for CRS / commitments / proofs.

Byte-compatible (to the best verifiable extent without a Rust toolchain in
this environment) with `ark-serialize` 0.4 as used by the reference's
derives (data_structures.rs:128-133, generator.rs:35, commit.rs:18-28,
prove.rs:55, statement.rs:61-97):

  * Fq: 48 bytes little-endian; Fr: 32 bytes LE.
  * Fq2: c0 then c1. Fq12: tower order c0.c0.c0 .. c1.c2.c1 (12 x 48 bytes).
  * G1 compressed: x LE with flags in the top bits of the LAST byte:
      0x40 = point at infinity, 0x80 = y is "negative" (y > -y; for Fq2
      the (c1, c0)-lexicographic comparison).
    Uncompressed: x || y, infinity flag on the last byte of y.
  * G2: same with x in Fq2 (96 bytes compressed).
  * Vec<T>: u64 LE length prefix then elements.
  * EquType: 1 byte (statement.rs:68-74).

Security note: the reference serializes the private proof-randomness matrix
inside EquProof (prove.rs:60). Our native format OMITS it (writing an empty
matrix) -- publishing prover randomness is at best wasteful; the reader
still accepts reference-produced bytes by skipping the field.

Decompression (sqrt in Fq / Fq2) runs host-side on Python ints.
"""

from __future__ import annotations

import numpy as np

from ..ops import bls12_381 as C
from ..ops.fp import FQ, FR
from ..ops.limbs import ints_to_limbs
from ..ops.curve import (g1_affine_from_ints, g2_affine_from_ints,
                         g1_affine_to_ints, g2_affine_to_ints)
from ..ops.tower import FQ12

P = C.P


# ---------------------------------------------------------------------------
# field element bytes
# ---------------------------------------------------------------------------

def fq_to_bytes(v: int) -> bytes:
    return int(v).to_bytes(48, "little")


def fq_from_bytes(b: bytes) -> int:
    return int.from_bytes(b, "little")


def fr_to_bytes(v: int) -> bytes:
    return int(v).to_bytes(32, "little")


def fr_from_bytes(b: bytes) -> int:
    return int.from_bytes(b, "little")


def _sqrt_fq(a: int):
    s = pow(a, (P + 1) // 4, P)          # p % 4 == 3
    return s if (s * s) % P == a else None


def _sqrt_fq2(a):
    """sqrt in Fq2 = Fq[u]/(u^2+1); returns (c0, c1) or None."""
    a0, a1 = a
    if a1 == 0:
        s = _sqrt_fq(a0)
        if s is not None:
            return (s, 0)
        s = _sqrt_fq((-a0) % P)
        return None if s is None else (0, s)
    n = (a0 * a0 + a1 * a1) % P
    sn = _sqrt_fq(n)
    if sn is None:
        return None
    two_inv = pow(2, P - 2, P)
    x0sq = (a0 + sn) * two_inv % P
    x0 = _sqrt_fq(x0sq)
    if x0 is None:
        x0 = _sqrt_fq((a0 - sn) * two_inv % P)
        if x0 is None:
            return None
    x1 = a1 * pow(2 * x0, P - 2, P) % P
    cand = (x0, x1)
    c0, c1 = cand
    if (c0 * c0 - c1 * c1) % P == a0 and (2 * c0 * c1) % P == a1:
        return cand
    return None


def _is_neg_fq(y: int) -> bool:
    return y > (P - y) % P


def _is_neg_fq2(y) -> bool:
    c0, c1 = y
    n0, n1 = (P - c0) % P, (P - c1) % P
    return (c1, c0) > (n1, n0)


# ---------------------------------------------------------------------------
# points
# ---------------------------------------------------------------------------

FLAG_INF = 0x40
FLAG_NEG = 0x80


def g1_point_to_bytes(pt, compressed=True) -> bytes:
    """pt: (x, y) ints or None for infinity."""
    if compressed:
        if pt is None:
            b = bytearray(fq_to_bytes(0))
            b[-1] |= FLAG_INF
            return bytes(b)
        x, y = pt
        b = bytearray(fq_to_bytes(x))
        if _is_neg_fq(y):
            b[-1] |= FLAG_NEG
        return bytes(b)
    if pt is None:
        b = bytearray(fq_to_bytes(0) + fq_to_bytes(0))
        b[-1] |= FLAG_INF
        return bytes(b)
    return fq_to_bytes(pt[0]) + fq_to_bytes(pt[1])


def g1_point_from_bytes(b: bytes, compressed=True):
    if compressed:
        assert len(b) == 48
        raw = bytearray(b)
        flags = raw[-1] & 0xC0
        raw[-1] &= 0x3F
        x = fq_from_bytes(bytes(raw))
        if flags & FLAG_INF:
            return None
        ysq = (pow(x, 3, P) + C.B_G1) % P
        y = _sqrt_fq(ysq)
        if y is None:
            raise ValueError("x not on curve")
        if bool(flags & FLAG_NEG) != _is_neg_fq(y):
            y = (P - y) % P
        return (x, y)
    assert len(b) == 96
    raw = bytearray(b)
    flags = raw[-1] & 0xC0
    raw[-1] &= 0x3F
    x = fq_from_bytes(bytes(raw[:48]))
    y = fq_from_bytes(bytes(raw[48:]))
    if flags & FLAG_INF:
        return None
    return (x, y)


def g2_point_to_bytes(pt, compressed=True) -> bytes:
    if compressed:
        if pt is None:
            b = bytearray(fq_to_bytes(0) * 2)
            b[-1] |= FLAG_INF
            return bytes(b)
        (x0, x1), y = pt
        b = bytearray(fq_to_bytes(x0) + fq_to_bytes(x1))
        if _is_neg_fq2(y):
            b[-1] |= FLAG_NEG
        return bytes(b)
    if pt is None:
        b = bytearray(fq_to_bytes(0) * 4)
        b[-1] |= FLAG_INF
        return bytes(b)
    (x0, x1), (y0, y1) = pt
    return (fq_to_bytes(x0) + fq_to_bytes(x1)
            + fq_to_bytes(y0) + fq_to_bytes(y1))


def g2_point_from_bytes(b: bytes, compressed=True):
    if compressed:
        assert len(b) == 96
        raw = bytearray(b)
        flags = raw[-1] & 0xC0
        raw[-1] &= 0x3F
        x = (fq_from_bytes(bytes(raw[:48])), fq_from_bytes(bytes(raw[48:])))
        if flags & FLAG_INF:
            return None
        # y^2 = x^3 + 4(u+1)
        x0, x1 = x
        xsq = ((x0 * x0 - x1 * x1) % P, 2 * x0 * x1 % P)
        xcb = ((xsq[0] * x0 - xsq[1] * x1) % P,
               (xsq[0] * x1 + xsq[1] * x0) % P)
        ysq = ((xcb[0] + C.B_G2[0]) % P, (xcb[1] + C.B_G2[1]) % P)
        y = _sqrt_fq2(ysq)
        if y is None:
            raise ValueError("x not on curve")
        if bool(flags & FLAG_NEG) != _is_neg_fq2(y):
            y = ((P - y[0]) % P, (P - y[1]) % P)
        return (x, y)
    assert len(b) == 192
    raw = bytearray(b)
    flags = raw[-1] & 0xC0
    raw[-1] &= 0x3F
    if flags & FLAG_INF:
        return None
    return ((fq_from_bytes(bytes(raw[0:48])), fq_from_bytes(bytes(raw[48:96]))),
            (fq_from_bytes(bytes(raw[96:144])),
             fq_from_bytes(bytes(raw[144:192]))))


# ---------------------------------------------------------------------------
# container helpers
# ---------------------------------------------------------------------------

def _vec_prefix(n: int) -> bytes:
    return int(n).to_bytes(8, "little")


def _read_prefix(b, off):
    return int.from_bytes(b[off:off + 8], "little"), off + 8


def gt_to_bytes(vals12) -> bytes:
    """Fq12 as 12 Fq coefficients in arkworks tower order.

    vals12: nested ((c0 pairs...), (c1 pairs...)) like oracle/`FQ12.to_ints`.
    """
    out = b""
    for six in vals12:                  # c0 (Fq6), c1 (Fq6)
        for pair in six:                # 3 Fq2
            out += fq_to_bytes(pair[0]) + fq_to_bytes(pair[1])
    return out


def gt_from_bytes(b: bytes):
    assert len(b) == 576
    vals = [fq_from_bytes(b[i * 48:(i + 1) * 48]) for i in range(12)]
    return tuple(tuple((vals[6 * i + 2 * j], vals[6 * i + 2 * j + 1])
                       for j in range(3)) for i in range(2))


# ---------------------------------------------------------------------------
# device-array <-> wire: Com vectors and protocol objects
# ---------------------------------------------------------------------------

def com1_vec_to_bytes(com, compressed=True) -> bytes:
    """Com1 vector (2, k) -> Vec<Com1> bytes (each Com1 = 2 G1 points)."""
    pts = g1_affine_to_ints(_flatten_com(com, 1))
    k = com[2].shape[-1]
    out = _vec_prefix(k)
    for i in range(k):
        out += g1_point_to_bytes(pts[2 * i], compressed)
        out += g1_point_to_bytes(pts[2 * i + 1], compressed)
    return out


def com2_vec_to_bytes(com, compressed=True) -> bytes:
    pts = g2_affine_to_ints(_flatten_com(com, 2))
    k = com[2].shape[-1]
    out = _vec_prefix(k)
    for i in range(k):
        out += g2_point_to_bytes(pts[2 * i], compressed)
        out += g2_point_to_bytes(pts[2 * i + 1], compressed)
    return out


def _flatten_com(com, ns):
    """Com (2, k) -> affine batch (2k,) ordered [elem0 pair0, elem0 pair1...]"""
    x, y, inf = com
    # coords (..struct, 2, k) -> (..struct, k, 2) -> (..struct, 2k)
    xs = np.moveaxis(np.asarray(x), -2, -1).reshape(np.asarray(x).shape[:-2] + (-1,))
    ys = np.moveaxis(np.asarray(y), -2, -1).reshape(np.asarray(y).shape[:-2] + (-1,))
    infs = np.moveaxis(np.asarray(inf), -2, -1).reshape(-1)
    import jax.numpy as jnp
    return (jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(infs))


def com1_vec_from_bytes(b: bytes, off=0, compressed=True):
    k, off = _read_prefix(b, off)
    size = 48 if compressed else 96
    pts = []
    for _ in range(2 * k):
        pts.append(g1_point_from_bytes(b[off:off + size], compressed))
        off += size
    # reorder [e0p0, e0p1, e1p0, ...] -> (2 pair, k)
    reordered = [pts[2 * i + j] for j in range(2) for i in range(k)]
    aff = g1_affine_from_ints(reordered)
    import jax.numpy as jnp
    return (aff[0].reshape(FQ.n, 2, k), aff[1].reshape(FQ.n, 2, k),
            aff[2].reshape(2, k)), off


def com2_vec_from_bytes(b: bytes, off=0, compressed=True):
    k, off = _read_prefix(b, off)
    size = 96 if compressed else 192
    pts = []
    for _ in range(2 * k):
        pts.append(g2_point_from_bytes(b[off:off + size], compressed))
        off += size
    reordered = [pts[2 * i + j] for j in range(2) for i in range(k)]
    aff = g2_affine_from_ints(reordered)
    return (aff[0].reshape(FQ.n, 2, 2, k), aff[1].reshape(FQ.n, 2, 2, k),
            aff[2].reshape(2, k)), off


def crs_to_bytes(crs, compressed=True) -> bytes:
    """CRS wire format (field order as generator.rs:36-42)."""
    from ..ops.curve import g1_affine_to_ints, g2_affine_to_ints
    out = com1_vec_to_bytes(crs.u, compressed)
    out += com2_vec_to_bytes(crs.v, compressed)
    g1pt = g1_affine_to_ints(tuple(
        np.asarray(l)[..., None] for l in crs.g1_gen[:2]) + (np.asarray(crs.g1_gen[2])[None],))
    out += g1_point_to_bytes(g1pt[0], compressed)
    g2pt = g2_affine_to_ints(tuple(
        np.asarray(l)[..., None] for l in crs.g2_gen[:2]) + (np.asarray(crs.g2_gen[2])[None],))
    out += g2_point_to_bytes(g2pt[0], compressed)
    out += gt_to_bytes(FQ12.to_ints(crs.gt_gen)[0])
    return out


def proof_to_bytes(proof, compressed=True) -> bytes:
    """EquProof wire format: pi, theta, equ_type, empty rand matrix.

    (The reference writes its private T matrix here, prove.rs:56-61; we
    write an empty matrix instead -- see module docstring.)
    """
    out = com2_vec_to_bytes(proof.pi, compressed)
    out += com1_vec_to_bytes(proof.theta, compressed)
    out += bytes([int(proof.equ_type)])
    out += _vec_prefix(0)
    return out


def proof_from_bytes(b: bytes, off=0, compressed=True):
    from ..models.prover import EquProof
    from ..models.statement import EquType
    pi, off = com2_vec_from_bytes(b, off, compressed)
    theta, off = com1_vec_from_bytes(b, off, compressed)
    ty = EquType(b[off]); off += 1
    nrows, off = _read_prefix(b, off)
    for _ in range(nrows):              # skip reference rand rows if present
        ncols, off = _read_prefix(b, off)
        off += 32 * ncols
    return EquProof(pi=pi, theta=theta, equ_type=ty), off
