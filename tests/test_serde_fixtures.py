"""Reference-derive-layout byte fixtures (VERDICT r2 "missing" #1-4).

The wire layout is fixed by the reference's CanonicalSerialize derives:
  * EquProof { pi, theta, equ_type, rand }  /root/reference/src/prover/prove.rs:55-61
    -- note the reference DOES write its private T matrix ("rand"); our
    writer emits an empty matrix but the reader must skip a nonempty one;
  * Commit1/2 { coms, rand }                commit.rs:18-28
    -- rand is a ragged Vec<Vec<Fr>> after mixed appends (commit.rs:42-52);
  * CRS { u, v, g1_gen, g2_gen, gt_gen }    generator.rs:35-42;
  * ComT(4x PairingOutput)                  data_structures.rs:136-142.

Fixtures are synthesized per those rules with the independent host oracle
(small generator multiples), pinned by length and by round-trip identity.
"""

import numpy as np
import pytest

from groth_sahai_tpu.ops.fp import FQ, FR
from groth_sahai_tpu.ops.limbs import ints_to_limbs
from groth_sahai_tpu.ops.curve import g1_affine_from_ints, g2_affine_from_ints
from groth_sahai_tpu.ops.tower import FQ12
from groth_sahai_tpu.utils import serde
from groth_sahai_tpu.utils.rng import GsRng
from groth_sahai_tpu.models.prover import (Commit1, Commit2, EquProof,
                                           append_commit1, append_commit2)
from groth_sahai_tpu.models.statement import EquType

from . import oracle as O


def _g1pts(ks):
    return [None if k == 0 else O.g1_mul(O.G1_GEN, k) for k in ks]


def _g2pts(ks):
    return [None if k == 0 else O.g2_mul(O.G2_GEN, k) for k in ks]


def _g1ints(ks):
    return [None if p is None else (p[0].v, p[1].v) for p in _g1pts(ks)]


def _g2ints(ks):
    return [None if p is None else (tuple(c.v for c in p[0].c),
                                    tuple(c.v for c in p[1].c))
            for p in _g2pts(ks)]


def _com1(ks):
    """Com1 vector (2, len(ks)//2) from generator multiples."""
    k = len(ks) // 2
    aff = g1_affine_from_ints(_g1ints(ks))
    return (aff[0].reshape(FQ.n, k, 2).transpose(0, 2, 1),
            aff[1].reshape(FQ.n, k, 2).transpose(0, 2, 1),
            aff[2].reshape(k, 2).T)


def _com2(ks):
    k = len(ks) // 2
    aff = g2_affine_from_ints(_g2ints(ks))
    return (aff[0].reshape(FQ.n, 2, k, 2).transpose(0, 1, 3, 2),
            aff[1].reshape(FQ.n, 2, k, 2).transpose(0, 1, 3, 2),
            aff[2].reshape(k, 2).T)


def _fr_mat(vals):
    """[[ints]] rectangular -> uint32[17, I, J]."""
    import jax.numpy as jnp
    I, J = len(vals), len(vals[0])
    flat = [v for row in vals for v in row]
    return jnp.asarray(ints_to_limbs(flat, FR.n)).reshape(FR.n, I, J)


# ---------------------------------------------------------------------------
# EquProof with a NONEMPTY reference rand matrix
# ---------------------------------------------------------------------------

def test_proof_reader_skips_reference_rand():
    """Synthesizes EquProof bytes exactly as the reference derive writes
    them -- INCLUDING a nonempty 2x2 rand (T) matrix -- and asserts the
    reader lands on the trailing sentinel (prove.rs:55-61 layout)."""
    pi = _com2([1, 2])            # Com2 vec of 1 element
    theta = _com1([3, 4, 5, 6])   # Com1 vec of 2 elements
    blob = serde.com2_vec_to_bytes(pi)
    blob += serde.com1_vec_to_bytes(theta)
    blob += bytes([int(EquType.PairingProduct)])
    # reference rand: Matrix<Fr> 2x2, nonempty (prove.rs:60 writes T)
    blob += serde._vec_prefix(2)
    for row in ([11, 12], [13, 14]):
        blob += serde._vec_prefix(2)
        for v in row:
            blob += serde.fr_to_bytes(v)
    sentinel = b"\xAB\xCD"
    blob += sentinel

    proof, off = serde.proof_from_bytes(blob)
    assert blob[off:] == sentinel          # rand rows fully skipped
    assert proof.equ_type == EquType.PairingProduct
    assert proof.pi[2].shape == (2, 1)
    assert proof.theta[2].shape == (2, 2)
    # and the points survived: re-serialize pi/theta identically
    assert serde.com2_vec_to_bytes(proof.pi) == serde.com2_vec_to_bytes(pi)
    assert (serde.com1_vec_to_bytes(proof.theta)
            == serde.com1_vec_to_bytes(theta))


def test_proof_writer_layout_pinned():
    """Our writer's layout: pi vec + theta vec + 1 type byte + empty mat."""
    pi = _com2([1, 2])
    theta = _com1([3, 4])
    p = EquProof(pi=pi, theta=theta, equ_type=EquType.Quadratic)
    b = serde.proof_to_bytes(p)
    # 8 + 1*2*96 (pi) + 8 + 1*2*48 (theta) + 1 (type) + 8 (empty vec)
    assert len(b) == 8 + 192 + 8 + 96 + 1 + 8
    back, off = serde.proof_from_bytes(b)
    assert off == len(b)
    assert serde.proof_to_bytes(back) == b


# ---------------------------------------------------------------------------
# Ragged Commit rand (mixed append)
# ---------------------------------------------------------------------------

def test_mixed_append_ragged_roundtrip():
    """Group commit (w=2) appended with scalar commit (w=1): rand rows keep
    their true widths on the wire (commit.rs:42-52 ragged Vec<Vec<Fr>>)."""
    import jax.numpy as jnp
    grp = Commit1(coms=_com1([1, 2, 3, 4]), rand=_fr_mat([[7, 8], [9, 10]]))
    scl = Commit1(coms=_com1([5, 6]), rand=_fr_mat([[21]]))
    both = append_commit1(grp, scl)
    assert both.rand.shape == (FR.n, 3, 2)
    assert both.row_widths == (2, 2, 1)
    # padded column of the scalar row is zero
    assert not np.asarray(both.rand)[:, 2, 1].any()

    blob = serde.commit1_to_bytes(both)
    # rand section: 8 + (8+2*32)+(8+2*32)+(8+1*32) -- ragged row lengths
    coms_len = 8 + 3 * 2 * 48
    assert len(blob) == coms_len + 8 + (8 + 64) * 2 + (8 + 32)
    back, off = serde.commit1_from_bytes(blob)
    assert off == len(blob)
    assert back.row_widths == (2, 2, 1)
    assert np.array_equal(np.asarray(back.rand), np.asarray(both.rand))
    assert serde.commit1_to_bytes(back) == blob

    # G2 side, reversed order (scalar first)
    grp2 = Commit2(coms=_com2([1, 2]), rand=_fr_mat([[31, 32]]))
    scl2 = Commit2(coms=_com2([3, 4]), rand=_fr_mat([[33]]))
    both2 = append_commit2(scl2, grp2)
    assert both2.row_widths == (1, 2)
    blob2 = serde.commit2_to_bytes(both2)
    back2, off2 = serde.commit2_from_bytes(blob2)
    assert off2 == len(blob2)
    assert serde.commit2_to_bytes(back2) == blob2


def test_uniform_append_stays_rectangular():
    a = Commit1(coms=_com1([1, 2]), rand=_fr_mat([[1, 2]]))
    b = Commit1(coms=_com1([3, 4]), rand=_fr_mat([[3, 4]]))
    both = append_commit1(a, b)
    assert both.row_widths is None
    assert both.rand.shape == (FR.n, 2, 2)


# ---------------------------------------------------------------------------
# ComT codec
# ---------------------------------------------------------------------------

def test_comt_codec_roundtrip():
    """ComT = 4 GT fields, order (0,0),(0,1),(1,0),(1,1), no prefix
    (data_structures.rs:136-142)."""
    e = O.pairing(O.G1_GEN, O.G2_GEN)
    vals = [e, e * e, e * e * e, O.Fq12.one()]

    def to12(x):
        return tuple(tuple((c.c[0].v, c.c[1].v) for c in h.c) for h in x.c)

    arr = FQ12.from_ints([to12(v) for v in vals])     # (nl, 12, 4)
    comt = arr.reshape(arr.shape[0], arr.shape[1], 2, 2)
    b = serde.comt_to_bytes(comt)
    assert len(b) == 4 * 576
    # field order pinned: entry (0,0) first, (1,1) last
    assert b[:576] == serde.gt_to_bytes(to12(vals[0]))
    assert b[3 * 576:] == serde.gt_to_bytes(to12(vals[3]))
    back, off = serde.comt_from_bytes(b)
    assert off == len(b)
    assert serde.comt_to_bytes(back) == b


# ---------------------------------------------------------------------------
# CRS full-object fixture
# ---------------------------------------------------------------------------

def test_crs_fixture_roundtrip():
    """CRS bytes in generator.rs:36-42 field order (u, v, g1, g2, gt),
    synthesized from oracle generator multiples; reader re-derives the
    iota' bases and re-serializes to identical bytes."""
    u = _com1([1, 2, 3, 4])
    v = _com2([5, 6, 7, 8])
    blob = serde.com1_vec_to_bytes(u) + serde.com2_vec_to_bytes(v)
    blob += serde.g1_point_to_bytes((O.G1_GEN[0].v, O.G1_GEN[1].v))
    blob += serde.g2_point_to_bytes((tuple(c.v for c in O.G2_GEN[0].c),
                                     tuple(c.v for c in O.G2_GEN[1].c)))
    e = O.pairing(O.G1_GEN, O.G2_GEN)
    blob += serde.gt_to_bytes(
        tuple(tuple((c.c[0].v, c.c[1].v) for c in h.c) for h in e.c))

    crs, off = serde.crs_from_bytes(blob)
    assert off == len(blob)
    assert serde.crs_to_bytes(crs) == blob
    # derived iota' bases exist and have element shape (2,)
    assert crs.u_base[2].shape == (2,)
    assert crs.v_base[2].shape == (2,)


# ---------------------------------------------------------------------------
# G2 bulk codecs + compressed bulk readers
# ---------------------------------------------------------------------------

def test_bulk_g2_vec_matches_perelement():
    aff = g2_affine_from_ints(_g2ints([1, 2, 3, 0, 5]))
    for compressed in (True, False):
        assert (serde.g2_vec_to_bytes_bulk(aff, compressed)
                == serde.g2_vec_to_bytes(aff, compressed))
    b = serde.g2_vec_to_bytes_bulk(aff, compressed=False)
    back, off = serde.g2_vec_from_bytes_bulk(b)
    assert off == len(b)
    assert serde.g2_vec_to_bytes_bulk(back, compressed=False) == b


def test_bulk_compressed_readers_match_perelement():
    aff1 = g1_affine_from_ints(_g1ints([1, 2, 0, 7]))
    b1 = serde.g1_vec_to_bytes_bulk(aff1, compressed=True)
    back1, off1 = serde.g1_vec_from_bytes_bulk_compressed(b1)
    assert off1 == len(b1)
    assert serde.g1_vec_to_bytes_bulk(back1, compressed=True) == b1
    # and uncompressed re-serialization recovers the exact y
    ref1, _ = serde.g1_vec_from_bytes(b1)
    assert (serde.g1_vec_to_bytes_bulk(back1, compressed=False)
            == serde.g1_vec_to_bytes(ref1, compressed=False))

    aff2 = g2_affine_from_ints(_g2ints([1, 3, 0, 11]))
    b2 = serde.g2_vec_to_bytes_bulk(aff2, compressed=True)
    back2, off2 = serde.g2_vec_from_bytes_bulk_compressed(b2)
    assert off2 == len(b2)
    assert serde.g2_vec_to_bytes_bulk(back2, compressed=True) == b2
    ref2, _ = serde.g2_vec_from_bytes(b2)
    assert (serde.g2_vec_to_bytes_bulk(back2, compressed=False)
            == serde.g2_vec_to_bytes(ref2, compressed=False))
