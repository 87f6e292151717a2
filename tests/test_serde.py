"""Serialization round-trip tests (arkworks-canonical wire format).

Mirrors the reference's serde tests (generator.rs:186-207, commit.rs
test_commit_serde, prove.rs proof serde tests, statement.rs:210-392).
"""

import random

import jax.numpy as jnp
import numpy as np

from groth_sahai_tpu.utils import serde as S
from groth_sahai_tpu.ops import bls12_381 as C

from . import oracle as O


def o_g1(pt):
    return None if pt is None else (pt[0].v, pt[1].v)


def o_g2(pt):
    if pt is None:
        return None
    return (tuple(c.v for c in pt[0].c), tuple(c.v for c in pt[1].c))


def test_g1_point_roundtrip():
    rng = random.Random(51)
    pts = [o_g1(O.g1_mul(O.G1_GEN, rng.randrange(1, 10**6)))
           for _ in range(6)] + [None]
    for pt in pts:
        for compressed in (True, False):
            b = S.g1_point_to_bytes(pt, compressed)
            assert len(b) == (48 if compressed else 96)
            assert S.g1_point_from_bytes(b, compressed) == pt


def test_g2_point_roundtrip():
    rng = random.Random(52)
    pts = [o_g2(O.g2_mul(O.G2_GEN, rng.randrange(1, 10**6)))
           for _ in range(4)] + [None]
    for pt in pts:
        for compressed in (True, False):
            b = S.g2_point_to_bytes(pt, compressed)
            assert len(b) == (96 if compressed else 192)
            assert S.g2_point_from_bytes(b, compressed) == pt


def test_gt_roundtrip():
    e = O.pairing(O.G1_GEN, O.G2_GEN)
    vals = tuple(tuple((c2.c[0].v, c2.c[1].v) for c2 in c6.c) for c6 in e.c)
    b = S.gt_to_bytes(vals)
    assert len(b) == 576
    assert S.gt_from_bytes(b) == vals


def test_g1_flag_conventions():
    """Compressed encoding flag bits: infinity = 0x40, negative-y = 0x80."""
    b_inf = S.g1_point_to_bytes(None, True)
    assert b_inf[-1] & 0x40
    pt = o_g1(O.G1_GEN)
    neg = (pt[0], C.P - pt[1])
    b_pos = S.g1_point_to_bytes(pt if pt[1] <= C.P - pt[1] else neg, True)
    b_neg = S.g1_point_to_bytes(neg if pt[1] <= C.P - pt[1] else pt, True)
    assert not (b_pos[-1] & 0x80)
    assert b_neg[-1] & 0x80
