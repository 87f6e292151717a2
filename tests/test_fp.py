"""Field-law and oracle cross-check tests for the limb field core.

Mirrors the reference's tier-1 algebra tests
(/root/reference/src/data_structures.rs:921-1603) at the field level.
"""

import random

import numpy as np
import pytest

from groth_sahai_tpu.ops.fp import FQ, FR

FIELDS = [FQ, FR]


def rand_ints(field, k, seed):
    rng = random.Random(seed)
    return [rng.randrange(field.p) for _ in range(k)]


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_roundtrip(F):
    vals = rand_ints(F, 16, 1) + [0, 1, F.p - 1]
    a = F.from_ints(vals)
    assert F.to_ints(a) == vals


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_add_sub_neg(F):
    va = rand_ints(F, 32, 2) + [0, F.p - 1]
    vb = rand_ints(F, 32, 3) + [F.p - 1, 0]
    a, b = F.from_ints(va), F.from_ints(vb)
    assert F.to_ints(F.add(a, b)) == [(x + y) % F.p for x, y in zip(va, vb)]
    assert F.to_ints(F.sub(a, b)) == [(x - y) % F.p for x, y in zip(va, vb)]
    assert F.to_ints(F.neg(a)) == [(-x) % F.p for x in va]


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_mul(F):
    va = rand_ints(F, 64, 4) + [0, 1, F.p - 1, F.p - 1]
    vb = rand_ints(F, 64, 5) + [F.p - 1, F.p - 1, F.p - 1, 0]
    a, b = F.from_ints(va), F.from_ints(vb)
    assert F.to_ints(F.mul(a, b)) == [(x * y) % F.p for x, y in zip(va, vb)]
    assert F.to_ints(F.sqr(a)) == [(x * x) % F.p for x in va]


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_mul_small(F):
    va = rand_ints(F, 8, 6) + [0, F.p - 1]
    a = F.from_ints(va)
    for k in (1, 2, 3, 4, 8, 12, 64):
        assert F.to_ints(F.mul_small(a, k)) == [(x * k) % F.p for x in va]


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_inv_pow(F):
    va = rand_ints(F, 8, 7) + [1, F.p - 1]
    a = F.from_ints(va)
    inv = F.inv(a)
    assert F.to_ints(F.mul(a, inv)) == [1] * len(va)
    e = 0xDEADBEEFCAFE
    assert F.to_ints(F.pow_const(a, e)) == [pow(x, e, F.p) for x in va]
    # inv(0) == 0 convention
    z = F.from_ints([0])
    assert F.to_ints(F.inv(z)) == [0]


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_predicates_and_select(F):
    va = [0, 5, F.p - 1, 0]
    vb = [0, 5, 1, 2]
    a, b = F.from_ints(va), F.from_ints(vb)
    np.testing.assert_array_equal(np.asarray(F.is_zero(a)),
                                  [True, False, False, True])
    np.testing.assert_array_equal(np.asarray(F.eq(a, b)),
                                  [True, True, False, False])
    m = F.eq(a, b)
    sel = F.select(m, a, b)
    assert F.to_ints(sel) == [0, 5, 1, 2]


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_batched_shapes(F):
    """Ops work on multi-dim batches (n, 3, 4)."""
    vals = rand_ints(F, 12, 8)
    a = F.from_ints(vals).reshape(F.n, 3, 4)
    out = F.mul(a, a)
    assert out.shape == (F.n, 3, 4)
    got = F.to_ints(out.reshape(F.n, 12))
    assert got == [(x * x) % F.p for x in vals]
