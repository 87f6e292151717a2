"""Pallas field-kernel logic vs the pure-JAX scan path (bit-exact).

The kernels (ops/pallas_fp.py + ops/pallas_reg.py) are generic over
`PrimeField(modulus, n_limbs)`.  The CPU suite runs them in interpreter
mode on a TOY 5-limb field: same code path, same carry/CIOS structure,
but a ~100-op graph that XLA:CPU compiles instantly -- the full 25-limb
graphs trigger a pathological XLA:CPU compile (minutes per kernel; see
pallas_curve.py module notes).  Full-width kernels are validated compiled
ON-CHIP by tests/test_onchip.py and the bench conformance gates; set
GS_INTERPRET_TESTS=1 to also run the full-width interpret variants here.

Mirrors the reference's twin-path assertions (sequential vs rayon,
/root/reference/src/data_structures.rs:1837-1947): two implementations of
one op must agree exactly.
"""

import os
import random

import numpy as np
import jax
import pytest

from groth_sahai_tpu.ops.fp import FQ, FR, PrimeField
from groth_sahai_tpu.ops import pallas_fp
from groth_sahai_tpu.ops.limbs import ints_to_limbs, limbs_to_ints

# 64-bit prime with 5 limbs = 80-bit capacity (16 bits headroom, same
# redundant-representation contract as FQ/FR).
TOY = PrimeField((1 << 61) - 1, 5, "Toy61")

FULL = pytest.mark.skipif(
    os.environ.get("GS_INTERPRET_TESTS", "0") != "1",
    reason="full-width interpret compile is pathologically slow on "
           "XLA:CPU; on-chip coverage in tests/test_onchip.py "
           "(set GS_INTERPRET_TESTS=1 to force)")


def _rand_elems(field, rng, shape, bound):
    flat = [rng.randrange(bound) for _ in range(int(np.prod(shape)))]
    arr = ints_to_limbs(flat, field.n).reshape((field.n,) + tuple(shape))
    return jax.numpy.asarray(arr)


@pytest.mark.parametrize("field", [TOY], ids=["Toy61"])
def test_mul_wide_matches_jax(field):
    rng = random.Random(7)
    a = _rand_elems(field, rng, (3, 5), field.p)
    b = _rand_elems(field, rng, (3, 5), field.p)
    ref = field.mul_wide(a, b)
    out = pallas_fp.mul_wide(field, a, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("field", [TOY], ids=["Toy61"])
def test_redc_matches_jax(field):
    rng = random.Random(8)
    a = _rand_elems(field, rng, (7,), field.p)
    b = _rand_elems(field, rng, (7,), field.p)
    t = field.mul_wide(a, b)
    ref = field.redc(t)
    out = pallas_fp.redc(field, t, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("field", [TOY], ids=["Toy61"])
def test_mont_mul_fused_matches_jax(field):
    rng = random.Random(9)
    # redundant-representation inputs up to 8p exercise the lazy bounds
    a = _rand_elems(field, rng, (4, 3), 8 * field.p)
    b = _rand_elems(field, rng, (4, 3), 8 * field.p)
    ref = field.redc(field.mul_wide(a, b))
    out = pallas_fp.mont_mul(field, a, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_mont_mul_semantics():
    """Kernel result is a*b*R^{-1} mod p (up to the <2p redundancy)."""
    rng = random.Random(10)
    field = TOY
    xs = [rng.randrange(field.p) for _ in range(5)]
    ys = [rng.randrange(field.p) for _ in range(5)]
    a = jax.numpy.asarray(ints_to_limbs(xs, field.n))
    b = jax.numpy.asarray(ints_to_limbs(ys, field.n))
    out = pallas_fp.mont_mul(field, a, b, interpret=True)
    got = limbs_to_ints(np.asarray(field.normalize(out)))
    rinv = pow(field.R_int, -1, field.p)
    exp = [x * y * rinv % field.p for x, y in zip(xs, ys)]
    assert got == exp


@FULL
@pytest.mark.parametrize("field", [FQ, FR], ids=["Fq", "Fr"])
def test_mont_mul_full_width(field):
    rng = random.Random(9)
    a = _rand_elems(field, rng, (4, 3), 8 * field.p)
    b = _rand_elems(field, rng, (4, 3), 8 * field.p)
    ref = field.redc(field.mul_wide(a, b))
    out = pallas_fp.mont_mul(field, a, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
