"""Pallas field kernels vs the pure-JAX scan path (bit-exact).

Runs the kernels in interpreter mode so the logic is covered on the CPU
test mesh; on TPU the same kernels are the production path (fp.py dispatch
via GS_PALLAS=auto). Mirrors the reference's twin-path assertions
(sequential vs rayon, /root/reference/src/data_structures.rs:1837-1947):
two implementations of one op must agree exactly.
"""

import numpy as np
import jax
import pytest

from groth_sahai_tpu.ops.fp import FQ, FR
from groth_sahai_tpu.ops import pallas_fp
from groth_sahai_tpu.ops.limbs import ints_to_limbs, limbs_to_ints


def _rand_elems(field, rng, shape, bound):
    flat = [rng.randrange(bound) for _ in range(int(np.prod(shape)))]
    arr = ints_to_limbs(flat, field.n).reshape((field.n,) + tuple(shape))
    return jax.numpy.asarray(arr)


@pytest.mark.parametrize("field", [FQ, FR], ids=["Fq", "Fr"])
def test_mul_wide_matches_jax(field):
    import random
    rng = random.Random(7)
    a = _rand_elems(field, rng, (3, 5), field.p)
    b = _rand_elems(field, rng, (3, 5), field.p)
    ref = field.mul_wide(a, b)
    out = pallas_fp.mul_wide(field, a, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("field", [FQ, FR], ids=["Fq", "Fr"])
def test_redc_matches_jax(field):
    import random
    rng = random.Random(8)
    a = _rand_elems(field, rng, (7,), field.p)
    b = _rand_elems(field, rng, (7,), field.p)
    t = field.mul_wide(a, b)
    ref = field.redc(t)
    out = pallas_fp.redc(field, t, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("field", [FQ, FR], ids=["Fq", "Fr"])
def test_mont_mul_fused_matches_jax(field):
    import random
    rng = random.Random(9)
    # redundant-representation inputs up to 8p exercise the lazy bounds
    a = _rand_elems(field, rng, (4, 3), 8 * field.p)
    b = _rand_elems(field, rng, (4, 3), 8 * field.p)
    ref = field.redc(field.mul_wide(a, b))
    out = pallas_fp.mont_mul(field, a, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_mont_mul_semantics():
    """Kernel result is a*b*R^{-1} mod p (up to the <2p redundancy)."""
    import random
    rng = random.Random(10)
    xs = [rng.randrange(FQ.p) for _ in range(5)]
    ys = [rng.randrange(FQ.p) for _ in range(5)]
    a = jax.numpy.asarray(ints_to_limbs(xs, FQ.n))
    b = jax.numpy.asarray(ints_to_limbs(ys, FQ.n))
    out = pallas_fp.mont_mul(FQ, a, b, interpret=True)
    got = limbs_to_ints(np.asarray(FQ.normalize(out)))
    rinv = pow(FQ.R_int, -1, FQ.p)
    want = [(x * y * rinv) % FQ.p for x, y in zip(xs, ys)]
    assert got == want
