"""Fused Fq12 tower kernel (ops/pallas_tower.py) vs the pure-JAX tower.

Interpret mode on CPU; compiled-mode conformance runs through the on-chip
bench gate. Outputs are compared MOD p (the fused kernel post-reduces to
< 2p with a Montgomery-one multiply, so raw limbs may differ by p from
the lazy-reduction path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from groth_sahai_tpu.ops.fp import FQ
from groth_sahai_tpu.ops.tower import FQ12
from groth_sahai_tpu.ops import pallas_tower as PT

from . import oracle as O
from .test_gs_e2e import dev_gt
from .test_tower import fq12_vals


@pytest.fixture(scope="module")
def gt_vals():
    e = O.pairing(O.G1_GEN, O.G2_GEN)
    return e, e * e, e * e * e


def _norm(x):
    return np.asarray(jax.jit(lambda v: FQ.normalize(v, k=4))(x))


def test_fused_fq12_mul_matches_tower(gt_vals):
    e, e2, e3 = gt_vals
    a = dev_gt(e)
    b = dev_gt(e2)
    got = PT.fq12_mul(a, b, interpret=True)
    ref = jax.jit(FQ12.mul)(a, b)
    assert np.array_equal(_norm(got), _norm(ref))
    # and against the oracle value e^3
    want = dev_gt(e3)
    assert np.array_equal(_norm(got), _norm(want))


def test_fused_cyc_sqr(gt_vals):
    """Fused Granger-Scott cyclotomic square == generic square on a
    pairing output (which lies in the cyclotomic subgroup)."""
    e, e2, _ = gt_vals
    a = dev_gt(e)
    got = PT.cyc_sqr(a, interpret=True)
    assert np.array_equal(_norm(got), _norm(dev_gt(e2)))


def test_fused_chain_stays_bounded(gt_vals):
    """Chained fused muls (the Miller-loop shape; also covers fq12_sqr,
    which delegates to mul) stay on the oracle orbit: e -> e^2 -> e^4.
    One interpret-mode trace is reused across iterations -- interpret-mode
    compiles of these fused bodies are minutes each on CPU, so coverage
    here is intentionally minimal; the compiled path is gated by the
    on-chip bench conformance check."""
    e, _, _ = gt_vals
    acc = dev_gt(e)
    cur = e
    for _ in range(2):
        acc = PT.fq12_sqr(acc, interpret=True)
        cur = cur * cur
        assert np.array_equal(_norm(acc), _norm(dev_gt(cur)))