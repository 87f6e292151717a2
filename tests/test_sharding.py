"""Multi-chip sharding tests on the 8-virtual-device CPU mesh.

Exercises the production parallelism plan (SURVEY.md section 2c): point
axis sharded for MSM, pair axis sharded for multi-pairing, with collective
merges -- the capability the reference never had (rayon-only).
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from groth_sahai_tpu.ops.fp import FR
from groth_sahai_tpu.ops.limbs import ints_to_limbs
from groth_sahai_tpu.ops.curve import G1, G2, g1_affine_from_ints, \
    g2_affine_from_ints
from groth_sahai_tpu.ops import pairing as pr
from groth_sahai_tpu.ops.tower import FQ12
from groth_sahai_tpu.parallel.mesh import make_mesh
from groth_sahai_tpu.parallel.sharded import sharded_msm, \
    sharded_multi_pairing

from . import oracle as O


def o_g1(pt):
    return None if pt is None else (pt[0].v, pt[1].v)


def o_g2(pt):
    if pt is None:
        return None
    return (tuple(c.v for c in pt[0].c), tuple(c.v for c in pt[1].c))


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 4, "virtual device mesh missing"
    return make_mesh(4)


def test_sharded_msm(mesh):
    rng = random.Random(41)
    N = 4 * 8                       # 4 devices x 4 lanes x 2 rows
    ks = [rng.randrange(1, 99) for _ in range(N)]
    ss = [rng.randrange(O.R) for _ in range(N)]
    pts = g1_affine_from_ints([o_g1(O.g1_mul(O.G1_GEN, k)) for k in ks])
    scal = jnp.asarray(ints_to_limbs(ss, FR.n))

    out = sharded_msm(mesh, G1, pts, scal, window=4, lanes=4)
    ref = jax.jit(G1.msm_naive)(pts, scal)
    assert bool(np.asarray(jax.jit(G1.eq_jac)(out, ref)))


def test_sharded_multi_pairing(mesh):
    rng = random.Random(42)
    K = 8
    ka = [rng.randrange(1, 50) for _ in range(K)]
    kb = [rng.randrange(1, 50) for _ in range(K)]
    P = g1_affine_from_ints([o_g1(O.g1_mul(O.G1_GEN, k)) for k in ka])
    Q = g2_affine_from_ints([o_g2(O.g2_mul(O.G2_GEN, k)) for k in kb])

    out = sharded_multi_pairing(mesh, P, Q)
    ref = jax.jit(lambda p, q: pr.multi_pairing(p, q, axis=0))(P, Q)
    assert bool(np.asarray(FQ12.eq(out, ref)))
