"""Tower field (Fq2/Fq6/Fq12) tests against the pure-Python oracle."""

import random

import jax
import jax.numpy as jnp
import pytest

from groth_sahai_tpu.ops.fp import FQ
from groth_sahai_tpu.ops.tower import FQ2, FQ6, FQ12
from groth_sahai_tpu.ops import bls12_381 as C

from . import oracle as O


def rand_fq2(rng):
    return (rng.randrange(C.P), rng.randrange(C.P))


def o_fq2(v):
    return O.Fq2([O.Fq(v[0]), O.Fq(v[1])])


def o_fq6(v):
    return O.Fq6([o_fq2(x) for x in v])


def o_fq12(v):
    return O.Fq12([o_fq6(x) for x in v])


def fq2_vals(o):
    return tuple(c.v for c in o.c)


def fq6_vals(o):
    return tuple(fq2_vals(c) for c in o.c)


def fq12_vals(o):
    return tuple(fq6_vals(c) for c in o.c)


def dev_fq6(vals_list):
    """[((c00,c01),(c10,c11),(c20,c21)), ...] -> uint32[nl, 6, B]."""
    flat = [x for v in vals_list for pr in v for x in pr]
    arr = FQ.from_ints(flat)
    return arr.reshape(FQ.n, len(vals_list), 6).transpose(0, 2, 1)


def fq6_to_vals(a):
    if a.ndim == 2:
        a = a[:, :, None]
    flat = jnp.moveaxis(a, 1, -1).reshape(FQ.n, -1)
    vals = FQ.to_ints(flat)
    return [tuple((vals[6 * b + 2 * j], vals[6 * b + 2 * j + 1])
                  for j in range(3)) for b in range(len(vals) // 6)]


def dev_fq12(vals_list):
    flat = [x for v in vals_list for six in v for pr in six for x in pr]
    arr = FQ.from_ints(flat)
    return arr.reshape(FQ.n, len(vals_list), 12).transpose(0, 2, 1)


def test_fq2_ops():
    rng = random.Random(11)
    va = [rand_fq2(rng) for _ in range(8)]
    vb = [rand_fq2(rng) for _ in range(8)]
    a, b = FQ2.from_ints(va), FQ2.from_ints(vb)
    got_mul = FQ2.to_ints(jax.jit(FQ2.mul)(a, b))
    assert got_mul == [fq2_vals(o_fq2(x) * o_fq2(y)) for x, y in zip(va, vb)]
    got_sqr = FQ2.to_ints(jax.jit(FQ2.sqr)(a))
    assert got_sqr == [fq2_vals(o_fq2(x) * o_fq2(x)) for x in va]
    got_inv = FQ2.to_ints(jax.jit(FQ2.inv)(a))
    assert got_inv == [fq2_vals(o_fq2(x).inv()) for x in va]
    got_xi = FQ2.to_ints(jax.jit(FQ2.mul_by_xi)(a))
    assert got_xi == [fq2_vals(o_fq2(x).mul_by_xi()) for x in va]


def test_fq6_mul_inv():
    rng = random.Random(12)
    va = [tuple(rand_fq2(rng) for _ in range(3)) for _ in range(4)]
    vb = [tuple(rand_fq2(rng) for _ in range(3)) for _ in range(4)]
    a, b = dev_fq6(va), dev_fq6(vb)
    got = fq6_to_vals(jax.jit(FQ6.mul)(a, b))
    assert got == [fq6_vals(o_fq6(x) * o_fq6(y)) for x, y in zip(va, vb)]
    inv = jax.jit(FQ6.inv)(a)
    prod = fq6_to_vals(jax.jit(FQ6.mul)(a, inv))
    assert prod == [((1, 0), (0, 0), (0, 0))] * 4
    got_v = fq6_to_vals(jax.jit(FQ6.mul_by_v)(a))
    assert got_v == [fq6_vals(o_fq6(x).mul_by_v()) for x in va]


def test_fq12_mul_inv_conj():
    rng = random.Random(13)
    va = [tuple(tuple(rand_fq2(rng) for _ in range(3)) for _ in range(2))
          for _ in range(3)]
    vb = [tuple(tuple(rand_fq2(rng) for _ in range(3)) for _ in range(2))
          for _ in range(3)]
    a, b = dev_fq12(va), dev_fq12(vb)
    got = FQ12.to_ints(jax.jit(FQ12.mul)(a, b))
    assert got == [fq12_vals(o_fq12(x) * o_fq12(y)) for x, y in zip(va, vb)]
    prod = jax.jit(lambda x: FQ12.mul(x, FQ12.inv(x)))(a)
    assert FQ12.to_ints(prod) == [fq12_vals(O.Fq12.one())] * 3
    got_conj = FQ12.to_ints(jax.jit(FQ12.conj)(a))
    assert got_conj == [fq12_vals(o_fq12(x).conj()) for x in va]


def test_fq12_frobenius():
    rng = random.Random(14)
    va = [tuple(tuple(rand_fq2(rng) for _ in range(3)) for _ in range(2))
          for _ in range(2)]
    a = dev_fq12(va)
    for power in (1, 2, 3, 6):
        got = FQ12.to_ints(jax.jit(lambda x, p=power: FQ12.frobenius(x, p))(a))
        want = []
        for v in va:
            o = o_fq12(v)
            for _ in range(power):
                o = o.frobenius()
            want.append(fq12_vals(o))
        assert got == want, f"frobenius power {power}"


def test_cyclotomic_sqr_matches_generic():
    rng = random.Random(15)
    v = tuple(tuple(rand_fq2(rng) for _ in range(3)) for _ in range(2))
    o_cyc = o_fq12(v).pow((O.P ** 6 - 1) * (O.P ** 2 + 1))
    a = dev_fq12([fq12_vals(o_cyc)])
    got = FQ12.to_ints(jax.jit(FQ12.cyclotomic_sqr)(a))
    assert got == [fq12_vals(o_cyc * o_cyc)]


def test_cyclotomic_pow_x():
    rng = random.Random(16)
    v = tuple(tuple(rand_fq2(rng) for _ in range(3)) for _ in range(2))
    o_cyc = o_fq12(v).pow((O.P ** 6 - 1) * (O.P ** 2 + 1))
    a = dev_fq12([fq12_vals(o_cyc)])
    got = FQ12.to_ints(jax.jit(FQ12.pow_x)(a))
    assert got == [fq12_vals(o_cyc.pow(abs(C.X)).conj())]
