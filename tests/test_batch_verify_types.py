"""Non-PPE batched verification (VERDICT r4 missing #3).

Split from test_batch_verify.py: each equation type's batch kernel is a
large cold XLA:CPU compile, and this container's CPU backend can segfault
after several of those in one process -- a separate file gets its own
xdist worker under --dist loadfile, bounding the per-process compile
count (see pytest.ini).
"""

import numpy as np
import pytest

from groth_sahai_tpu.ops.fp import FR
from groth_sahai_tpu.utils.rng import GsRng
from groth_sahai_tpu.models.crs import generate_crs
from groth_sahai_tpu.models.prover import commit_and_prove

from . import oracle as O
from .test_gs_e2e import (dev_g1, dev_g2, dev_fr,
                          aff_to_oracle_g1, aff_to_oracle_g2)

# ---------------------------------------------------------------------------
# non-PPE batched verification (VERDICT r4 missing #3: the iota_T target
# path -- tgt = FQ12.one / _target_pair joining the Miller product -- was
# dead untested code).  One batch per equation type, B = 2; the plain and
# randomized paths alternate across types to bound CPU compile cost while
# both paths see a non-PPE tgt.
# ---------------------------------------------------------------------------

from groth_sahai_tpu.models.statement import MSMEG1, MSMEG2, QuadEqu
from groth_sahai_tpu.models.batch import verify_batch, verify_batch_randomized


@pytest.fixture(scope="module")
def crs2():
    rng = GsRng(909)
    crs = generate_crs(rng)
    return (crs, aff_to_oracle_g1(crs.g1_gen),
            aff_to_oracle_g2(crs.g2_gen), rng)


def _msmeg1_batch(crs, g1o, rng, B=2):
    equs, proofs = [], []
    for b in range(B):
        xo = [O.g1_mul(g1o, 2 + b)]
        y_sc = [4 + b]
        ao = [O.g1_mul(g1o, 29 + b)]
        b_sc = [31 + b]
        g = 5 + b
        t = O.g1_add(O.g1_add(O.g1_mul(xo[0], b_sc[0]),
                              O.g1_mul(ao[0], y_sc[0])),
                     O.g1_mul(xo[0], y_sc[0] * g))
        equ = MSMEG1(a_consts=dev_g1(ao), b_consts=dev_fr(b_sc),
                     gamma=dev_fr([g]).reshape(FR.n, 1, 1),
                     target=tuple(l[..., 0] for l in dev_g1([t])))
        equs.append(equ)
        proofs.append(commit_and_prove(equ, dev_g1(xo), dev_fr(y_sc),
                                       crs, rng))
    return equs, proofs


def test_batch_msmeg1(crs2):
    crs, g1o, _, rng = crs2
    equs, proofs = _msmeg1_batch(crs, g1o, rng)
    ok = verify_batch(equs, proofs, crs)
    assert ok.tolist() == [True, True]
    # tampered target in slot 1 must flip only slot 1
    bad = MSMEG1(equs[1].a_consts, equs[1].b_consts, equs[1].gamma,
                 tuple(l[..., 0] for l in dev_g1([O.g1_mul(g1o, 7)])))
    ok = verify_batch([equs[0], bad], proofs, crs)
    assert ok.tolist() == [True, False]


def test_batch_msmeg2_randomized(crs2):
    crs, _, g2o, rng = crs2
    equs, proofs = [], []
    for b in range(2):
        x_sc = [2 + b]
        yo = [O.g2_mul(g2o, 4 + b)]
        a_sc = [37 + b]
        bo = [O.g2_mul(g2o, 41 + b)]
        g = 3 + b
        t = O.g2_add(O.g2_add(O.g2_mul(bo[0], x_sc[0]),
                              O.g2_mul(yo[0], a_sc[0])),
                     O.g2_mul(yo[0], x_sc[0] * g))
        equ = MSMEG2(a_consts=dev_fr(a_sc), b_consts=dev_g2(bo),
                     gamma=dev_fr([g]).reshape(FR.n, 1, 1),
                     target=tuple(l[..., 0] for l in dev_g2([t])))
        equs.append(equ)
        proofs.append(commit_and_prove(equ, dev_fr(x_sc), dev_g2(yo),
                                       crs, rng))
    assert verify_batch_randomized(equs, proofs, crs, GsRng(3))
    bad = MSMEG2(equs[1].a_consts, equs[1].b_consts, equs[1].gamma,
                 tuple(l[..., 0] for l in dev_g2([O.g2_mul(g2o, 9)])))
    assert not verify_batch_randomized([equs[0], bad], proofs, crs, GsRng(4))


def test_batch_quad(crs2):
    crs, _, _, rng = crs2
    equs, proofs = [], []
    for b in range(2):
        x_sc = [2 + b]
        y_sc = [4 + b]
        a_sc = [43 + b]
        b_sc = [47 + b]
        g = 5 + b
        t = (b_sc[0] * x_sc[0] + a_sc[0] * y_sc[0]
             + g * x_sc[0] * y_sc[0]) % FR.p
        equ = QuadEqu(a_consts=dev_fr(a_sc), b_consts=dev_fr(b_sc),
                      gamma=dev_fr([g]).reshape(FR.n, 1, 1),
                      target=dev_fr([t])[:, 0])
        equs.append(equ)
        proofs.append(commit_and_prove(equ, dev_fr(x_sc), dev_fr(y_sc),
                                       crs, rng))
    ok = verify_batch(equs, proofs, crs)
    assert ok.tolist() == [True, True]
    bad = QuadEqu(equs[0].a_consts, equs[0].b_consts, equs[0].gamma,
                  dev_fr([(t + 1) % FR.p])[:, 0])
    ok = verify_batch([bad, equs[1]], proofs, crs)
    assert ok.tolist() == [False, True]
