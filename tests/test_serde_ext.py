"""Extended serde round-trips: equations, commits, CRS reader, CProof.

Mirrors statement.rs:210-392 equation serde tests and commit.rs:294-335.
Split from test_protocol_api.py so each test FILE stays under the
container's per-process executable-load threshold (see pytest.ini).
"""

import random

import jax.numpy as jnp
import numpy as np

from groth_sahai_tpu.ops.fp import FR
from groth_sahai_tpu.ops.limbs import ints_to_limbs
from groth_sahai_tpu.ops.curve import G1, G2
from groth_sahai_tpu.ops.tower import FQ12
from groth_sahai_tpu.models.prover import batch_commit_G1, batch_commit_G2
from groth_sahai_tpu.models.crs import generate_crs
from groth_sahai_tpu.models.statement import PPE, MSMEG1, MSMEG2, QuadEqu, EquType
from groth_sahai_tpu.utils.rng import GsRng
from groth_sahai_tpu.utils import serde as S

from . import oracle as O
from .test_gs_e2e import o_g1, o_g2, dev_g1, dev_g2, dev_fr
from .test_protocol_api import fr_mat

# ---------------------------------------------------------------------------
# Extended serde: equations, commits, CRS reader, CProof
# ---------------------------------------------------------------------------

def test_equation_serde_roundtrip():
    rng = random.Random(5)
    g1o, g2o = O.G1_GEN, O.G2_GEN
    e = O.pairing(g1o, g2o)
    from .test_tower import fq12_vals

    ppe = PPE(a_consts=dev_g1([O.g1_mul(g1o, 17)]),
              b_consts=dev_g2([None, O.g2_mul(g2o, 23)]),
              gamma=fr_mat([[5], [0]]),
              target=FQ12.from_ints([fq12_vals(e)])[:, :, 0])
    m1 = MSMEG1(a_consts=dev_g1([O.g1_mul(g1o, 29)]),
                b_consts=dev_fr([0, 31]),
                gamma=fr_mat([[5], [0]]),
                target=tuple(l[..., 0] for l in dev_g1([O.g1_mul(g1o, 7)])))
    m2 = MSMEG2(a_consts=dev_fr([37]),
                b_consts=dev_g2([None, O.g2_mul(g2o, 41)]),
                gamma=fr_mat([[5], [0]]),
                target=tuple(l[..., 0] for l in dev_g2([O.g2_mul(g2o, 9)])))
    qd = QuadEqu(a_consts=dev_fr([43]), b_consts=dev_fr([0, 47]),
                 gamma=fr_mat([[5], [0]]), target=dev_fr([11])[:, 0])

    for equ in (ppe, m1, m2, qd):
        b = S.equ_to_bytes(equ)
        got, off = S.equ_from_bytes(b)
        assert off == len(b)
        assert got.equ_type == equ.equ_type
        assert S.equ_to_bytes(got) == b
        # untagged form = tagged minus the 1-byte EquType header
        assert S.equ_to_bytes(equ, tagged=False) == b[1:]


def test_commit_and_cproof_serde_roundtrip():
    rng = GsRng(99)
    crs = generate_crs(GsRng(2024))
    xs = dev_g1([O.g1_mul(O.G1_GEN, 2), O.g1_mul(O.G1_GEN, 3)])
    ys = dev_g2([O.g2_mul(O.G2_GEN, 4), O.g2_mul(O.G2_GEN, 5)])
    xc = batch_commit_G1(xs, crs, rng)
    yc = batch_commit_G2(ys, crs, rng)

    b1 = S.commit1_to_bytes(xc)
    got1, off = S.commit1_from_bytes(b1)
    assert off == len(b1) and S.commit1_to_bytes(got1) == b1

    b2 = S.commit2_to_bytes(yc)
    got2, off = S.commit2_from_bytes(b2)
    assert off == len(b2) and S.commit2_to_bytes(got2) == b2

    # CProof with a fabricated proof entry (on-curve Com vectors)
    from groth_sahai_tpu.models.prover import EquProof, CProof
    cp = CProof(xcoms=xc, ycoms=yc,
                equ_proofs=[EquProof(pi=yc.coms, theta=xc.coms,
                                     equ_type=EquType.PairingProduct)])
    bb = S.cproof_to_bytes(cp)
    got, off = S.cproof_from_bytes(bb)
    assert off == len(bb) and S.cproof_to_bytes(got) == bb


def test_crs_serde_roundtrip():
    crs = generate_crs(GsRng(2024))
    b = S.crs_to_bytes(crs)
    got, off = S.crs_from_bytes(b)
    assert off == len(b)
    assert S.crs_to_bytes(got) == b
