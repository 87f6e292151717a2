"""Hiding-key CRS end-to-end (generator.rs:63-77 dead code made live).

In its own file so its large prove/verify graphs get a dedicated pytest
worker process (--dist loadfile): this container's jaxlib CPU AOT loader
corrupts memory once one process accumulates too many large compiled
executables (see pytest.ini), and this test previously shared a process
with the whole commit-laws suite.
"""

from groth_sahai_tpu.utils.rng import GsRng
from groth_sahai_tpu.models.crs import generate_crs
from groth_sahai_tpu.models.statement import PPE
from groth_sahai_tpu.models.prover import commit_and_prove
from groth_sahai_tpu.models.verifier import verify

from . import oracle as O
from .test_gs_e2e import (dev_g1, dev_g2, dev_fr, dev_gt,
                          aff_to_oracle_g1, aff_to_oracle_g2)
from groth_sahai_tpu.ops.fp import FR


def _small_ppe(crs, g1o, g2o):
    xo = [O.g1_mul(g1o, 2), O.g1_mul(g1o, 3)]
    yo = [O.g2_mul(g2o, 4)]
    ao = [O.g1_mul(g1o, 17)]
    bo = [None, O.g2_mul(g2o, 23)]
    t = (O.pairing(xo[1], bo[1]) * O.pairing(ao[0], yo[0])
         * O.pairing(xo[0], O.g2_mul(yo[0], 5)))
    equ = PPE(a_consts=dev_g1(ao), b_consts=dev_g2(bo),
              gamma=dev_fr([5, 0]).reshape(FR.n, 2, 1), target=dev_gt(t))
    return equ, dev_g1(xo), dev_g2(yo)


def test_hiding_crs_e2e():
    """Hiding-key CRS still proves and verifies a satisfied PPE."""
    rng = GsRng(6021)
    crs = generate_crs(rng, hiding=True)
    g1o = aff_to_oracle_g1(crs.g1_gen)
    g2o = aff_to_oracle_g2(crs.g2_gen)
    equ, xv, yv = _small_ppe(crs, g1o, g2o)
    proof = commit_and_prove(equ, xv, yv, crs, rng)
    assert verify(equ, proof, crs)

    bad = PPE(equ.a_consts, equ.b_consts, equ.gamma,
              dev_gt(O.pairing(g1o, g2o)))
    assert not verify(bad, proof, crs)
