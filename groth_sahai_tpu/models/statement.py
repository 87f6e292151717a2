"""Groth-Sahai statements: the four bilinear equation types.

TPU-native analogue of /root/reference/src/statement.rs:43-192. An equation
has the abstract form (A * Y)(X * B)(X * Gamma Y) = t; the four types fix
which sides live in G1/G2/Fr:

  PPE     (G1, G2, GT)   pairing-product equation          statement.rs:118-131
  MSMEG1  (G1, Fr, G1)   multi-scalar-mult equation in G1  statement.rs:139-152
  MSMEG2  (Fr, G2, G2)   multi-scalar-mult equation in G2  statement.rs:160-172
  QuadEqu (Fr, Fr, Fr)   quadratic equation in Fr          statement.rs:180-192

Representation (structure-of-arrays):
  * group constants are affine point batches ((n,) or (m,));
  * scalar constants / gamma are standard-form Fr limb arrays
    (uint32[17, n] / uint32[17, m, n]);
  * targets: Fq12 coeff array () for PPE, affine point for MSME, Fr for Quad.

The four reference provers/verifiers (prove.rs:71-489, verifier.rs:23-157)
share one generic kernel here, parameterised by which sides are scalar --
see models/prover.py / models/verifier.py.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Any


class EquType(enum.IntEnum):
    """Wire-compatible tags (1-byte canonical serde, statement.rs:61-97)."""
    PairingProduct = 0
    MultiScalarG1 = 1
    MultiScalarG2 = 2
    Quadratic = 3


@dataclass
class PPE:
    a_consts: Any        # G1 affine batch (n,)
    b_consts: Any        # G2 affine batch (m,)
    gamma: Any           # uint32[17, m, n] std-form Fr
    target: Any          # Fq12 coeff array (nl, 12)

    equ_type = EquType.PairingProduct
    x_is_scalar = False
    y_is_scalar = False


@dataclass
class MSMEG1:
    a_consts: Any        # G1 affine batch (n',)
    b_consts: Any        # uint32[17, m] std-form Fr
    gamma: Any           # uint32[17, m, n']
    target: Any          # G1 affine ()

    equ_type = EquType.MultiScalarG1
    x_is_scalar = False
    y_is_scalar = True


@dataclass
class MSMEG2:
    a_consts: Any        # uint32[17, n] std-form Fr
    b_consts: Any        # G2 affine batch (m',)
    gamma: Any           # uint32[17, m', n]
    target: Any          # G2 affine ()

    equ_type = EquType.MultiScalarG2
    x_is_scalar = True
    y_is_scalar = False


@dataclass
class QuadEqu:
    a_consts: Any        # uint32[17, n']
    b_consts: Any        # uint32[17, m']
    gamma: Any           # uint32[17, m', n']
    target: Any          # uint32[17] std-form Fr

    equ_type = EquType.Quadratic
    x_is_scalar = True
    y_is_scalar = True
