"""Deterministic, seedable randomness for CRS generation and proving.

Replaces `ark_std::test_rng` / `UniformRand` draws in the reference
(generator.rs:86-93, commit.rs:64, prove.rs:123-126). Counter-based Philox
on the host: identical seeds give identical streams across runs, machines
and process counts -- the determinism story SURVEY.md section 4 calls for
(the reference's twin-RNG test idiom maps to re-creating a GsRng with the
same seed).

All draws are uniform in Fr via 512-bit reduction (bias < 2^-257).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.fp import FR
from ..ops.limbs import ints_to_limbs


class GsRng:
    """Deterministic Fr sampler; draw order is part of the wire contract."""

    def __init__(self, seed: int = 0):
        self._gen = np.random.Generator(np.random.Philox(seed))

    def fr_ints(self, n: int):
        return [int.from_bytes(self._gen.bytes(64), "little") % FR.p
                for _ in range(n)]

    def fr_std(self, shape):
        """Standard-form (non-Montgomery) Fr limbs uint32[17, *shape]."""
        shape = tuple(shape) if not isinstance(shape, int) else (shape,)
        total = int(np.prod(shape)) if shape else 1
        arr = ints_to_limbs(self.fr_ints(total), FR.n)
        return jnp.asarray(arr).reshape((FR.n,) + shape)

    def fr_mont(self, shape):
        return FR.to_mont(self.fr_std(shape))
