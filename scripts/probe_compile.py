#!/usr/bin/env python
"""Probe: compile-time scaling vs number of chained mont_muls; pallas vs XLA."""
import os, sys, time

os.chdir(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), "GS_PALLAS:", os.environ.get("GS_PALLAS"),
      flush=True)

from groth_sahai_tpu.ops.fp import FQ

a = FQ.to_mont(jnp.asarray(
    np.random.randint(0, 1 << 10, (25, 8192), dtype=np.uint32)))
jax.block_until_ready(a)

for n in [1, 2, 4, 8]:
    def chain(x, n=n):
        y = x
        for _ in range(n):
            y = FQ.mul(y, x)
        return y
    f = jax.jit(chain)
    t0 = time.time()
    out = np.asarray(f(a))
    t1 = time.time() - t0
    t0 = time.time()
    out = np.asarray(f(a))
    t2 = time.time() - t0
    print(f"chain{n}: first={t1:.2f}s warm={t2:.4f}s", flush=True)
