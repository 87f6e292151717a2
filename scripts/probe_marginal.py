#!/usr/bin/env python
"""Marginal cost per mont_mul via lax.scan (body compiled once)."""
import os, sys, time

os.chdir(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

print("backend:", jax.default_backend(), "GS_PALLAS:", os.environ.get("GS_PALLAS"),
      flush=True)

from groth_sahai_tpu.ops.fp import FQ

BATCH = int(os.environ.get("PROBE_BATCH", "8192"))
a = FQ.to_mont(jnp.asarray(
    np.random.randint(0, 1 << 10, (25, BATCH), dtype=np.uint32)))
jax.block_until_ready(a)

results = {}
for n in [64, 256]:
    @jax.jit
    def chain(x, n=n):
        def body(y, _):
            return FQ.mul(y, x), None
        y, _ = lax.scan(body, x, None, length=n)
        return y
    t0 = time.time()
    out = np.asarray(chain(a))
    t1 = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = np.asarray(chain(a))
        ts.append(time.time() - t0)
    results[n] = min(ts)
    print(f"scan{n}: first={t1:.2f}s warm={min(ts):.4f}s", flush=True)

marg = (results[256] - results[64]) / (256 - 64)
print(f"marginal per mont_mul (batch {BATCH}): {marg * 1e6:.1f} us "
      f"-> {BATCH / marg / 1e6:.1f} M muls/s", flush=True)
