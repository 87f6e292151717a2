"""Honest micro-timings of the hot primitives on the real chip.

Per-rep host sync (np.asarray of a small slice); fresh-ish inputs not
needed for these pure-compute probes since we fetch outputs every rep.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from groth_sahai_tpu.ops.fp import FQ, FR
from groth_sahai_tpu.ops.curve import G1, g1_affine_from_ints
from groth_sahai_tpu.ops import bls12_381 as C
from groth_sahai_tpu.ops import pairing as pr
from groth_sahai_tpu.ops.curve import g2_affine_from_ints

def timeit(name, fn, *args, reps=3, work=None):
    t0 = time.time()
    out = fn(*args)
    host = [np.asarray(l) for l in jax.tree_util.tree_leaves(out)]
    first = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        host = [np.asarray(l) for l in jax.tree_util.tree_leaves(out)]
        ts.append(time.time() - t0)
    best = min(ts)
    rate = (work / best) if work else 0.0
    print(f"{name}: first={first:.2f}s best={best*1e3:.2f}ms"
          + (f" rate={rate:.3g}/s" if work else ""), flush=True)
    return best

B = 65536
rng = np.random.default_rng(0)
a = jnp.asarray(rng.integers(0, 1 << 16, size=(25, B), dtype=np.uint32))
b = jnp.asarray(rng.integers(0, 1 << 16, size=(25, B), dtype=np.uint32))

mm = jax.jit(lambda a, b: FQ._mont_mul(a, b))
timeit(f"mont_mul FQ B={B}", mm, a, b, work=B)

B2 = 4096
a2, b2 = a[:, :B2], b[:, :B2]
mm2 = jax.jit(lambda a, b: FQ._mont_mul(a, b))
timeit(f"mont_mul FQ B={B2}", mm2, a2, b2, work=B2)

# chain of 64 muls (amortize dispatch) at B=4096
def chain(a, b):
    for _ in range(64):
        a = FQ._mont_mul(a, b)
    return a
ch = jax.jit(chain)
timeit(f"mont_mul chain64 B={B2}", ch, a2, b2, work=64 * B2)

# G1 jacobian add, batch 4096
pts = g1_affine_from_ints([(C.G1_GEN_X, C.G1_GEN_Y)] * B2)
jac = jax.jit(G1.from_affine)(pts)
add = jax.jit(G1.add)
timeit(f"G1.add B={B2}", add, jac, jac, work=B2)

addm = jax.jit(G1.add_mixed)
timeit(f"G1.add_mixed B={B2}", addm, jac, pts, work=B2)

# pairing batch 8
bt = 8
P = g1_affine_from_ints([(C.G1_GEN_X, C.G1_GEN_Y)] * bt)
Q = g2_affine_from_ints([(C.G2_GEN_X, C.G2_GEN_Y)] * bt)
pj = jax.jit(pr.pairing)
timeit(f"pairing B={bt}", pj, P, Q, work=bt)
