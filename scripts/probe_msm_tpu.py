#!/usr/bin/env python
"""Honest full-MSM probe on the real chip: N=65536, w in {8, 13}."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
try:
    jax.config.update("jax_compilation_cache_compression_algorithm", "zlib")
except AttributeError:
    pass

print("backend:", jax.default_backend(), flush=True)

from groth_sahai_tpu.ops.fp import FR, FQ
from groth_sahai_tpu.ops.limbs import ints_to_limbs
from groth_sahai_tpu.ops.curve import G1, g1_affine_from_ints
from groth_sahai_tpu.ops import msm as msm_mod

N = int(os.environ.get("N", 65536))
WS = [int(w) for w in (sys.argv[1:] or [8])]

# build N points as small multiples of the generator on device (cheap):
# P_i = (i % 64 + 1) * G, computed by one windowed scalar-mul batch
import random
rng = random.Random(7)
from tests import oracle as O
base = [O.g1_mul(O.G1_GEN, k + 1) for k in range(64)]
reps = N // 64
pts = g1_affine_from_ints([(p[0].v, p[1].v) for p in base] * reps)
ss = [rng.randrange(O.R) for _ in range(N)]
scal = jnp.asarray(ints_to_limbs(ss, FR.n))

# oracle checksum: sum_i s_i * (k_i) mod r, one g1_mul
tot = 0
for i, s in enumerate(ss):
    tot = (tot + s * ((i % 64) + 1)) % O.R
exp = O.g1_mul(O.G1_GEN, tot)

for w in WS:
    width = int(os.environ.get("WIDTH", 4096))
    f = jax.jit(lambda p, s: msm_mod.msm(G1, p, s, window=w, width=width))
    t0 = time.time()
    out = f(pts, scal)
    aff = jax.jit(G1.to_affine)(jax.tree_util.tree_map(
        lambda l: l[..., None], out))
    x0 = FQ.to_ints(aff[0])[0]
    tc = time.time() - t0
    ok = (x0 == exp[0].v)
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = f(pts, scal)
        aff = jax.jit(G1.to_affine)(jax.tree_util.tree_map(
            lambda l: l[..., None], out))
        np.asarray(aff[0])
        ts.append(time.time() - t0)
    print(f"w={w} width={width}: compile+first={tc:.1f}s "
          f"min={min(ts)*1e3:.1f}ms -> {N/min(ts)/1e3:.0f}k pts/s "
          f"checksum_ok={ok}", flush=True)
