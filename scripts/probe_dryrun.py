#!/usr/bin/env python
"""Bisect dryrun_multichip compile cost on a virtual 8-device CPU mesh."""
import os, sys, time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8").strip()
os.chdir(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ".")

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")
print("devices:", len(jax.devices()), flush=True)

from groth_sahai_tpu.parallel.mesh import make_mesh
from groth_sahai_tpu.parallel.sharded import sharded_msm, sharded_multi_pairing
from groth_sahai_tpu.ops.curve import G1, g1_affine_from_ints, g2_affine_from_ints
from groth_sahai_tpu.ops import bls12_381 as C
from groth_sahai_tpu.ops import msm as msm_mod
from groth_sahai_tpu.ops import pairing as pr
from groth_sahai_tpu.utils.rng import GsRng

mesh = make_mesh(8)
rng = GsRng(99)
n = 32
P = g1_affine_from_ints([(C.G1_GEN_X, C.G1_GEN_Y)] * n)
Q = g2_affine_from_ints([(C.G2_GEN_X, C.G2_GEN_Y)] * n)
scal = rng.fr_std((n,))

which = sys.argv[1:] or ["msm4", "msm8", "pair"]

if "msm4" in which:
    t0 = time.time()
    out = sharded_msm(mesh, G1, P, scal, window=4, lanes=2)
    jax.block_until_ready(out)
    print(f"sharded_msm w=4: {time.time()-t0:.1f}s", flush=True)

if "msm8" in which:
    t0 = time.time()
    out = sharded_msm(mesh, G1, P, scal, window=8, lanes=2)
    jax.block_until_ready(out)
    print(f"sharded_msm w=8: {time.time()-t0:.1f}s", flush=True)

if "miller" in which:
    t0 = time.time()
    f = jax.jit(lambda p, q: pr.multi_miller(p, q, axis=0))
    out = jax.block_until_ready(f(P, Q))
    print(f"multi_miller (unsharded): {time.time()-t0:.1f}s", flush=True)

if "fexp" in which:
    import jax.numpy as jnp
    from groth_sahai_tpu.ops.tower import FQ12
    f12 = FQ12.one(())
    t0 = time.time()
    out = jax.block_until_ready(jax.jit(pr.final_exp)(f12))
    print(f"final_exp: {time.time()-t0:.1f}s", flush=True)

if "pair" in which:
    t0 = time.time()
    out = sharded_multi_pairing(mesh, P, Q)
    jax.block_until_ready(out)
    print(f"sharded_multi_pairing: {time.time()-t0:.1f}s", flush=True)
