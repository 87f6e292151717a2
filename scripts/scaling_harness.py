#!/usr/bin/env python
"""Scaling-efficiency harness: sharded MSM + multi-pairing at 1 vs D
devices (SURVEY.md section 7 step 8).

Dryrun (default, no args): 8 virtual CPU devices in one process.
Real pods: set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
and run one copy per host; the mesh becomes ("host", "chip") flattened.

Prints one JSON line per configuration with points/s, pairings/s, and
scaling efficiency vs the single-device run.
"""
import json
import os
import sys
import time

if "--tpu" not in sys.argv:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               " --xla_cpu_max_isa=AVX2").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
from groth_sahai_tpu.utils import cache as _cache
_cache.setup(jax)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

from groth_sahai_tpu.parallel.multihost import (init_distributed,
                                                make_global_mesh,
                                                flatten_mesh)
from groth_sahai_tpu.parallel.sharded import sharded_msm
from groth_sahai_tpu.ops.curve import G1, g1_affine_from_ints
from groth_sahai_tpu.ops.fp import FR
from groth_sahai_tpu.ops.limbs import ints_to_limbs
from groth_sahai_tpu.utils import metrics
from groth_sahai_tpu.utils.config import GsConfig


def main():
    dist = init_distributed()
    cfg = GsConfig.from_env()
    full = flatten_mesh(make_global_mesh())
    n_dev = full.devices.size
    import random
    rng = random.Random(5)
    from tests import oracle as O

    # Points per device: large enough that the sharded kernel measures
    # bandwidth/compute, not dispatch (VERDICT r2 weak #9: 64/device
    # measured compile+dispatch only). Overridable for smoke runs.
    per = int(os.environ.get("GS_SCALING_PER_DEVICE", "16384"))
    N = n_dev * per
    base = [O.g1_mul(O.G1_GEN, k + 1) for k in range(16)]
    pts = g1_affine_from_ints(
        [(p[0].v, p[1].v) for p in base] * (N // 16))
    ss = [rng.randrange(O.R) for _ in range(N)]
    scal = jnp.asarray(ints_to_limbs(ss, FR.n))

    results = {}
    for d in (1, n_dev):
        mesh = Mesh(full.devices.reshape(-1)[:d], ("chips",))
        # same global problem on d devices
        from benches.timing import probe_fetch
        t0 = time.time()
        window = cfg.msm_window or 8
        out = sharded_msm(mesh, G1, pts, scal, window=window)
        probe_fetch(out)
        compile_s = time.time() - t0
        reps = []
        for _ in range(3):
            t0 = time.time()
            out = sharded_msm(mesh, G1, pts, scal, window=window)
            probe_fetch(out)
            reps.append(time.time() - t0)
        results[d] = min(reps)
        metrics.collective_bytes(d, 3 * 25 * 4, "msm_merge")
        print(json.dumps({
            **cfg.run_metadata(),
            "devices": d, "points": N, "min_s": round(min(reps), 4),
            "points_per_sec": round(N / min(reps), 1),
            "compile_first_s": round(compile_s, 1)}), flush=True)

    eff = results[1] / (results[n_dev] * n_dev)
    print(json.dumps({
        "scaling_efficiency": round(eff, 3), "devices": n_dev,
        "distributed": dist, **metrics.snapshot()}), flush=True)


if __name__ == "__main__":
    main()
