"""Auxiliary subsystems: config, metrics, profiling, chunked-MSM
checkpoint/resume, multihost mesh helpers (SURVEY.md section 5)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from groth_sahai_tpu.utils.config import GsConfig
from groth_sahai_tpu.utils import metrics
from groth_sahai_tpu.utils import profiling
from groth_sahai_tpu.ops.fp import FR, FQ
from groth_sahai_tpu.ops.limbs import ints_to_limbs
from groth_sahai_tpu.ops.curve import G1, g1_affine_from_ints, \
    g1_affine_to_ints
from groth_sahai_tpu.ops import msm_chunked
from groth_sahai_tpu.parallel.multihost import (make_global_mesh,
                                                flatten_mesh,
                                                init_distributed)

from . import oracle as O


def test_config_roundtrip_and_env(monkeypatch):
    cfg = GsConfig(msm_window=8, mesh_shape=(2, 4), mesh_axes=("host", "chip"))
    back = GsConfig.from_json(cfg.to_json())
    assert back == cfg
    monkeypatch.setenv("GS_MSM_WINDOW", "13")
    monkeypatch.setenv("GS_MESH_SHAPE", "1,8")
    over = GsConfig.from_env(cfg)
    assert over.msm_window == 13
    assert over.mesh_shape == (1, 8)
    meta = over.run_metadata()
    assert meta["backend"] == "cpu" and meta["devices"] == 8


def test_metrics_counters_and_spans():
    metrics.reset()
    metrics.count("points", 100)
    with metrics.span("work"):
        pass
    metrics.collective_bytes(8, 300, "msm_merge")
    snap = metrics.snapshot()
    assert snap["count/points"] == 100
    assert snap["count/collective_bytes_msm_merge"] == 2400
    assert "seconds/work" in snap
    json.loads(metrics.emit({"extra": 1}))


def test_profiling_cost_table_and_compile_seconds():
    f = lambda a, b: FR.mul(a, b)
    a = FR.from_ints([3, 5])
    out = profiling.compile_seconds(f, a, a)
    assert out["trace_s"] >= 0 and out["compile_s"] >= 0
    cost = profiling.cost_table(f, a, a)
    assert isinstance(cost, dict)           # may be empty on some backends


def _msm_inputs(n):
    import random
    rng = random.Random(17)
    base = [O.g1_mul(O.G1_GEN, k + 1) for k in range(8)]
    pts = g1_affine_from_ints([(p[0].v, p[1].v) for p in base] * (n // 8))
    ss = [rng.randrange(O.R) for _ in range(n)]
    expk = sum(s * ((i % 8) + 1) for i, s in enumerate(ss)) % O.R
    exp = O.g1_mul(O.G1_GEN, expk)
    return pts, jnp.asarray(ints_to_limbs(ss, FR.n)), (exp[0].v, exp[1].v)


def test_msm_chunked_checkpoint_resume(tmp_path):
    pts, scal, exp = _msm_inputs(32)
    ck = str(tmp_path / "ckpt")
    metrics.reset()
    out = msm_chunked.msm_chunked(G1, pts, scal, window=4, chunk_size=16,
                                  ckpt_dir=ck)
    got = g1_affine_to_ints(jax.jit(G1.to_affine)(
        jax.tree_util.tree_map(lambda l: l[..., None], out)))
    assert got == [exp]
    assert os.path.exists(os.path.join(ck, "manifest.json"))
    assert os.path.exists(os.path.join(ck, "msm_partial_000001.bin"))

    # resume: partials must be loaded, not recomputed
    metrics.reset()
    out2 = msm_chunked.msm_chunked(G1, pts, scal, window=4, chunk_size=16,
                                   ckpt_dir=ck)
    snap = metrics.snapshot()
    assert snap.get("count/msm_chunks_resumed", 0) == 2
    got2 = g1_affine_to_ints(jax.jit(G1.to_affine)(
        jax.tree_util.tree_map(lambda l: l[..., None], out2)))
    assert got2 == [exp]


def test_multihost_mesh_shapes():
    assert init_distributed() is False      # single process: no-op
    mesh = make_global_mesh()
    assert mesh.axis_names == ("host", "chip")
    assert mesh.devices.shape == (1, 8)
    flat = flatten_mesh(mesh)
    assert flat.axis_names == ("chips",)
    assert flat.devices.shape == (8,)
