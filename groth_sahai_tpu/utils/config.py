"""Typed configuration, serialized into run metadata.

The reference has no config system (SURVEY.md section 5: its only knobs are
the compile-time curve generic and per-call `is_parallel` bools hardcoded
to true, prove.rs:116). A TPU framework needs explicit, recordable knobs:
mesh shape, kernel windows, scan widths, bench parameters. One dataclass,
JSON in/out, environment overrides with the `GS_` prefix.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass
class GsConfig:
    # mesh / distribution
    mesh_axes: Tuple[str, ...] = ("chips",)
    mesh_shape: Tuple[int, ...] = (1,)
    # MSM kernel (ops/msm.py)
    msm_window: int = 0              # 0 = auto (8 below 16k points, else 13)
    msm_width: int = 0               # 0 = auto (~M/512 in [128, 8192])
    # scalar multiplication (ops/curve.py)
    scalar_window: int = 4
    # Pallas field kernels (ops/pallas_fp.py)
    pallas: str = "auto"             # "1" / "0" / "auto"
    # chunked-MSM checkpointing (ops/msm_chunked.py)
    msm_chunk_size: int = 1 << 16
    checkpoint_dir: Optional[str] = None
    # bench
    bench_reps: int = 5
    bench_platform: Optional[str] = None

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "GsConfig":
        d = json.loads(s)
        d["mesh_axes"] = tuple(d.get("mesh_axes", ("chips",)))
        d["mesh_shape"] = tuple(d.get("mesh_shape", (1,)))
        return cls(**d)

    @classmethod
    def from_env(cls, base: "GsConfig" = None) -> "GsConfig":
        """Overlay GS_* environment variables onto `base` (or defaults)."""
        cfg = base or cls()
        out = dataclasses.asdict(cfg)
        for f in dataclasses.fields(cls):
            env = os.environ.get("GS_" + f.name.upper())
            if env is None:
                continue
            if f.name in ("mesh_axes",):
                out[f.name] = tuple(env.split(","))
            elif f.name in ("mesh_shape",):
                out[f.name] = tuple(int(x) for x in env.split(","))
            elif f.type in ("int", int):
                out[f.name] = int(env)
            else:
                out[f.name] = env
        out["mesh_axes"] = tuple(out["mesh_axes"])
        out["mesh_shape"] = tuple(out["mesh_shape"])
        return cls(**out)

    def run_metadata(self) -> dict:
        """Dict destined for bench JSON lines / checkpoint manifests."""
        import jax
        try:
            backend = jax.default_backend()
            n_dev = jax.device_count()
        except Exception:
            backend, n_dev = "uninitialized", 0
        return {"config": dataclasses.asdict(self),
                "backend": backend, "devices": n_dev}
