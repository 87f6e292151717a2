"""Ahead-of-time exported graphs for the driver-facing entry points.

The persistent compilation cache (utils/cache.py) removes the XLA/Mosaic
COMPILE cost of a cold process, but not the TRACE + jaxpr->MLIR cost: the
round-4 probe measured ~1.4M traced primitives and ~340 s of trace time
for ONE bench setup graph before any compiler ran.  `jax.export` fixes
the remaining gap: the serialized StableHLO of each driver bench graph is
committed under `artifacts/`, and `bench.py` DESERIALIZES instead of
tracing -- first call drops to cache-load + execute.

Artifacts are regenerated with scripts/export_artifacts.py (run on the
target backend after any kernel-affecting change; the bench conformance
gates catch stale-but-loadable artifacts because results are checked
against the host oracle every run).
"""

from __future__ import annotations

import os
import pathlib


def artifact_dir() -> pathlib.Path:
    return pathlib.Path(__file__).resolve().parent.parent.parent / "artifacts"


def _path(name: str) -> pathlib.Path:
    return artifact_dir() / f"{name}.jaxexp"


def load(name: str):
    """Deserialized exported call for `name`, or None (missing/disabled).

    The returned callable has jit-call semantics for the exact shapes,
    dtypes and platform it was exported for.
    """
    if os.environ.get("GS_NO_EXPORT"):
        return None
    p = _path(name)
    if not p.exists():
        return None
    try:
        from jax import export as jex
        blob = p.read_bytes()
        if blob[:2] == b"\x1f\x8b":              # gzip-compressed artifact
            import gzip
            blob = gzip.decompress(blob)
        exp = jex.deserialize(blob)
        return exp.call
    except Exception as e:                       # stale/incompatible blob
        import sys
        print(f"[aot] failed to load {name}: {e}", file=sys.stderr)
        return None


def save(name: str, jit_fn, example_args) -> int:
    """Export jit_fn at example_args' shapes; returns the blob size."""
    import jax
    from jax import export as jex
    disabled = [
        jex.DisabledSafetyCheck.custom_call("tpu_custom_call"),
        jex.DisabledSafetyCheck.custom_call("Sharding"),
    ]
    exp = jex.export(jit_fn, disabled_checks=disabled)(*example_args)
    import gzip
    blob = gzip.compress(exp.serialize(), 6)
    artifact_dir().mkdir(exist_ok=True)
    _path(name).write_bytes(blob)
    return len(blob)
