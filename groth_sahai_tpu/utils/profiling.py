"""Tracing / profiling helpers (SURVEY.md section 5 plan: `jax.profiler`
traces + per-kernel cost tables; the reference has neither).

`trace(dir)` wraps `jax.profiler.trace` for TensorBoard-readable device
traces. `cost_table(fn, *args)` compiles `fn` and returns XLA's own cost
analysis (flops, bytes accessed, peak memory) -- the per-kernel cost table
without running anything. `compile_seconds` measures trace+compile wall
time, the metric VERDICT round 1 asked to track as first-class.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax


@contextmanager
def trace(log_dir: str):
    with jax.profiler.trace(log_dir):
        yield


def cost_table(fn, *args, static_argnums=()) -> dict:
    """XLA cost analysis of jit(fn)(*args): flops / bytes / memory."""
    jitted = jax.jit(fn, static_argnums=static_argnums)
    compiled = jitted.lower(*args).compile()
    try:
        cost = compiled.cost_analysis()
    except Exception:
        cost = None
    if isinstance(cost, list):          # one dict per device program
        cost = cost[0] if cost else None
    out = {}
    if cost:
        for key in ("flops", "bytes accessed", "optimal_seconds"):
            if key in cost:
                out[key.replace(" ", "_")] = float(cost[key])
    try:
        mem = compiled.memory_analysis()
        out["temp_bytes"] = int(getattr(mem, "temp_size_in_bytes", 0))
        out["argument_bytes"] = int(getattr(mem, "argument_size_in_bytes", 0))
    except Exception:
        pass
    return out


def compile_seconds(fn, *args, static_argnums=()) -> dict:
    """Wall-clock trace and compile seconds for jit(fn)(*args)."""
    jitted = jax.jit(fn, static_argnums=static_argnums)
    t0 = time.perf_counter()
    lowered = jitted.lower(*args)
    t1 = time.perf_counter()
    lowered.compile()
    t2 = time.perf_counter()
    return {"trace_s": round(t1 - t0, 3), "compile_s": round(t2 - t1, 3)}
