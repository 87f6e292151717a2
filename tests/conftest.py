"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md section 4).

The container's sitecustomize force-registers the `axon` (tunneled TPU)
platform and overrides JAX_PLATFORMS, so we must override back via
jax.config.update after import. XLA_FLAGS must be set before backend init.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# Cap the CPU ISA so persistent-cache AOT entries reload cleanly (the
# container's cpuid advertises features the AOT loader then rejects).
if "xla_cpu_max_isa" not in flags:
    flags += " --xla_cpu_max_isa=AVX2"
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache, seeded from the committed warm-start
# entries in .jax_cache_seed/ (see groth_sahai_tpu/utils/cache.py): big
# traces compile once across test runs and fresh checkouts.
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from groth_sahai_tpu.utils import cache as _cache
_cache.setup(jax)

# The container's XLA:CPU executable loader segfaults intermittently in
# backend.deserialize_executable on large persistent-cache entries (the
# same crashy native path pytest.ini describes for compiles).  A segfault
# cannot be caught in-process: the xdist worker dies and the in-flight
# test would be reported as a hard failure.  Retry each crashed test once
# on a replacement worker (requires a scheduler with mark_test_pending,
# i.e. --dist worksteal/load -- see pytest.ini).
_crash_retried = set()


def pytest_handlecrashitem(crashitem, report, sched):
    if crashitem not in _crash_retried and hasattr(sched, "mark_test_pending"):
        _crash_retried.add(crashitem)
        try:
            sched.mark_test_pending(crashitem)
        except NotImplementedError:
            return  # loadscope/loadfile: keep the failure report
        report.outcome = "rerun"  # not failed: the retest decides
