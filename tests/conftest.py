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

# Persistent compilation cache: big traces compile once across test runs.
import tempfile, pathlib
_cache = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"
_cache.mkdir(exist_ok=True)

# Seed the cache from the committed warm-start entries (.jax_cache_seed/):
# CPU executables for this suite's heaviest graphs, compiled on this exact
# container image. Hardlink (fall back to copy) anything not already
# present -- turns a cold first run from ~40 min of XLA compiles on this
# 2-core box into minutes. Harmless if keys don't match (cache misses).
_seed = pathlib.Path(__file__).resolve().parent.parent / ".jax_cache_seed"
if _seed.is_dir():
    import os as _os
    for _f in _seed.iterdir():
        _dst = _cache / _f.name
        if not _dst.exists():
            try:
                _os.link(_f, _dst)
            except OSError:
                import shutil as _sh
                _sh.copy2(_f, _dst)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# The default zstandard compressor segfaults writing some large executables
# (observed in compilation_cache.put_executable_and_time); zlib is stable.
try:
    jax.config.update("jax_compilation_cache_compression_algorithm", "zlib")
except Exception:
    pass
