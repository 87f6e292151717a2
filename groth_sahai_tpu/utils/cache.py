"""Persistent-compilation-cache helpers.

One place for the cache policy every entry point (bench.py, the driver
entry points, tests/conftest.py) shares:

  * cache lives in <repo>/.jax_cache (gitignored, survives across runs in
    one checkout);
  * warm-start entries committed under <repo>/.jax_cache_seed are
    hardlinked (or copied) into the live cache before first use, so a
    FRESH checkout skips the multi-minute Mosaic/XLA cold compiles of the
    driver's exact bench/dryrun graphs.  Mismatched keys are harmless
    (plain cache misses).
"""

from __future__ import annotations

import os
import pathlib


def repo_root() -> pathlib.Path:
    return pathlib.Path(__file__).resolve().parent.parent.parent


def setup(jax_module=None) -> None:
    """Point jax at the repo cache, seeding it from .jax_cache_seed.

    GS_CACHE_DIR overrides the live cache location (used e.g. to measure a
    true cold start without disturbing the working cache)."""
    import jax as _jax
    jax = jax_module or _jax
    root = repo_root()
    cache = pathlib.Path(os.environ.get("GS_CACHE_DIR") or
                         (root / ".jax_cache"))
    try:
        cache.mkdir(exist_ok=True)
    except OSError:
        return
    seed = root / ".jax_cache_seed"
    if seed.is_dir():
        for f in seed.iterdir():
            dst = cache / f.name
            if not dst.exists():
                try:
                    os.link(f, dst)
                except OSError:
                    import shutil
                    try:
                        shutil.copy2(f, dst)
                    except OSError:
                        pass
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    # Force zlib compression. jax 0.9 has no config knob (the old
    # jax_compilation_cache_compression_algorithm update raised and was
    # silently swallowed here -- every entry was still zstd); it uses the
    # zstandard package whenever importable.  This container's zstandard
    # native decompressor corrupts memory on large executables -- the
    # test-suite worker segfaults bisect to get_executable_and_time ->
    # ZstdDecompressor on multi-100MB entries -- so null the module refs
    # and let compress/decompress_executable fall through to zlib.
    # Legacy zstd entries read as cache misses (recompiled once, then
    # rewritten as zlib); scripts/recompress_cache.py converts in place.
    try:
        from jax._src import compilation_cache as _cc
        _cc.zstandard = None
        if getattr(_cc, "zstd", None) is not None:
            _cc.zstd = None
    except Exception:
        pass
