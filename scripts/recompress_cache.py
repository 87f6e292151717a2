#!/usr/bin/env python
"""Recompress .jax_cache entries zstd -> zlib in place.

utils/cache.py now forces zlib (the container's zstandard native
decompressor corrupts memory on large executables); legacy zstd entries
would read as misses and recompile.  This converts them offline so the
warm cache stays warm.  Entry filenames are the cache keys and do not
change.  Safe to re-run; skips non-zstd files.

Usage: python scripts/recompress_cache.py [cache_dir]
"""
import sys
import os
import zlib
import glob

ZSTD_MAGIC = bytes.fromhex("28b52ffd")


def main():
    cache = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")
    files = sorted(glob.glob(os.path.join(cache, "*")))
    n_conv = n_skip = n_err = 0
    import zstandard
    for f in files:
        try:
            with open(f, "rb") as fh:
                head = fh.read(4)
            if head != ZSTD_MAGIC:
                n_skip += 1
                continue
            data = open(f, "rb").read()
            raw = zstandard.ZstdDecompressor().decompress(
                data, max_output_size=1 << 33)
            tmp = f + ".zlib.tmp"
            with open(tmp, "wb") as fh:
                fh.write(zlib.compress(raw))
            os.replace(tmp, f)
            n_conv += 1
        except Exception as e:
            n_err += 1
            print(f"ERR {os.path.basename(f)[:40]}: {e}", file=sys.stderr)
    print(f"converted {n_conv}, already-zlib/other {n_skip}, errors {n_err}")


if __name__ == "__main__":
    main()
