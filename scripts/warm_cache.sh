#!/usr/bin/env bash
# Warm the persistent XLA compilation cache one test file per process.
#
# Rationale: this container's XLA CPU backend can segfault when a process
# that has already compiled many large executables writes yet another entry
# to the persistent compilation cache (observed in
# jax/_src/compilation_cache.py put_executable_and_time). Compiling each
# test file in a fresh process sidesteps the accumulation; once the cache
# is warm, `python -m pytest tests/ -x -q` runs write-free and green.
set -u
cd "$(dirname "$0")/.."
for f in tests/test_*.py; do
  echo "== warming $f"
  timeout 2400 python -m pytest "$f" -x -q || exit 1
done
echo "cache warm; run: python -m pytest tests/ -x -q"
