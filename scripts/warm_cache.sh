#!/usr/bin/env bash
# Warm the persistent XLA compilation cache one test file per process.
#
# Rationale: this container's XLA:CPU backend can segfault inside
# backend_compile_and_load after many large compiles in one long-lived
# process (see pytest.ini).  Compiling each test file in a fresh, short-
# lived process bounds the per-process count; a file whose process
# crashes mid-compile is simply retried -- every completed compile was
# already written to .jax_cache, so retries converge.  Once the cache is
# warm, `python -m pytest tests/ -q` runs load-only and green.
set -u
cd "$(dirname "$0")/.."
fails=0
for f in tests/test_*.py; do
  ok=""
  for attempt in 1 2 3; do
    echo "== warming $f (attempt $attempt)"
    if timeout 2400 python -m pytest "$f" -q -n 0 -x; then
      ok=1; break
    fi
  done
  [ -z "$ok" ] && { echo "!! $f still failing"; fails=$((fails+1)); }
done
echo "warming done; persistent failures: $fails"
echo "now run: python -m pytest tests/ -q"
exit $fails
