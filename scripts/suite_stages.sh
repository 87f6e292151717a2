#!/bin/bash
# Run the remaining criterion-parity suite rows in separate processes,
# appending each completed JSON line to BENCHSUITE_r05.json as it lands
# (a crash or timeout in a later stage never loses earlier rows).
# Stage order = cheapest compile first, the known-risky m=334 prove last.
set -u
cd "$(dirname "$0")/.."
OUT=BENCHSUITE_r05.json

run_stage() {
  local name="$1" only="$2" tmo="$3"
  echo "=== stage $name (timeout ${tmo}s) ===" >&2
  timeout "$tmo" python -u benches/suite.py --only "$only" \
      2>"/tmp/suite_${name}.err" | grep --line-buffered '^{' >> "$OUT"
  echo "=== stage $name rc=$? ===" >&2
}

run_stage A "commit_g2_334,commit_scalar_b1_334,commit_scalar_b2_334" 1200
run_stage B "prove_ppe_2x1,verify_ppe_2x1" 1500
run_stage C "g1_scalar_mul_4096,g1_add_65536,pairing_128,msm_65536" 1500
run_stage D "batch_verify" 1800
run_stage E "prove_ppe_334x334,verify_ppe_334x334" 2400
