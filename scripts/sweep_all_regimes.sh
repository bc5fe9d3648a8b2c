#!/bin/bash
# End-of-round full regime certification: rebuild every regime dir (the
# builders purge derived state keyed to rebuilt paths), then run the
# whole-registry oracle-parity sweep on each variant plus the plain
# sf0.01 / sf0.1 datasets, under the driver session conf. One summary
# line per variant -> $1 (default /tmp/regime_sweep.log).
set -u
OUT="${1:-/tmp/regime_sweep.log}"
: > "$OUT"
cd "$(dirname "$0")/.."

python scripts/build_regimes.py /tmp/regimes >> "$OUT" 2>&1 || echo "BUILD FAIL" >> "$OUT"
SPARK_GRAFT_SCALE_SRC_SMALL=/root/testdata/sf0.01 \
  python scripts/build_regimes.py /tmp/regimes_sf001 >> "$OUT" 2>&1 \
  || echo "BUILD2 FAIL" >> "$OUT"

run() {
  local label="$1" dir="$2"
  local t0=$SECONDS
  local res
  res=$(SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE=32 SPARK_GRAFT_SF_DIR_TEST="$dir" \
        python -m pytest tests/test_oracle_parity.py -q 2>&1 | tail -1)
  echo "$label: $res [$((SECONDS - t0))s]" >> "$OUT"
}

for d in empty extremeval fragmented hive keynull null onerow schemadrift skew textshape tsedge unicode wide; do
  run "$d" "/tmp/regimes/$d"
done
for d in hive fragmented schemadrift; do
  run "$d-sf0.01" "/tmp/regimes_sf001/$d"
done
run "sf0.01" "/root/testdata/sf0.01"
run "sf0.1" "/root/testdata/sf0.1"
echo "SWEEP DONE" >> "$OUT"
