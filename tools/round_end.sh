#!/bin/sh
# Round-end artifact refresh — run on an IDLE host (~50 min with RUNS=3):
#
#     sh tools/round_end.sh <round-number> [bench-runs]
#
# Produces, at HEAD: STALENESS_r{N}.json (driver-row freshness audit),
# VERIFY_LOCAL_r{N}.txt (fresh-process 157-query oracle record),
# PLANS.md (physical-plan census), BENCH_LOCAL_r{N}.json (folded
# idle-host bench record), and runs the 2x per-query gate against every
# prior record. Commit the artifacts after reviewing the gate output.
set -e
cd "$(dirname "$0")/.."
R=${1:?usage: round_end.sh <round-number> [bench-runs]}
RUNS=${2:-3}
RR=$(printf 'r%02d' "$R")

echo "== staleness audit"
python tools/staleness.py --round "$R"

echo "== fresh-process verify record"
python tools/driver_sim.py > "VERIFY_LOCAL_${RR}.txt" 2>&1
tail -1 "VERIFY_LOCAL_${RR}.txt"
grep -q " 0 mismatches" "VERIFY_LOCAL_${RR}.txt"

echo "== plan census"
python tools/plan_audit.py > PLANS.md

echo "== bench x${RUNS} (serial, idle host)"
i=1
files=""
while [ "$i" -le "$RUNS" ]; do
    python bench.py > "/tmp/bench_${RR}_run$i.out" 2>/dev/null
    files="$files /tmp/bench_${RR}_run$i.out"
    i=$((i + 1))
done
# shellcheck disable=SC2086
python tools/fold_bench.py "BENCH_LOCAL_${RR}.json" $files

echo "== 2x gate vs prior records"
# `|| true`: when the only BENCH_LOCAL file is the current round's,
# grep -v exits 1 and set -e would abort; bench_compare handles an
# empty history (vacuous PASS).
hist=$(ls BENCH_LOCAL_r*.json | grep -v "${RR}" || true)
# shellcheck disable=SC2086
python tools/bench_compare.py "BENCH_LOCAL_${RR}.json" $hist
