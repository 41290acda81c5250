"""Per-query 2x-gate check: candidate bench record vs recorded history.

Usage:
    python tools/bench_compare.py BENCH_LOCAL_r07.json BENCH_LOCAL_r0*.json

First arg = the candidate record; remaining args = history records. Each
query's BASELINE is the minimum recorded time across the history records
(per-query mins preferred: aux_min_over_runs.queries, then
aux_min_over_3_runs.queries, then the plain queries map). A query fails
the gate when candidate > GATE x baseline (default 2.0,
$SPARK_GRAFT_BENCH_GATE overrides). Sub-100ms baselines are noise-floored
to 0.1 s before the ratio (a 0.04 s -> 0.12 s move is scheduler jitter,
not a regression). Python-worker queries already record WARM figures in
the queries map (bench.PY_WORKER_QUERIES), so worker-pool spawn
bimodality cannot trip the gate.

Exit code 1 if any query fails; prints the over-gate list (or the top
movers when all pass).
"""
from __future__ import annotations

import json
import os
import sys

GATE = float(os.environ.get("SPARK_GRAFT_BENCH_GATE", "2.0"))
FLOOR = 0.1  # seconds: noise floor for tiny baselines


def query_mins(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    for key in ("aux_min_over_runs", "aux_min_over_3_runs"):
        aux = d.get(key)
        if isinstance(aux, dict) and isinstance(aux.get("queries"), dict):
            return dict(aux["queries"])
    return dict(d["queries"])


def main() -> None:
    if len(sys.argv) < 2:
        print(
            "usage: bench_compare.py CANDIDATE.json [HISTORY.json ...]",
            file=sys.stderr,
        )
        sys.exit(2)
    cand_path, hist_paths = sys.argv[1], sys.argv[2:]
    cand = query_mins(cand_path)
    baseline: dict[str, float] = {}
    for p in hist_paths:
        for name, sec in query_mins(p).items():
            if name not in baseline or sec < baseline[name]:
                baseline[name] = sec
    rows = []
    for name, sec in sorted(cand.items()):
        if name not in baseline:
            continue  # new query this round: no baseline yet
        base = max(baseline[name], FLOOR)
        rows.append((round(sec / base, 2), name, sec, baseline[name]))
    rows.sort(reverse=True)
    over = [r for r in rows if r[0] > GATE]
    shared = [name for _, name, _, _ in rows]
    tot_c = round(sum(cand[n] for n in shared), 2)
    tot_b = round(sum(baseline[n] for n in shared), 2)
    if not tot_b:
        # No history records / no shared queries (the first round a
        # record exists): nothing to gate against.
        print(f"0 shared queries vs {len(hist_paths)} history records; "
              "gate vacuously PASS")
        return
    print(
        f"{len(rows)} shared queries: candidate {tot_c}s vs best-recorded "
        f"{tot_b}s ({round(tot_c / tot_b, 2)}x aggregate); gate {GATE}x"
    )
    for ratio, name, sec, base in (over or rows[:8]):
        flag = "OVER" if ratio > GATE else "  ok"
        print(f"  {flag} {ratio:6.2f}x {name:40s} {sec:8.3f}s vs {base:.3f}s")
    if over:
        print(f"FAIL: {len(over)} queries over the {GATE}x gate")
        sys.exit(1)
    print("PASS: zero queries over the gate")


if __name__ == "__main__":
    main()
