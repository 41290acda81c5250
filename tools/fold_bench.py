"""Fold N full bench runs into one committed BENCH_LOCAL record.

Usage:
    python tools/fold_bench.py BENCH_LOCAL_r07.json run1.out run2.out ...

Each run file is bench.py stdout (two JSON lines; the FIRST is the full
payload). The committed record = the full payload of the run with the
lowest total, plus:

  aux_min_over_runs.queries   per-query min across all runs
  aux_min_over_runs.value     sum of those mins (the steady-state total)
  aux_min_over_runs.n_runs    how many runs were folded
  aux_cold_warm_min           per Python-worker query: min cold / min warm
                              across runs (bench.PY_WORKER_QUERIES)

The min-of-runs map is the round-over-round comparison basis; the base
payload keeps one coherent scale/skew/ingest story from a single run.
"""
from __future__ import annotations

import json
import sys


def load_full(path: str) -> dict:
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    raise SystemExit(f"{path}: no JSON line found")


def main() -> None:
    out_path, run_paths = sys.argv[1], sys.argv[2:]
    runs = [load_full(p) for p in run_paths]
    base = min(runs, key=lambda r: r["value"])
    names = set().union(*(r["queries"] for r in runs))
    mins = {
        n: round(min(r["queries"][n] for r in runs if n in r["queries"]), 4)
        for n in sorted(names)
    }
    cw_names = set().union(*(r.get("py_worker_cold_warm", {}) for r in runs))
    cold_warm = {
        n: {
            side: round(
                min(
                    r["py_worker_cold_warm"][n][side]
                    for r in runs
                    if n in r.get("py_worker_cold_warm", {})
                ),
                4,
            )
            for side in ("cold", "warm")
        }
        for n in sorted(cw_names)
    }
    rec = dict(base)
    rec["aux_min_over_runs"] = {
        "n_runs": len(runs),
        "value": round(sum(mins.values()), 4),
        "queries": mins,
    }
    if cold_warm:
        rec["aux_cold_warm_min"] = cold_warm
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(
        f"{out_path}: base total {base['value']}s over {base['n_queries']} "
        f"queries; min-of-{len(runs)} total {rec['aux_min_over_runs']['value']}s"
    )


if __name__ == "__main__":
    main()
