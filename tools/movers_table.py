"""Build the OPTIMIZATION_rNN movers table: after-record vs before-record.

Usage:
    python tools/movers_table.py BENCH_LOCAL_r12.json BENCH_LOCAL_r12_opt.json [N]

Compares per-query min folds (aux_min_over_runs.queries, falling back to
the plain queries map), prints headline + fold-sum totals and the top-N
improvements and regressions as a markdown table, plus per-family sums
keyed by the declared-query registry's module of origin.
"""
from __future__ import annotations

import json
import sys


def mins(rec: dict) -> dict:
    aux = rec.get("aux_min_over_runs", {})
    return aux.get("queries") or rec["queries"]


def families() -> dict:
    """query name -> defining module basename, from the registry."""
    try:
        import os

        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from data_ingestion_from_multiple_directories_linux_spark.operators import (  # noqa: E501
            registry,
        )
        import __spark_entry__  # noqa: F401  (imports populate the registry)

        return {
            n: fn.__module__.rsplit(".", 1)[-1]
            for n, fn in registry.QUERIES.items()
        }
    except Exception:
        return {}


def main() -> None:
    before = json.load(open(sys.argv[1]))
    after = json.load(open(sys.argv[2]))
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    b, a = mins(before), mins(after)
    common = sorted(set(b) & set(a))
    print(f"headline: {before['value']:.1f} -> {after['value']:.1f} s")
    print(
        f"fold-sum ({len(common)} common queries): "
        f"{sum(b[q] for q in common):.1f} -> {sum(a[q] for q in common):.1f} s"
    )
    nb = after.get("aux_min_over_runs", {}).get("n_runs")
    if nb:
        print(f"after fold over {nb} runs")
    moves = sorted(common, key=lambda q: a[q] - b[q])
    print("\n| query | before s | after s | delta |")
    print("|---|---|---|---|")
    for q in moves[:n]:
        print(f"| {q} | {b[q]:.2f} | {a[q]:.2f} | {a[q] - b[q]:+.2f} |")
    print("| ... | | | |")
    for q in moves[-n:]:
        print(f"| {q} | {b[q]:.2f} | {a[q]:.2f} | {a[q] - b[q]:+.2f} |")

    fam = families()
    if fam:
        sums: dict = {}
        for q in common:
            f = fam.get(q, "?")
            tb, ta, cnt = sums.get(f, (0.0, 0.0, 0))
            sums[f] = (tb + b[q], ta + a[q], cnt + 1)
        print("\n| family (n) | before s | after s | delta |")
        print("|---|---|---|---|")
        for f, (tb, ta, cnt) in sorted(
            sums.items(), key=lambda kv: kv[1][1] - kv[1][0]
        ):
            print(f"| {f} ({cnt}) | {tb:.1f} | {ta:.1f} | {ta - tb:+.1f} |")


if __name__ == "__main__":
    main()
