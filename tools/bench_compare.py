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

## Cache-semantics epoch (round 10)

Mid-round-9, bench._run_once gained a per-rep cache release (commit
6de9b42): before it, a query's SECOND rep rode the persisted frames its
first rep left behind, so any query that persists corpus-derived
intermediates in its timed path (the IVF assign table, MinHash shingle
sets, the BM25 tf index, …) recorded a min that measures CACHED-reads,
not the query. Records r04–r09 fold runs from both semantics. Round 10
proved the old mins unreachable under the new semantics with IDENTICAL
code: re-running round-9's exact HEAD (54b8f20) against the same
parquet gives 1.5–1.9 s for ivf_topk_neighbors / hard_negative_mining /
rerank_topk_ivf / ngram_jaccard_capped, whose r04–r09 recorded mins are
0.41–0.59 s. For the persist-coupled queries (CACHE_COUPLED, derived by
static inspection of each query's timed path for persist()/
localCheckpoint) the baseline therefore uses only records from
CACHE_EPOCH (r10) onward — comparing a cold-cache candidate against a
cached-read historical min would flag phantom regressions forever.
"""
from __future__ import annotations

import json
import os
import re
import sys

GATE = float(os.environ.get("SPARK_GRAFT_BENCH_GATE", "2.0"))
FLOOR = 0.1  # seconds: noise floor for tiny baselines

#: first round whose records are entirely per-rep-cache-release runs.
CACHE_EPOCH = 10
#: queries whose timed path persists/checkpoints corpus-derived frames
#: (static inspection, tools note above) — their pre-epoch mins measured
#: cached reads and are not comparable.
CACHE_COUPLED = frozenset(
    {
        "bm25_topk",
        "budget_quality_selection",
        "char_lm_surprise",
        "cluster_size_histogram",
        "contamination_spread",
        "crawl_budget_apportionment",
        "cross_source_overlap",
        "crosslingual_near_dup",
        "dedup_materialize_canonical",
        "duplicate_clusters",
        "embedding_near_dup_ivf",
        "embedding_near_dup_lsh",
        "hard_negative_mining",
        "host_pagerank",
        "hybrid_rrf_fusion",
        "ivf_topk_neighbors",
        "ivfpq_topk_neighbors",
        "knn_label_eval_ivf",
        "leakage_safe_split",
        "minhash_estimate_calibration",
        "minhash_incremental_near_dup",
        "minhash_lsh_near_dup",
        "near_dup_triangles",
        "ngram_jaccard_capped",
        "ngram_jaccard_pairs",
        "pq_topk_adc",
        "quality_gate_training",
        "repeated_substring_spans",
        "rerank_topk_ivf",
        "semantic_dedup_survivors",
        "sequence_packing",
        "shingle_containment_pairs",
        "source_token_drift",
        "token_cooccurrence_lift",
        "trained_gate_calibration",
    }
)


def record_round(path: str) -> int:
    """Round number parsed from a BENCH_LOCAL_r{N}.json filename (0 if
    the name carries none — treated as pre-epoch)."""
    m = re.search(r"r(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else 0


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
        pre_epoch = record_round(p) < CACHE_EPOCH
        for name, sec in query_mins(p).items():
            if pre_epoch and name in CACHE_COUPLED:
                continue  # cached-read-era min: not comparable
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
