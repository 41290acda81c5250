"""Bench harness (SURVEY.md M6; driver contract).

Times every registered `queries()` entry at `$SPARK_GRAFT_SF_DIR`
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per query: 1 warm-up-free timed run + 1 repeat, report the min (first run
pays JVM/codegen warm-up for its plan; min is the steady-state figure).
Execution forces a full materialization without driver transfer via
``df.write.format("noop")`` — the same work a sink would do, none of the
collect cost.

Also records end-to-end ingestion throughput (files/sec) on a synthetic
JSON tree — the reference's own operating metric (50k files/hour cap,
file_loader.py:255) — under extra key ``ingest``.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _run_once(fn, spark) -> float:
    """Time plan construction + full materialization (noop sink). The
    construction must sit inside the timer: iterative operators (e.g.
    duplicate_clusters' label propagation) do eager checkpointed work
    while the plan is being built, not at write time."""
    t0 = time.perf_counter()
    df = fn(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def bench_queries(spark) -> dict[str, float]:
    import __spark_entry__ as entry_mod

    out: dict[str, float] = {}
    for name, fn in sorted(entry_mod.queries().items()):
        best = float("inf")
        for _ in range(max(1, REPS)):
            best = min(best, _run_once(fn, spark))
        out[name] = round(best, 4)
    return out


#: the pair-generating / iterative ops whose scaling behavior carries the
#: 100 TB claim — everything else is scan-shaped
SCALE_OPS = (
    "minhash_lsh_near_dup",
    "ngram_jaccard_pairs",
    "duplicate_clusters",
    "embedding_near_dup_ivf",
    "embedding_near_dup_lsh",
    "simhash_fingerprint",
)
SCALE_SMALL_DIR = os.environ.get(
    "SPARK_GRAFT_SCALE_SMALL_DIR", "/root/testdata/sf0.01"
)


def bench_scale(spark, big: dict[str, float]) -> dict:
    """Empirical scale curve for the bucketed ops: time at the small SF
    vs the (already-measured) big SF. Data grows 10x between the driver's
    SFs; a bucketed design should grow far closer to 10x (linear) than
    100x (quadratic/all-pairs). ``ratio`` = t_big / t_small."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out: dict[str, dict] = {}
    for name in SCALE_OPS:
        if name not in qs or name not in big:
            continue
        best = float("inf")
        for _ in range(max(1, REPS)):
            t0 = time.perf_counter()
            df = qs[name](spark, SCALE_SMALL_DIR)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = {
            "small_sec": round(best, 4),
            "big_sec": big[name],
            "ratio": round(big[name] / best, 2) if best > 0 else None,
        }
    return out


def _make_upload_tree(uploads: str, n_files: int, rows_per_file: int) -> None:
    for i in range(n_files):
        fac = f"FAC{i % 8:03d}"
        os.makedirs(os.path.join(uploads, fac), exist_ok=True)
        recs = [
            {
                "id": i * rows_per_file + j,
                "uuid": f"u-{i}-{j}",
                "surname": f"S{j}",
                "first_name": f"F{j}",
                "other_name": None,
                "full_name": f"F{j} S{j}",
                "hospital_number": f"H{j}",
                "nin_number": f"N{j}",
                "date_of_birth": "1990-01-15",
                "archived": 0,
                "facility_id": fac,
            }
            for j in range(rows_per_file)
        ]
        fn = f"patient_person_{i}_2025010314{i:04d}.json"
        with open(os.path.join(uploads, fac, fn), "w") as f:
            json.dump(recs, f)


def bench_ingest(spark, n_files: int = 40, rows_per_file: int = 200) -> dict:
    """Files/sec + rows/sec of the full engine path (read → cleanse →
    quarantine → lineage → partitioned write → audit).

    A small untimed warm-up run (separate warehouse) pays the one-time
    JVM costs (parquet committer init, write-path codegen) first, so the
    timed run measures the steady state a cron micro-batch actually runs
    at — the same convention the query bench uses (min over reps)."""
    from data_ingestion_from_multiple_directories_linux_spark.ingest.engine import IngestionEngine

    tmp = tempfile.mkdtemp(prefix="bench_ingest_")
    try:
        warm = os.path.join(tmp, "warm_up")
        _make_upload_tree(warm, n_files=4, rows_per_file=20)
        IngestionEngine(spark, os.path.join(tmp, "warm_wh")).run(warm)

        uploads = os.path.join(tmp, "up")
        _make_upload_tree(uploads, n_files, rows_per_file)
        eng = IngestionEngine(spark, os.path.join(tmp, "wh"))
        t0 = time.perf_counter()
        rep = eng.run(uploads)
        dt = time.perf_counter() - t0
        return {
            "files": rep.files_ingested,
            "rows": rep.records_ingested,
            "sec": round(dt, 4),
            "files_per_sec": round(rep.files_ingested / dt, 2),
            "rows_per_sec": round(rep.records_ingested / dt, 1),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    from data_ingestion_from_multiple_directories_linux_spark.session import get_spark

    spark = get_spark(app_name="bench", cpus=CPUS)
    queries = bench_queries(spark)
    scale = bench_scale(spark, queries)
    ingest = bench_ingest(spark)
    total = round(sum(queries.values()), 4)
    print(
        json.dumps(
            {
                "metric": "sum_min_query_sec",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": _sf_of(SF_DIR),
                "cpus": CPUS,
                "n_queries": len(queries),
                "scale": {
                    "small_sf": _sf_of(SCALE_SMALL_DIR),
                    "big_sf": _sf_of(SF_DIR),
                    "data_ratio": 10.0,
                    "ops": scale,
                },
                "ingest": ingest,
            }
        )
    )


if __name__ == "__main__":
    main()
