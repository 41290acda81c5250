"""Per-query time breakdown: python tools/profile_query.py name [name...]

For each named query (or --top N for the N slowest in BENCH_LOCAL_r12.json),
runs REPS times at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS] (the bench
config) and reports, per run:

  build_s  — fn(spark, sf_dir) wall (Python plan construction; for iterative
             operators this includes their eager checkpoint jobs)
  write_s  — noop-sink materialization wall
  jobs / stages / tasks — created during the run (status-store diff)
  shuffle read/write MB

The split tells you whether a slow query is Catalyst/driver-bound (fix the
expression tree or job count) or execution-bound (fix the plan shape).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_DIR)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "2"))


def _counts(spark):
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    jvm, gw = sc._jvm, sc._gateway
    jobs = store.jobsList(None)
    stages = store.stageList(
        jvm.java.util.ArrayList(),
        False,
        False,
        gw.new_array(jvm.double, 0),
        jvm.java.util.ArrayList(),
    )
    nj = jobs.size()
    max_job = -1
    it = jobs.iterator()
    while it.hasNext():
        j = it.next()
        max_job = max(max_job, int(j.jobId()))
    out_stages = []
    it = stages.iterator()
    while it.hasNext():
        s = it.next()
        out_stages.append(
            (
                int(s.stageId()),
                int(s.numCompleteTasks()),
                int(s.shuffleReadBytes()),
                int(s.shuffleWriteBytes()),
            )
        )
    return max_job, out_stages


def main() -> None:
    from data_ingestion_from_multiple_directories_linux_spark.session import get_spark

    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    top_n = 0
    for a in sys.argv[1:]:
        if a.startswith("--top"):
            top_n = int(a.split("=")[1]) if "=" in a else 10
    if top_n:
        bench = json.load(open(os.path.join(REPO_DIR, "BENCH_LOCAL_r12.json")))
        names += [
            k
            for k, _ in sorted(bench["queries"].items(), key=lambda kv: -kv[1])[
                :top_n
            ]
        ]

    spark = get_spark(app_name="profile", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    print(
        f"{'query':42s} {'rep':>3s} {'build_s':>8s} {'write_s':>8s} "
        f"{'total_s':>8s} {'jobs':>5s} {'stages':>6s} {'tasks':>6s} "
        f"{'shufMB':>7s}"
    )
    for name in names:
        fn = qs[name]
        for rep in range(REPS):
            jb0, st0 = _counts(spark)
            mark = max((sid for sid, *_ in st0), default=-1)
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            jb1, st1 = _counts(spark)
            new = [s for s in st1 if s[0] > mark]
            ntasks = sum(s[1] for s in new)
            shuf = sum(s[2] for s in new) / 1e6
            print(
                f"{name:42s} {rep:3d} {t1 - t0:8.3f} {t2 - t1:8.3f} "
                f"{t2 - t0:8.3f} {jb1 - jb0:5d} {len(new):6d} {ntasks:6d} "
                f"{shuf:7.2f}"
            )
            spark.catalog.clearCache()


if __name__ == "__main__":
    main()
