"""ANN recall eval (operators/annrecall.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_ingestion_from_multiple_directories_linux_spark.operators.annrecall import (
    ivf_recall_eval,
)
from data_ingestion_from_multiple_directories_linux_spark.operators.similarity import (
    TOPK_NEIGHBORS,
    TOPK_QUERY_MOD,
    _vec_corpus,
    ivf_topk_neighbors,
)

SF = "/root/testdata/sf0.001"


def test_recall_matches_cross_check_of_existing_queries(spark):
    """The eval must equal what you'd get by intersecting the REGISTERED
    IVF top-k query's output with an exact top-k computed locally over
    the same shared vector corpus — the two arms are the existing
    machinery, so the recall number is fully determined by them."""
    ivf = {}
    for r in ivf_topk_neighbors(spark, SF).collect():
        ivf.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    vecs = {
        r["vec_id"]: ([float(x) for x in r["v"]], int(r["nv"]))
        for r in _vec_corpus(spark, SF).collect()
    }

    def cos(a, b):
        dot = sum(math.floor(x * y * 1e9) for x, y in zip(a[0], b[0]))
        return float(dot) / math.sqrt(float(a[1]) * float(b[1]))

    expect = {}
    for qid, qv in vecs.items():
        if qid % TOPK_QUERY_MOD != 0:
            continue
        ranked = sorted(
            ((-cos(v, qv), vid) for vid, v in vecs.items() if vid != qid)
        )[:TOPK_NEIGHBORS]
        exact = {vid for _, vid in ranked}
        n = len(exact & ivf.get(qid, set()))
        expect[qid] = (n, 1000 * n // TOPK_NEIGHBORS)

    got = {
        r["query_id"]: (r["n_overlap"], r["recall_permille"])
        for r in ivf_recall_eval(spark, SF).collect()
    }
    assert got == expect and got
    # the metric is informative: IVF pays real cell-boundary loss at
    # this tiny SF (nprobe=1, 32 cells over ~600 vectors — measured
    # ~30% recall, exactly the honest number the eval exists to show)
    # while still finding a nonzero share of the true neighbors
    vals = [n for n, _ in got.values()]
    assert any(v < TOPK_NEIGHBORS for v in vals)
    assert sum(vals) > 0


def test_exact_arm_broadcasts_bounded_queries(spark):
    """Plan shape: the ground-truth arm must broadcast the anchor-query
    frame onto the corpus, never shuffle the corpus for a join; the
    final overlap join is K-sized per query."""
    plan = (
        ivf_recall_eval(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the broadcast query arm
    assert "Exchange SinglePartition" not in plan


def test_nprobe2_recovers_recall(spark):
    """The recovery claim, measured: probing each vector's 2 best cells
    never hurts any query's recall and strictly lifts the aggregate
    (vectors near a Voronoi face meet their neighbors across it)."""
    from data_ingestion_from_multiple_directories_linux_spark.operators.annrecall import (
        ivf_recall_eval_nprobe2,
    )

    r1 = {
        r["query_id"]: r["n_overlap"]
        for r in ivf_recall_eval(spark, SF).collect()
    }
    r2 = {
        r["query_id"]: r["n_overlap"]
        for r in ivf_recall_eval_nprobe2(spark, SF).collect()
    }
    assert set(r1) == set(r2)
    assert all(r2[q] >= r1[q] for q in r1)
    assert sum(r2.values()) > sum(r1.values())
