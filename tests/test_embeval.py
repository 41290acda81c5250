"""Embedding covariance + kNN label audit (operators/embeval.py)."""

from __future__ import annotations

import math
from collections import Counter

from data_ingestion_from_multiple_directories_linux_spark.catalog import load_table
from data_ingestion_from_multiple_directories_linux_spark.operators.embeval import (
    KNN_K,
    SEED_MOD,
    embedding_covariance,
    knn_label_eval,
    knn_label_eval_ivf,
)

SF = "/root/testdata/sf0.001"


def _vecs(spark):
    return {
        r["vec_id"]: ([float(x) for x in r["embedding"]], r["label"])
        for r in load_table(spark, SF, "embeddings").collect()
        if r["embedding"] is not None and len(r["embedding"]) == 64
    }


def test_covariance_sums_match_pure_python(spark):
    vecs = _vecs(spark)
    n = len(vecs)
    rows = embedding_covariance(spark, SF).collect()
    assert len(rows) == 64 * 65 // 2
    by_ij = {(r["i"], r["j"]): r for r in rows}
    # spot-check a grid of (i, j) cells exactly
    for i, j in [(0, 0), (0, 1), (3, 17), (31, 63), (63, 63), (10, 10)]:
        sum_xy = sum(
            math.floor((v[i] * v[j]) * 1e9) for v, _ in vecs.values()
        )
        sum_x = sum(math.floor(v[i] * 1e9) for v, _ in vecs.values())
        sum_y = sum(math.floor(v[j] * 1e9) for v, _ in vecs.values())
        r = by_ij[(i, j)]
        assert r["n_vec"] == n
        assert r["sum_xy_q"] == sum_xy
        assert r["sum_x_q"] == sum_x
        assert r["sum_y_q"] == sum_y
        cov = (sum_xy / (1e9 * n)) - ((sum_x / (1e9 * n)) * (sum_y / (1e9 * n)))
        assert r["cov"] == cov
    # diagonal variances are non-negative up to quantization (−1 ulp of
    # the 1e-9 grid per element is the worst floor error)
    for (i, j), r in by_ij.items():
        if i == j:
            assert r["cov"] >= -1e-8


def test_knn_label_eval_matches_pure_python(spark):
    vecs = _vecs(spark)

    def qdot(a, b):
        return sum(math.floor((x * y) * 1e9) for x, y in zip(a, b))

    seeds = {k: v for k, v in vecs.items() if k % SEED_MOD == 0}
    qs = {k: v for k, v in vecs.items() if k % SEED_MOD != 0}
    confusion: Counter = Counter()
    for qid, (qv, qlabel) in qs.items():
        nq = qdot(qv, qv)
        scored = []
        for sid, (sv, slabel) in seeds.items():
            cos = qdot(qv, sv) / math.sqrt(float(qdot(sv, sv)) * float(nq))
            scored.append((-cos, sid, slabel))
        scored.sort()
        votes: Counter = Counter(sl for _, _, sl in scored[:KNN_K])
        plabel = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        confusion[(qlabel, plabel)] += 1
    rows = knn_label_eval(spark, SF).collect()
    got = {(r["label_true"], r["label_pred"]): r["n"] for r in rows}
    assert got == dict(confusion)
    assert sum(got.values()) == len(qs)


def test_knn_label_eval_ivf_matches_in_cell_replay(spark):
    """Stage 2 of the IVF-staged audit replayed in pure Python over the
    engine's own trained cell assignment: restrict every query's
    candidate pool to its in-cell labeled seeds, run the identical
    deterministic vote, and demand the confusion matrix matches —
    including the documented drop of queries whose cell holds no
    labeled seed."""
    from collections import defaultdict

    from data_ingestion_from_multiple_directories_linux_spark.functions.vectors import (
        norm_sq_q,
        to_double_array,
    )
    from data_ingestion_from_multiple_directories_linux_spark.operators.similarity import (
        _assign_cells,
        _trained_centroids,
        load_embeddings,
    )

    vecs = _vecs(spark)
    corpus = (
        load_embeddings(spark, SF)
        .select("vec_id", to_double_array("embedding").alias("v"))
        .withColumn("nv", norm_sq_q("v"))
    )
    cell = {
        r["vec_id"]: r["cell"]
        for r in _assign_cells(corpus, _trained_centroids(spark, SF))
        .select("vec_id", "cell")
        .collect()
    }

    def qdot(a, b):
        return sum(math.floor((x * y) * 1e9) for x, y in zip(a, b))

    seeds_by_cell = defaultdict(list)
    for sid, (sv, slabel) in vecs.items():
        if sid % SEED_MOD == 0 and slabel is not None:
            seeds_by_cell[cell[sid]].append((sid, sv, slabel))
    confusion: Counter = Counter()
    evaluated = 0
    for qid, (qv, qlabel) in vecs.items():
        if qid % SEED_MOD == 0:
            continue
        pool = seeds_by_cell.get(cell[qid], [])
        if not pool:
            continue
        evaluated += 1
        nq = qdot(qv, qv)
        scored = []
        for sid, sv, slabel in pool:
            cos = qdot(qv, sv) / math.sqrt(float(qdot(sv, sv)) * float(nq))
            scored.append((-cos, sid, slabel))
        scored.sort()
        votes: Counter = Counter(sl for _, _, sl in scored[:KNN_K])
        plabel = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        confusion[(qlabel, plabel)] += 1
    rows = knn_label_eval_ivf(spark, SF).collect()
    got = {(r["label_true"], r["label_pred"]): r["n"] for r in rows}
    assert got == dict(confusion)
    assert sum(got.values()) == evaluated
