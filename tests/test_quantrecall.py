"""Quantization recall evals (operators/quantrecall.py, L174/L175)."""

from __future__ import annotations

import math

from test_annrecall import anchor_ids

from data_ingestion_from_multiple_directories_linux_spark.operators.anchors import (
    ANCHOR_COUNT,
)
from data_ingestion_from_multiple_directories_linux_spark.operators.quantrecall import (
    pq_recall_eval,
    sq8_recall_eval,
)
from data_ingestion_from_multiple_directories_linux_spark.operators.similarity import (
    SQ_LEVELS,
    TOPK_NEIGHBORS,
    _pq_assign,
    _pq_slices,
    _trained_pq_codebooks,
    load_embeddings,
)
from data_ingestion_from_multiple_directories_linux_spark.functions.vectors import (
    to_double_array,
)
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _vecs(spark):
    e = load_embeddings(spark, SF).select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    return {r["vec_id"]: [float(x) for x in r["v"]] for r in e.collect()}


def _dot_q(a, b):
    return sum(math.floor(x * y * 1e9) for x, y in zip(a, b))


def _exact_topk(vecs, qid):
    ranked = sorted(
        ((-_dot_q(vecs[qid], v), vid) for vid, v in vecs.items() if vid != qid)
    )[:TOPK_NEIGHBORS]
    return {vid for _, vid in ranked}


def test_pq_recall_matches_replay_from_shared_machinery(spark):
    """The eval must equal a pure-Python ADC replay over the SAME
    trained codebooks and corpus codes the registered pq_topk_adc
    uses (collected once) — the approximate arm is existing machinery,
    so the recall number is fully determined by it."""
    vecs = _vecs(spark)
    cent = {
        (r["m"], r["cid"]): [float(x) for x in r["cv"]]
        for r in _trained_pq_codebooks(spark, SF).collect()
    }
    e = load_embeddings(spark, SF).select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    codes = {
        (r["vec_id"], r["m"]): r["cell"]
        for r in _pq_assign(
            _pq_slices(e, ["vec_id"]), _trained_pq_codebooks(spark, SF)
        ).collect()
    }
    n_m = max(m for _, m in codes) + 1
    subdim = len(next(iter(vecs.values()))) // n_m

    expect = {}
    for qid in anchor_ids(vecs.keys()):
        qv = vecs[qid]
        adc = []
        for vid in vecs:
            if vid == qid:
                continue
            s = 0
            for m in range(n_m):
                qs = qv[m * subdim : (m + 1) * subdim]
                cv = cent[(m, codes[(vid, m)])]
                s += _dot_q(qs, cv)
            adc.append((-s, vid))
        approx = {vid for _, vid in sorted(adc)[:TOPK_NEIGHBORS]}
        exact = _exact_topk(vecs, qid)
        n = len(exact & approx)
        expect[qid] = (n, 1000 * n // len(exact))

    got = {
        r["query_id"]: (r["n_overlap"], r["recall_permille"])
        for r in pq_recall_eval(spark, SF).collect()
    }
    assert got == expect and len(got) == ANCHOR_COUNT
    # informative: PQ at the demo code size pays real ranking loss
    assert any(n < TOPK_NEIGHBORS for n, _ in got.values())


def test_sq8_recall_matches_pure_python_replay(spark):
    """Full pure-Python replay of the SQ8 pipeline (per-dimension max
    scales, symmetric int8 codes, integer dots) against the exact
    quantized-dot ranking."""
    vecs = _vecs(spark)
    dim = len(next(iter(vecs.values())))
    scales = [
        max(abs(v[i]) for v in vecs.values()) for i in range(dim)
    ]

    def code(v):
        return [
            math.floor(v[i] * SQ_LEVELS / scales[i]) if scales[i] > 0 else 0
            for i in range(dim)
        ]

    q = {vid: code(v) for vid, v in vecs.items()}
    expect = {}
    for qid in anchor_ids(vecs.keys()):
        ranked = sorted(
            (
                (-sum(a * b for a, b in zip(q[qid], q[vid])), vid)
                for vid in vecs
                if vid != qid
            )
        )[:TOPK_NEIGHBORS]
        approx = {vid for _, vid in ranked}
        exact = _exact_topk(vecs, qid)
        n = len(exact & approx)
        expect[qid] = (n, 1000 * n // len(exact))

    got = {
        r["query_id"]: (r["n_overlap"], r["recall_permille"])
        for r in sq8_recall_eval(spark, SF).collect()
    }
    assert got == expect and len(got) == ANCHOR_COUNT
    # SQ8 beats PQ on the same corpus (8x vs 256x compression) — the
    # cross-eval ordering the pair of metrics exists to show
    pq = {
        r["query_id"]: r["n_overlap"]
        for r in pq_recall_eval(spark, SF).collect()
    }
    assert sum(n for n, _ in got.values()) > sum(pq.values())


def test_exact_arms_broadcast_bounded_anchors(spark):
    """Plan shape: both evals broadcast the bounded anchor frame onto
    corpus scans — no corpus shuffle joins, no single-partition
    exchange."""
    for fn in (pq_recall_eval, sq8_recall_eval):
        plan = (
            fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan, fn.__name__
        assert "BroadcastNestedLoopJoin" in plan, fn.__name__
        if fn is pq_recall_eval:
            # sq8's plan legitimately carries one SinglePartition
            # exchange: the 64-row per-dimension scales reduce (the
            # registered sq8_quantized_topk's own shape — a bounded
            # dim-count frame, the documented allowance)
            assert "Exchange SinglePartition" not in plan, fn.__name__
