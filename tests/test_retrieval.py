"""BM25 sparse retrieval + hybrid RRF fusion (operators/retrieval.py).

Pins: (1) the Spark BM25 ranking is bit-identical to a pure-Python
reference implementation of the documented formula (tokenizer, rational
idf, floor-micro quantization, tie order); (2) candidate generation is
an inverted-index probe (every hit shares a query term, the anchor is
excluded); (3) RRF fusion is the exact integer formula over the two
arms' ranks and the dense arm agrees with a numpy replay of the
quantized cosine.
"""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import functions as F

from data_ingestion_from_multiple_directories_linux_spark.catalog import load_table
from data_ingestion_from_multiple_directories_linux_spark.operators.retrieval import (
    ANCHOR_MAX_ID,
    ANCHOR_STEP,
    N_ARM,
    QUERY_TERMS,
    RRF_K,
    TOP_K,
    bm25_topk,
    hybrid_rrf_fusion,
)

SF = "/root/testdata/sf0.001"


def _tokens(text: str | None) -> list[str]:
    if text is None:
        return []
    return [t for t in re.split(r"\s+", text.lower()) if t != ""]


def _python_bm25(docs: dict[int, str | None]) -> list[tuple]:
    """Pure-Python replay of the documented BM25 pipeline."""
    tf: dict[int, Counter] = {d: Counter(_tokens(t)) for d, t in docs.items()}
    dl = {d: sum(c.values()) for d, c in tf.items() if sum(c.values()) > 0}
    n_tok = sum(dl.values())
    n_docs = len(docs)
    df: Counter = Counter()
    for c in tf.values():
        for term in c:
            df[term] += 1
    anchors = sorted(
        d for d in docs if d % ANCHOR_STEP == 0 and d < ANCHOR_MAX_ID
    )
    out = []
    for q in anchors:
        qterms = sorted(tf[q].items(), key=lambda kv: (-kv[1], kv[0]))[
            :QUERY_TERMS
        ]
        scored = {}
        hits: Counter = Counter()
        for term, _ in qterms:
            for d, c in tf.items():
                if d == q or term not in c:
                    continue
                t = c[term]
                idf = (float(n_docs) + 1.0) / (float(df[term]) + 1.0)
                num = float(t) * 2.2
                dlr = float(dl[d] * n_docs) / float(n_tok)
                denom = float(t) + (1.2 * (0.25 + (0.75 * dlr)))
                micro = math.floor(((idf * num) / denom) * 1000000.0)
                scored[d] = scored.get(d, 0) + micro
                hits[d] += 1
        ranked = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_K]
        for rank, (d, s) in enumerate(ranked, start=1):
            out.append((q, d, s, hits[d], rank))
    return sorted(out)


def test_bm25_matches_pure_python(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF, "documents").collect()
    }
    expected = _python_bm25(docs)
    got = sorted(
        (
            r["query_id"],
            r["doc_id"],
            r["bm25_micro"],
            r["n_terms_hit"],
            r["rank"],
        )
        for r in bm25_topk(spark, SF).collect()
    )
    assert got == expected


def test_bm25_hits_share_a_query_term_and_exclude_anchor(spark):
    docs = {
        r["doc_id"]: _tokens(r["text"])
        for r in load_table(spark, SF, "documents").collect()
    }
    rows = bm25_topk(spark, SF).collect()
    assert rows, "anchor queries produced no results"
    for r in rows:
        assert r["doc_id"] != r["query_id"]
        assert 1 <= r["n_terms_hit"] <= QUERY_TERMS
        qtf = Counter(docs[r["query_id"]])
        qterms = {
            t
            for t, _ in sorted(qtf.items(), key=lambda kv: (-kv[1], kv[0]))[
                :QUERY_TERMS
            ]
        }
        assert qterms & set(docs[r["doc_id"]]), "hit shares no query term"


def test_rrf_is_the_exact_integer_formula(spark):
    rows = hybrid_rrf_fusion(spark, SF).collect()
    assert rows
    by_query: dict[int, list] = {}
    for r in rows:
        s = r["sparse_rank"]
        d = r["dense_rank"]
        assert s is not None or d is not None
        expect = (1000000 // (RRF_K + s) if s is not None else 0) + (
            1000000 // (RRF_K + d) if d is not None else 0
        )
        assert r["rrf_micro"] == expect
        if s is not None:
            assert 1 <= s <= N_ARM
        if d is not None:
            assert 1 <= d <= N_ARM
        by_query.setdefault(r["query_id"], []).append(r)
    for q, rs in by_query.items():
        rs.sort(key=lambda r: r["fused_rank"])
        assert [r["fused_rank"] for r in rs] == list(range(1, len(rs) + 1))
        # fused order is (rrf desc, doc_id asc)
        keys = [(-r["rrf_micro"], r["doc_id"]) for r in rs]
        assert keys == sorted(keys)


def test_dense_arm_matches_numpy_quantized_cosine(spark):
    import numpy as np

    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in load_table(spark, SF, "embeddings").collect()
        if r["embedding"] is not None and len(r["embedding"]) == 64
    }

    def qdot(a, b):
        return int(sum(math.floor(float(x) * float(y) * 1e9) for x, y in zip(a, b)))

    q = 0
    qv = emb[q]
    scored = []
    for vid, v in emb.items():
        if vid == q:
            continue
        cos = qdot(v, qv) / math.sqrt(float(qdot(v, v)) * float(qdot(qv, qv)))
        scored.append((vid, cos))
    scored.sort(key=lambda t: (-t[1], t[0]))
    expect_top = [vid for vid, _ in scored[:N_ARM]]

    rows = [
        r
        for r in hybrid_rrf_fusion(spark, SF).collect()
        if r["query_id"] == q and r["dense_rank"] is not None
    ]
    for r in rows:
        assert expect_top[r["dense_rank"] - 1] == r["doc_id"]


def test_bm25_plan_broadcasts_query_side(spark):
    plan = bm25_topk(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
