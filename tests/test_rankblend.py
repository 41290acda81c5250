"""Rank-ensembled quality blend (operators/rankblend.py)."""

from __future__ import annotations

import math

from data_ingestion_from_multiple_directories_linux_spark.catalog import load_table
from data_ingestion_from_multiple_directories_linux_spark.operators.rankblend import (
    LEN_CAP,
    quality_rank_blend,
)
from data_ingestion_from_multiple_directories_linux_spark.operators.text_analysis import (
    STOPWORDS,
)

SF = "/root/testdata/sf0.001"


def _signals(text):
    toks = [t for t in (text or "").lower().split() if t]
    stop = (
        math.floor(1000.0 * (sum(1 for t in toks if t in STOPWORDS) / len(toks)))
        if toks
        else 0
    )
    if text and len(text) > 0:
        punct_n = sum(1 for ch in text if not (ch.isalnum() or ch.isspace()))
        punct = math.floor(1000.0 * (punct_n / len(text)))
    else:
        punct = 0
    return stop, punct, min(len(toks), LEN_CAP)


def test_matches_pure_python_min_rank_replay(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF, "documents").collect()
        if r["doc_id"] is not None
    }
    sig = {d: _signals(t) for d, t in docs.items()}
    n = len(sig)

    def rank_pm(idx):
        vals = sorted(s[idx] for s in sig.values())
        import bisect

        return {
            d: 1000 * bisect.bisect_left(vals, s[idx]) // max(n - 1, 1)
            for d, s in sig.items()
        }

    rs, rp, rl = rank_pm(0), rank_pm(1), rank_pm(2)
    expect = {
        d: (rs[d], rp[d], rl[d], rs[d] + rl[d] - rp[d]) for d in sig
    }
    got = {
        r["doc_id"]: (
            r["stop_rank_pm"],
            r["punct_rank_pm"],
            r["len_rank_pm"],
            r["blend_pm"],
        )
        for r in quality_rank_blend(spark, SF).collect()
    }
    assert got == expect and got


def test_plan_has_no_global_sort(spark):
    """The whole point: percentile-normalizing three signals costs ZERO
    corpus-wide sorts — the only single-partition windows run over the
    bounded signal histograms, and the corpus is scanned once."""
    df = quality_rank_blend(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()  # no global sort
    assert plan.count("FileScan") == 0  # reads the checkpointed signals
    # histogram joins come back as broadcasts, corpus side never shuffles
    assert "BroadcastHashJoin" in plan