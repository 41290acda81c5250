"""Vocabulary growth curve (operators/corpus_stats.py)."""

from __future__ import annotations

import re

from data_ingestion_from_multiple_directories_linux_spark.catalog import load_table
from data_ingestion_from_multiple_directories_linux_spark.operators.corpus_stats import (
    DECILES,
    vocab_growth_curve,
)

SF = "/root/testdata/sf0.001"


def test_vocab_growth_matches_pure_python_and_is_monotone(spark):
    docs = sorted(
        (r["doc_id"], r["text"])
        for r in load_table(spark, SF, "documents").collect()
    )
    n = len(docs)

    def toks(t):
        return [x for x in re.split(r"\s+", t.lower()) if x] if t else []

    rows = sorted(vocab_growth_curve(spark, SF).collect(), key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(1, DECILES + 1))
    prev_terms, prev_tokens = -1, -1
    for r in rows:
        prefix = (n * r["decile"]) // DECILES
        assert r["docs_prefix"] == prefix
        seen: set[str] = set()
        total = 0
        for d, t in docs:
            if d < prefix:
                tt = toks(t)
                seen.update(tt)
                total += len(tt)
        assert r["distinct_terms"] == len(seen)
        assert r["total_tokens"] == total
        # the curve is monotone by construction
        assert r["distinct_terms"] >= prev_terms
        assert r["total_tokens"] >= prev_tokens
        prev_terms, prev_tokens = r["distinct_terms"], r["total_tokens"]
    # Heaps-law shape on this corpus: the vocabulary saturates long
    # before the token count does (distinct growth is sub-linear).
    first, last = rows[0], rows[-1]
    assert last["total_tokens"] > first["total_tokens"] * (DECILES - 2)
    assert last["distinct_terms"] < first["distinct_terms"] * (DECILES - 2)
