"""FIM span prep (operators/traindata.py)."""

from __future__ import annotations

from data_ingestion_from_multiple_directories_linux_spark.catalog import load_table
from data_ingestion_from_multiple_directories_linux_spark.operators.traindata import (
    FIM_MIN_CHARS,
    MID_TOK,
    PRE_TOK,
    SUF_TOK,
    fim_span_prep,
)

SF = "/root/testdata/sf0.001"


def test_fim_reassembly_and_psm_serialization(spark):
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF, "documents").collect()
    }
    rows = fim_span_prep(spark, SF).collect()
    eligible = {
        d for d, t in texts.items() if t is not None and len(t) >= FIM_MIN_CHARS
    }
    assert {r["doc_id"] for r in rows} == eligible
    for r in rows:
        t = texts[r["doc_id"]]
        # the defining invariant: lossless three-way split
        assert r["prefix"] + r["middle"] + r["suffix"] == t
        assert len(r["prefix"]) == r["prefix_len"] >= 1
        assert len(r["middle"]) == r["middle_len"] >= 1
        assert len(r["suffix"]) == r["suffix_len"] >= 0
        assert (
            r["fim_text"]
            == PRE_TOK + r["prefix"] + SUF_TOK + r["suffix"] + MID_TOK + r["middle"]
        )
        # spans replay the documented arithmetic
        cap = max(len(t) // 3, 1)
        m_start = 2 + (r["doc_id"] * 7) % cap
        m_len = 1 + (r["doc_id"] * 13) % cap
        assert r["prefix_len"] == m_start - 1
        assert r["middle"] == t[m_start - 1 : m_start - 1 + m_len]


def test_fim_spans_vary_across_documents(spark):
    rows = fim_span_prep(spark, SF).collect()
    # the pseudo-random spans actually move (not a constant split)
    assert len({r["prefix_len"] for r in rows}) > 5
    assert len({r["middle_len"] for r in rows}) > 5
