"""Frontier-dedup batch twin (operators/frontier_dedup.py, L171)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from data_ingestion_from_multiple_directories_linux_spark.catalog import load_table
from data_ingestion_from_multiple_directories_linux_spark.operators.frontier_dedup import (
    _raw_col,
    frontier_dedup_batch,
)
from data_ingestion_from_multiple_directories_linux_spark.operators.urlnorm import (
    url_canonicalize,
)

SF = "/root/testdata/sf0.001"


def _sets(spark):
    """Canonical seen / incoming URL sets, derived with the SAME shared
    expressions the operator composes — the classification below is
    then pure set logic, no reimplementation of canonicalization."""
    d = load_table(spark, SF, "documents").select(
        "doc_id",
        _raw_col().alias("raw_url"),
        url_canonicalize(_raw_col()).alias("url"),
    )
    seen = {
        r["url"] for r in d.filter(F.col("doc_id") % 3 != 0).collect()
    }
    inc = {}
    for r in d.filter(F.col("doc_id") % 3 == 0).collect():
        cur = inc.get(r["url"])
        if cur is None or r["doc_id"] < cur:
            inc[r["url"]] = r["doc_id"]
    return seen, inc


def test_classification_is_exact_set_logic(spark):
    """The Bloom filter may lie positive but never negative, and the
    exact rescue must correct every lie: emitted == incoming \\ seen
    (first-seen-only, no false drops), dup == incoming ∩ seen, and
    every keeper is the min doc_id of its canonical key."""
    seen, inc = _sets(spark)
    rows = frontier_dedup_batch(spark, SF).collect()
    assert {r["url"] for r in rows} == set(inc)

    emitted = {r["url"] for r in rows if r["emitted"] == 1}
    dups = {r["url"] for r in rows if r["verdict"] == "dup"}
    assert emitted == set(inc) - seen
    assert dups == set(inc) & seen
    for r in rows:
        assert r["keeper_doc_id"] == inc[r["url"]]
        assert (r["emitted"] == 0) == (r["verdict"] == "dup")
        if r["verdict"] == "new":
            assert r["bloom_hit"] == 0 and r["url"] not in seen
        else:
            assert r["bloom_hit"] == 1
        if r["verdict"] == "rescued_fp":
            assert r["url"] not in seen  # the rescue saved a real page
    # informative at this SF: all three classes populated (the filter
    # is deliberately undersized — see bloomdedup's module docstring)
    verdicts = {r["verdict"] for r in rows}
    assert verdicts == {"new", "dup", "rescued_fp"}
    # canonicalization mattered: some canonical key collapsed several
    # raw spellings inside the batch
    assert any(r["n_raw_spellings"] > 1 for r in rows)


def test_batch_twin_matches_streaming_frontier(spark, tmp_path):
    """The proxy-verification contract: feed the SAME corpus through
    the streaming frontier (wave 1 = the seen history, wave 2 = the
    incoming batch) — the stream's wave-2 emission must equal the batch
    twin's emitted rows, keeper doc_ids included."""
    from data_ingestion_from_multiple_directories_linux_spark.sources.table_store import (
        TableStore,
    )
    from data_ingestion_from_multiple_directories_linux_spark.streaming.frontier import (
        StreamingCrawlFrontier,
    )

    d = (
        load_table(spark, SF, "documents")
        .select("doc_id", _raw_col().alias("raw_url"))
        .collect()
    )
    src = tmp_path / "src"
    src.mkdir()

    def write_wave(name, rows):
        with open(os.path.join(str(src), name), "w") as f:
            for r in rows:
                f.write(
                    json.dumps({"doc_id": r["doc_id"], "url": r["raw_url"]})
                    + "\n"
                )

    store = TableStore(spark, str(tmp_path / "wh"))
    fr = StreamingCrawlFrontier(spark, store, str(src), str(tmp_path / "ck"))
    write_wave("w1.json", [r for r in d if r["doc_id"] % 3 != 0])
    fr.run_available_now()
    write_wave("w2.json", [r for r in d if r["doc_id"] % 3 == 0])
    fr.run_available_now()

    stream_emitted = {
        (r["url"], r["doc_id"])
        for r in fr.frontier().filter(F.col("batch_id") == 1).collect()
    }
    twin_emitted = {
        (r["url"], r["keeper_doc_id"])
        for r in frontier_dedup_batch(spark, SF).collect()
        if r["emitted"] == 1
    }
    assert stream_emitted == twin_emitted and twin_emitted
