"""Composed training-data pipeline (operators/funnel.py): stage
attribution, split safety, packing exactness, determinism, and the
composed-DAG plan census (no corpus rescans past the persist points)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_from_multiple_directories_linux_spark.catalog import load_table
from data_ingestion_from_multiple_directories_linux_spark.operators.dedup import (
    JACCARD_MINHASH_THRESHOLD,
    minhash_pairs,
)
from data_ingestion_from_multiple_directories_linux_spark.operators.funnel import (
    EXACT_DUP_MOD,
    FUNNEL_BUCKET_CAP,
    FUNNEL_SHINGLE_N,
    NEAR_DUP_MOD,
    URL_DUP_MOD,
    funnel_corpus,
    training_funnel,
)
from data_ingestion_from_multiple_directories_linux_spark.operators.corpus import (
    PACK_BUDGET,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def funnel(spark):
    return training_funnel(spark, SF)


def test_funnel_narrows_and_attributes_planted_twins(spark, funnel):
    c = funnel["counts"]
    order = [
        "synthesized",
        "cleansed",
        "url_dedup",
        "exact_dedup",
        "near_dedup",
        "quality_gate",
        "decontaminated",
        "split_total",
        "train",
    ]
    vals = [c[k] for k in order]
    assert vals == sorted(vals, reverse=True) and vals[-1] > 0

    ids = [
        r["doc_id"]
        for r in load_table(spark, SF, "documents").select("doc_id").collect()
    ]
    off = max(ids) + 1
    n_url = sum(1 for i in ids if i % URL_DUP_MOD == 0)
    n_exact = sum(1 for i in ids if i % EXACT_DUP_MOD == 0)
    n_near = sum(1 for i in ids if i % NEAR_DUP_MOD == 0)
    assert c["synthesized"] == len(ids) + n_url + n_exact + n_near
    # URL dedup drops EXACTLY the URL twins (all spellings canonical-equal)
    assert c["url_dedup"] == c["cleansed"] - n_url
    # exact dedup drops at least every exact twin (plus raw exact dupes)
    assert c["url_dedup"] - c["exact_dedup"] >= n_exact
    # near-dup dedup drops at least every near twin
    assert c["exact_dedup"] - c["near_dedup"] >= n_near
    # and the twins themselves are gone from the final pool
    packed_ids = {r["doc_id"] for r in funnel["result"].collect()}
    assert not any(i >= off for i in packed_ids)


def test_funnel_split_is_leakage_safe(spark, funnel):
    """No near-dup edge (the same corpus/threshold the funnel used) has
    BOTH endpoints in the post-dedup pool — so no near-dup pair can
    straddle train/test by construction."""
    corpus = funnel_corpus(spark, SF)
    edges = minhash_pairs(
        corpus.filter(F.col("text").isNotNull() & (F.col("n_tok") > 0)).select(
            "doc_id", "text"
        ),
        FUNNEL_SHINGLE_N,
        JACCARD_MINHASH_THRESHOLD,
        bucket_cap=FUNNEL_BUCKET_CAP,
    )
    survivors = {r["doc_id"] for r in funnel["result"].collect()}
    for r in edges.collect():
        assert not (
            r["id_a"] in survivors and r["id_b"] in survivors
        ), (r["id_a"], r["id_b"])


def test_funnel_packing_is_exact_prefix_sum(funnel):
    rows = sorted(funnel["result"].collect(), key=lambda r: r["doc_id"])
    run = 0
    for r in rows:
        assert r["start_offset"] == run
        assert r["seq_id"] == run // PACK_BUDGET
        assert r["phase"] in (1, 2, 3, 4)
        run += r["n_tokens"]
    assert run == funnel["tokens_train"]
    assert funnel["n_sequences"] == (run + PACK_BUDGET - 1) // PACK_BUDGET


def test_funnel_is_deterministic(spark, funnel):
    again = training_funnel(spark, SF)
    assert again["counts"] == funnel["counts"]
    assert again["weights"] == funnel["weights"]
    assert again["tokens_train"] == funnel["tokens_train"]


def test_funnel_composed_plan_reuses_persisted_stages(funnel):
    """The final packed frame must read the persisted train pool — zero
    parquet rescans of the corpus at the top level of its plan (every
    stage feeds the next through a persist point; InMemoryRelation
    blocks below an InMemoryTableScan print the cache's RECIPE, which
    never re-executes, so the assertion stops at the first one) and no
    Exchange SinglePartition (the packing prefix-sum is two-phase,
    never a global window)."""
    plan = (
        funnel["result"]._jdf.queryExecution().executedPlan().toString()
    )
    head = plan.split("InMemoryRelation", 1)[0]
    assert "InMemoryTableScan" in head
    assert "FileScan" not in head
    assert "Exchange SinglePartition" not in head


def test_funnel_empty_corpus_returns_empty_packed_frame(spark, tmp_path):
    """An input that drains the train pool (here: an empty documents
    table) must return zero totals and a schema-stable empty packed
    frame, not crash in the packing stage's int(min/max) casts."""
    d = str(tmp_path / "sf_empty")
    spark.createDataFrame(
        [],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).write.parquet(f"{d}/documents.parquet")
    r = training_funnel(spark, d)
    assert r["counts"]["train"] == 0
    assert r["tokens_train"] == 0 and r["n_sequences"] == 0
    assert r["result"].columns == [
        "doc_id",
        "phase",
        "n_tokens",
        "start_offset",
        "seq_id",
    ]
    assert r["result"].count() == 0
