"""Shingle novelty scoring (operators/novelty.py)."""

from __future__ import annotations

from collections import Counter

from data_ingestion_from_multiple_directories_linux_spark.catalog import load_table
from data_ingestion_from_multiple_directories_linux_spark.operators.novelty import (
    NOVELTY_NGRAM,
    shingle_novelty_scores,
)

SF = "/root/testdata/sf0.001"


def _shingle_set(text: str, n: int) -> list[str]:
    toks = [t for t in text.lower().split() if t]
    if len(toks) < n:
        return []
    seen, out = set(), []
    for i in range(len(toks) - n + 1):
        s = " ".join(toks[i : i + n])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def test_matches_pure_python_replay(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF, "documents").collect()
        if r["doc_id"] is not None
    }
    sets = {
        d: _shingle_set(t or "", NOVELTY_NGRAM) for d, t in docs.items()
    }
    sets = {d: s for d, s in sets.items() if s}
    df = Counter(s for ss in sets.values() for s in ss)
    expect = {}
    for d, ss in sets.items():
        uniq = sum(1 for s in ss if df[s] == 1)
        expect[d] = (len(ss), uniq, 1000 * uniq // len(ss))
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_unique"], r["novelty_permille"])
        for r in shingle_novelty_scores(spark, SF).collect()
    }
    assert got == expect and got


def test_boilerplate_scores_zero_and_unique_scores_full(spark, tmp_path):
    """Two identical template docs (every shingle shared -> 0 permille),
    one fully unique doc (1000), one too-short doc (dropped)."""
    d = str(tmp_path / "nv")
    boiler = "all rights reserved contact the publisher for permissions"
    uniq = "zebra quark nebula sprocket violet harpoon glacier"
    spark.createDataFrame(
        [
            (1, boiler, "en", "s", 1),
            (2, boiler, "en", "s", 1),
            (3, uniq, "en", "s", 1),
            (4, "too short", "en", "s", 1),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(f"{d}/documents.parquet")
    got = {
        r["doc_id"]: r["novelty_permille"]
        for r in shingle_novelty_scores(spark, d).collect()
    }
    assert got == {1: 0, 2: 0, 3: 1000}
