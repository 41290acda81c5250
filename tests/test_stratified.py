"""Exact-quota stratified sampling (operators/stratified.py)."""

from __future__ import annotations

import hashlib
from collections import Counter

from data_ingestion_from_multiple_directories_linux_spark.catalog import load_table
from data_ingestion_from_multiple_directories_linux_spark.operators.stratified import (
    SAMPLE_TOTAL,
    stratified_sample_exact,
)

SF = "/root/testdata/sf0.001"


def test_quotas_are_exact_largest_remainder(spark):
    """Σ quota == SAMPLE_TOTAL exactly, and every stratum's quota is
    within 1 of its exact proportional share (the apportionment law
    float rounding cannot give)."""
    docs = [
        (r["doc_id"], r["lang"] or "")
        for r in load_table(spark, SF, "documents")
        .select("doc_id", "lang")
        .collect()
        if r["doc_id"] is not None
    ]
    counts = Counter(s for _, s in docs)
    total = sum(counts.values())

    rows = stratified_sample_exact(spark, SF).collect()
    quota = {}
    for r in rows:
        quota[r["stratum"]] = r["quota"]
    assert sum(quota.values()) == SAMPLE_TOTAL
    for s, q in quota.items():
        exact = SAMPLE_TOTAL * counts[s] / total
        assert abs(q - exact) < 1
    # sampled counts equal the quotas (corpus is bigger than the sample)
    got = Counter(r["stratum"] for r in rows)
    assert dict(got) == {s: q for s, q in quota.items() if q > 0}


def test_sample_matches_pure_python_replay(spark):
    """Full replay: largest-remainder quotas over stratum counts, then
    the md5-hex-ranked prefix per stratum."""
    docs = [
        (r["doc_id"], r["lang"] or "")
        for r in load_table(spark, SF, "documents")
        .select("doc_id", "lang")
        .collect()
        if r["doc_id"] is not None
    ]
    counts = Counter(s for _, s in docs)
    total = sum(counts.values())
    base = {s: SAMPLE_TOTAL * c // total for s, c in counts.items()}
    rem = {s: SAMPLE_TOTAL * c % total for s, c in counts.items()}
    extra = SAMPLE_TOTAL - sum(base.values())
    order = sorted(counts, key=lambda s: (-rem[s], s))
    quota = {
        s: base[s] + (1 if i < extra else 0) for i, s in enumerate(order)
    }

    def h(d):
        return hashlib.md5(str(d).encode()).hexdigest()

    expect = set()
    for s in counts:
        ranked = sorted((d for d, st in docs if st == s), key=lambda d: (h(d), d))
        for i, d in enumerate(ranked[: quota[s]], start=1):
            expect.add((s, d, i, quota[s]))

    got = {
        (r["stratum"], r["doc_id"], r["rank_in_stratum"], r["quota"])
        for r in stratified_sample_exact(spark, SF).collect()
    }
    assert got == expect


def test_small_stratum_contributes_all_rows(spark, tmp_path):
    """A corpus smaller than the sample budget: every row samples, no
    crash, quotas still sum to SAMPLE_TOTAL (unfillable quota is fine —
    the apportionment is over counts, not a row guarantee)."""
    d = str(tmp_path / "tiny")
    spark.createDataFrame(
        [(1, "t", "en", "s", 1), (2, "t", "fr", "s", 1), (3, "t", None, "s", 1)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(f"{d}/documents.parquet")
    rows = stratified_sample_exact(spark, d).collect()
    assert {r["doc_id"] for r in rows} == {1, 2, 3}
    assert {r["stratum"] for r in rows} == {"en", "fr", ""}  # NULL -> ''
    assert sum({r["stratum"]: r["quota"] for r in rows}.values()) == SAMPLE_TOTAL
