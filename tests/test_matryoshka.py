"""Matryoshka truncation recall eval (operators/matryoshka.py)."""

from __future__ import annotations

import math

from data_ingestion_from_multiple_directories_linux_spark.catalog import load_table
from data_ingestion_from_multiple_directories_linux_spark.operators.matryoshka import (
    MRL_K,
    MRL_TRUNC_DIM,
    matryoshka_recall_eval,
)
from test_annrecall import anchor_ids

SF = "/root/testdata/sf0.001"


def _cos_q(a, b):
    dot = sum(math.floor(x * y * 1e9) for x, y in zip(a, b))
    na = sum(math.floor(x * x * 1e9) for x in a)
    nb = sum(math.floor(x * x * 1e9) for x in b)
    return float(dot) / math.sqrt(float(na) * float(nb))


def test_matches_pure_python_replay(spark):
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load_table(spark, SF, "embeddings").collect()
        if r["embedding"] is not None
        and len(r["embedding"]) == 64
        and all(x is not None and math.isfinite(x) for x in r["embedding"])
    }
    expect = {}
    for qid in anchor_ids(vecs.keys()):
        qv = vecs[qid]
        qt = qv[:MRL_TRUNC_DIM]
        full, trunc = [], []
        for vid, v in vecs.items():
            if vid == qid:
                continue
            full.append((-_cos_q(v, qv), vid))
            trunc.append((-_cos_q(v[:MRL_TRUNC_DIM], qt), vid))
        top_full = {vid for _, vid in sorted(full)[:MRL_K]}
        top_trunc = {vid for _, vid in sorted(trunc)[:MRL_K]}
        n = len(top_full & top_trunc)
        expect[qid] = (n, 1000 * n // len(top_full))

    got = {
        r["query_id"]: (r["n_overlap"], r["recall_permille"])
        for r in matryoshka_recall_eval(spark, SF).collect()
    }
    assert got == expect and got
    # the eval is informative on this corpus: recall neither 0 nor
    # perfect everywhere (truncation loses SOMETHING but not everything)
    vals = [n for n, _ in got.values()]
    assert any(v < MRL_K for v in vals)
    assert any(v > 0 for v in vals)


def test_identical_prefixes_give_full_recall(spark, tmp_path):
    """Vectors whose information lives entirely in the first
    MRL_TRUNC_DIM dims (zeros elsewhere): the truncated ranking is the
    full ranking, recall 1000 for every query."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(40):
        head = [rng.uniform(-1, 1) for _ in range(MRL_TRUNC_DIM)]
        rows.append((i, head + [0.0] * (64 - MRL_TRUNC_DIM), i % 3))
    d = str(tmp_path / "mrl")
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.parquet(f"{d}/embeddings.parquet")
    got = matryoshka_recall_eval(spark, d).collect()
    assert got and all(r["recall_permille"] == 1000 for r in got)
