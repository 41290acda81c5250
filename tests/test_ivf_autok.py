"""Auto-K IVF near-dup pairs (operators/ivf_autok.py, L173)."""

from __future__ import annotations

import math

from data_ingestion_from_multiple_directories_linux_spark.operators.ivf_autok import (
    embedding_near_dup_ivf_autok,
)
from data_ingestion_from_multiple_directories_linux_spark.operators.similarity import (
    NEAR_DUP_COSINE,
    _vec_corpus,
    choose_k,
    load_embeddings,
)

SF = "/root/testdata/sf0.001"


def test_autok_pairs_are_exact_and_k_follows_sqrt_rule(spark):
    """Every returned pair must be a true near-duplicate (quantized
    cosine ≥ threshold, recomputed in pure Python), k_cells must equal
    choose_k(corpus size), the planted twins must be substantially
    recovered, and the synth offset must be corpus-derived."""
    base = load_embeddings(spark, SF).select("vec_id").collect()
    n_base = len(base)
    max_id = max(r["vec_id"] for r in base)
    n_planted = sum(1 for r in base if r["vec_id"] % 5 == 0)
    n_corpus = n_base + n_planted
    k_want = choose_k(n_corpus)

    rows = embedding_near_dup_ivf_autok(spark, SF).collect()
    assert rows
    assert all(r["k_cells"] == k_want for r in rows)

    # corpus-derived offset: planted ids start at max(vec_id)+1, so the
    # recovered planted pairs are exactly (i, max_id+1+i)
    off = max_id + 1
    planted_found = {
        r["id_a"]
        for r in rows
        if r["id_b"] == r["id_a"] + off and r["id_a"] % 5 == 0
    }
    assert len(planted_found) > n_planted // 2  # IVF boundary loss only

    # exactness: recompute every returned pair's quantized cosine —
    # the same corpus construction the operator uses, offset included
    vecs = {}
    for r in _vec_corpus(spark, SF).collect():
        vecs[r["vec_id"]] = [float(x) for x in r["v"]]
    # _vec_corpus plants at +10000; autok plants at +off — remap
    remapped = {}
    for vid, v in vecs.items():
        remapped[vid if vid < 10000 else vid - 10000 + off] = v

    def cos_q(a, b):
        dot = sum(math.floor(x * y * 1e9) for x, y in zip(a, b))
        na = sum(math.floor(x * x * 1e9) for x in a)
        nb = sum(math.floor(x * x * 1e9) for x in b)
        return float(dot) / math.sqrt(float(na) * float(nb))

    for r in rows:
        assert r["id_a"] < r["id_b"]
        c = cos_q(remapped[r["id_a"]], remapped[r["id_b"]])
        assert c >= NEAR_DUP_COSINE
        assert abs(c - r["cosine"]) < 1e-12
