"""Dedup-aware sampling weights (operators/cluster_weights.py)."""

from __future__ import annotations

from collections import Counter

from data_ingestion_from_multiple_directories_linux_spark.operators.cluster_weights import (
    cluster_sampling_weights,
)
from data_ingestion_from_multiple_directories_linux_spark.operators.dedup import (
    duplicate_clusters,
)

SF = "/root/testdata/sf0.001"


def test_weights_are_inverse_cluster_size(spark):
    """Every document labeled; weight == 1000 div cluster_size; cluster
    sizes consistent with the member counts; singletons weigh 1000; a
    cluster's total weight is 1000 minus only truncation loss."""
    rows = cluster_sampling_weights(spark, SF).collect()
    assert rows
    sizes = Counter(r["cluster_id"] for r in rows)
    multi = 0
    for r in rows:
        assert r["cluster_size"] == sizes[r["cluster_id"]]
        assert r["weight_milli"] == 1000 // r["cluster_size"]
        if r["cluster_size"] == 1:
            assert r["weight_milli"] == 1000
        else:
            multi += 1
        total = r["cluster_size"] * (1000 // r["cluster_size"])
        assert 1000 - r["cluster_size"] < total <= 1000
    assert multi > 0  # the twin families guarantee real clusters


def test_labels_match_duplicate_clusters(spark):
    """The weights operator's labeling is EXACTLY the duplicate_clusters
    assignment on clustered docs (same pairs, same closure), extended by
    singleton self-labels for everything unclustered."""
    w = {
        r["doc_id"]: r["cluster_id"]
        for r in cluster_sampling_weights(spark, SF).collect()
    }
    c = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(spark, SF).collect()
    }
    for d, cid in c.items():
        assert w[d] == cid
    for d, cid in w.items():
        if d not in c:
            assert cid == d  # unclustered -> own singleton
