"""Dedup-aware sampling weights: soft dedup by inverse cluster size.

Hard dedup (dedup_materialize_canonical, L-series dedup family) KEEPS
one document per near-dup cluster and drops the rest. Large-scale
training pipelines often want the soft alternative instead: keep every
document but DOWNWEIGHT duplicates so each distinct item contributes
equal sampling mass — near-dup cluster of size k ⇒ each member sampled
with weight 1/k (the reweighting used by semantic-dedup training
studies as the non-destructive counterpart of dropping; it preserves
in-cluster variation — typo fixes, formatting variants — that hard
dedup throws away, while removing the duplication bias).

This operator composes the existing machinery end-to-end: the
inverted-index Jaccard pair generation and the iterative
connected-components closure (operators/dedup.py — imported, so the
oracle replays the identical pairs through the identical recursive-CTE
closure), then labels EVERY corpus document (unclustered docs are
their own singleton cluster) and emits integer permille weights
1000 div cluster_size.

Scale shape: pair generation dominates and is bucketed (df-cap
inverted index); the closure iterates over the edge set only; the
final labeling is one left hash join of the corpus ids against the
(small) component frame plus a cluster-id-keyed count — no new wide
stage over text.

Reference parity: none; SURVEY §2.12a additive (L166).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import (
    CLUSTER_CORPUS_SQL,
    JACCARD_CLUSTER_THRESHOLD,
    _cluster_corpus,
    _jaccard_inverted_index_sql,
    connected_components,
    jaccard_pairs,
)
from .registry import query


def _weights_oracle_sql() -> str:
    pairs = _jaccard_inverted_index_sql(
        CLUSTER_CORPUS_SQL, 4, JACCARD_CLUSTER_THRESHOLD
    )
    return f"""
    WITH RECURSIVE
    pairq AS ({pairs}),
    und AS (
        SELECT id_a AS node, id_b AS peer FROM pairq
        UNION ALL
        SELECT id_b AS node, id_a AS peer FROM pairq
    ),
    reach(node, lbl) AS (
        SELECT node, node FROM (SELECT DISTINCT node FROM und)
        UNION
        SELECT u.node, r.lbl FROM und u JOIN reach r ON r.node = u.peer
    ),
    comp AS (SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
    lab AS (
        SELECT d.doc_id,
               CAST(COALESCE(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
        FROM ({CLUSTER_CORPUS_SQL}) d LEFT JOIN comp c ON d.doc_id = c.node
    ),
    sz AS (
        SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
        FROM lab GROUP BY cluster_id
    )
    SELECT l.doc_id, l.cluster_id, s.cluster_size,
           CAST(1000 // s.cluster_size AS BIGINT) AS weight_milli
    FROM lab l JOIN sz s ON l.cluster_id = s.cluster_id
    """


@query("cluster_sampling_weights", oracle=_weights_oracle_sql())
def cluster_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id, cluster_size, weight_milli) for EVERY
    document in the cluster corpus: near-dup cluster members carry
    weight 1000 div cluster_size permille, unclustered documents are
    singleton clusters at weight 1000 — Σ weight over a cluster ≈ 1000,
    so duplication stops biasing the sampling distribution without
    dropping any row (soft dedup). Pairs and closure are the exact
    duplicate_clusters machinery; the division is integer permille over
    size ≥ 1 (truncating div == flooring div on non-negatives — the
    cross-engine rule)."""
    corpus = _cluster_corpus(spark, sf_dir)
    edges = jaccard_pairs(corpus, 4, JACCARD_CLUSTER_THRESHOLD)
    comp = connected_components(edges).select(
        F.col("node").alias("doc_id"), "cluster_id"
    )
    # two consumers (the size aggregate and the returned join) read the
    # labels frame; pin it once — a 2-column (doc_id, cluster_id) frame
    # is the artifact a dedup pipeline persists anyway, and leaving it
    # lazy re-runs the corpus scan + label join per consumer
    lab = (
        corpus.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").cast("long").alias("cluster_id"),
        )
        .localCheckpoint(eager=True)
    )
    sz = lab.groupBy("cluster_id").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return lab.join(sz, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        F.expr("CAST(1000 div cluster_size AS BIGINT)").alias("weight_milli"),
    )
