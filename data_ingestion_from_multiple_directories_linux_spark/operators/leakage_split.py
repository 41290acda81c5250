"""Leakage-safe dataset splitting (near-dup-cluster-aware).

`dataset_split_assign` (operators/corpus.py, L30) hashes the DOCUMENT
id into train/val/test — deterministic and growth-stable, but blind to
near-duplicates: two mutated copies of one page hash independently, so
one lands in train and the other in test, and the eval set silently
measures memorization (the leakage GPT-3/Llama-class corpus pipelines
guard against by splitting on the duplicate CLUSTER, not the
document).

This operator is that guard, composed from certified pieces: the L3
pair generation + L3b connected components produce the duplicate
clusters (operators/dedup.py, reused — same corpus, same threshold, so
this split can never disagree with `duplicate_clusters` about who is
whose duplicate), every document takes its component's min-id as its
REPRESENTATIVE (itself when unclustered), and the md5 split rule of
L30 is applied to the representative. All members of a cluster
therefore share a split by construction — no near-dup pair can
straddle train/test (pytest pins this, and pins that the naive
document-id split DOES straddle on the same corpus — the failure mode
this operator exists to close).

At 100 TB: pair generation dominates (bucketed inverted index / LSH);
the closure iterates hash-partitioned joins over the much smaller edge
set; representative assignment is one left join; the split itself is a
pure projection. Adding documents later never moves an existing
singleton's split (the L30 stability property), and only merges —
never splits — clusters, so re-running after ingest can only pull
more docs onto the SAME side as their duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .corpus import SPLIT_TRAIN_BELOW, SPLIT_VAL_BELOW
from .dedup import (
    CLUSTER_CORPUS_SQL,
    JACCARD_CLUSTER_THRESHOLD,
    _cluster_corpus,
    _clusters_oracle_sql,
    connected_components,
    jaccard_pairs,
)
from .registry import query


def cluster_safe_split(corpus: DataFrame, edges: DataFrame) -> DataFrame:
    """(doc_id, rep, split) over ``corpus(doc_id, …)``: every document
    mapped to its duplicate-cluster representative (component min id
    from ``edges``; itself when unclustered) and the L30 md5 split rule
    applied to the representative — so a cluster is always entirely
    inside one split."""
    comp = connected_components(edges).withColumnRenamed("node", "doc_id")
    rep = corpus.select("doc_id").join(comp, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("rep"),
    )
    h = F.substring(F.md5(F.col("rep").cast("string").cast("binary")), 1, 1)
    return rep.select(
        "doc_id",
        F.col("rep").cast("long").alias("rep"),
        F.when(h < SPLIT_TRAIN_BELOW, "train")
        .when(h < SPLIT_VAL_BELOW, "val")
        .otherwise("test")
        .alias("split"),
    )


def _oracle_split_sql() -> str:
    # the recursive-CTE closure is _clusters_oracle_sql verbatim (same
    # corpus, same threshold); this oracle only adds the representative
    # join + the L30 md5 rule on the representative.
    clusters = _clusters_oracle_sql().strip()
    assert clusters.startswith("WITH RECURSIVE")
    body = clusters[len("WITH RECURSIVE") :].rsplit("SELECT node AS doc_id", 1)
    return f"""
    WITH RECURSIVE {body[0]},
    comp AS (
        SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node
    ),
    corpus AS ({CLUSTER_CORPUS_SQL}),
    rep AS (
        SELECT c.doc_id, COALESCE(k.cluster_id, c.doc_id) AS rep
        FROM corpus c LEFT JOIN comp k ON k.node = c.doc_id
    )
    SELECT doc_id, CAST(rep AS BIGINT) AS rep,
           CASE WHEN substr(md5(CAST(rep AS VARCHAR)), 1, 1)
                     < '{SPLIT_TRAIN_BELOW}' THEN 'train'
                WHEN substr(md5(CAST(rep AS VARCHAR)), 1, 1)
                     < '{SPLIT_VAL_BELOW}' THEN 'val'
                ELSE 'test' END AS split
    FROM rep
    """


@query("leakage_safe_split", oracle=_oracle_split_sql())
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware train/val/test assignment over the two-generation
    duplicate corpus: (doc_id, rep, split), where rep is the duplicate
    cluster's min doc_id (itself for singletons) and the split hashes
    the rep — no near-dup pair straddles train/test (pytest-pinned
    against the naive doc-id split, which does straddle here)."""
    corpus = _cluster_corpus(spark, sf_dir)
    edges = jaccard_pairs(corpus, 4, JACCARD_CLUSTER_THRESHOLD)
    return cluster_safe_split(corpus, edges)
