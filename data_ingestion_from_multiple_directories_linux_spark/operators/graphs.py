"""Graph analytics over the near-duplicate candidate graph
(SURVEY.md §2.12a).

``duplicate_clusters`` (operators/dedup.py) labels the CONNECTED
COMPONENTS of the near-dup graph; triangle enumeration is the next
graph primitive a dedup/quality pipeline wants: a pair that closes
into triangles is corroborated by independent evidence (three mutually
similar documents), while a bridge edge with no closing third vertex
is the classic false-positive shape (shared boilerplate between
otherwise-unrelated docs). Triangle density per component is also the
standard cluster-quality diagnostic (how clique-like are the dup
groups the threshold produces?).

The implementation is the canonical distributed triangle enumeration:
orient every edge small-id → large-id (each triangle then has exactly
ONE wedge whose center is the middle vertex, so no dedup pass is
needed), build wedges with one self-join, close them with a second
join against the edge set. Both joins are hash equi-joins on vertex
ids. At web scale the refinement is degree orientation (orient toward
the higher-degree endpoint, bounding per-vertex wedge fan-out by
O(sqrt(m)) — Cohen's MapReduce triangle counting); id orientation
keeps the enumeration oracle-identical here and the join structure is
the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import (
    CLUSTER_CORPUS_SQL,
    JACCARD_CLUSTER_THRESHOLD,
    _cluster_corpus,
    _jaccard_inverted_index_sql,
    jaccard_pairs,
)
from .registry import query

_PAIRS_SQL = _jaccard_inverted_index_sql(
    CLUSTER_CORPUS_SQL, 4, JACCARD_CLUSTER_THRESHOLD
)


@query(
    "near_dup_triangles",
    oracle=f"""
    WITH pairs AS ({_PAIRS_SQL}),
    e AS (SELECT id_a, id_b FROM pairs)
    SELECT e1.id_a AS id_a, e1.id_b AS id_b, e2.id_b AS id_c
    FROM e e1
    JOIN e e2 ON e2.id_a = e1.id_b
    JOIN e e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
    ORDER BY id_a, id_b, id_c
    """,
)
def near_dup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every triangle (a < b < c, mutually near-duplicate) in the
    cluster-corpus candidate graph.

    Scale plan: the pair frame is the SAME inverted-index machinery as
    duplicate_clusters (bucketed, df-capped — no all-pairs stage
    anywhere); edges arrive id-oriented (id_a < id_b) from pair
    generation, so the wedge self-join on the middle vertex
    (e1.id_b = e2.id_a) enumerates each candidate triangle exactly
    once, and the closing join checks (a, c) membership against the
    edge set — two hash joins, shuffled on vertex ids, wedge fan-out
    bounded by the df_cap that already bounds per-shingle buckets. The
    edge frame is localCheckpointed once and reused by all three join
    legs instead of re-deriving the pair subplan three times."""
    edges = (
        jaccard_pairs(
            _cluster_corpus(spark, sf_dir), 4, JACCARD_CLUSTER_THRESHOLD
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    e1 = edges.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    e2 = edges.select(F.col("id_a").alias("b2"), F.col("id_b").alias("c"))
    e3 = edges.select(F.col("id_a").alias("a3"), F.col("id_b").alias("c3"))
    wedges = e1.join(e2, F.col("b") == F.col("b2"))
    return (
        wedges.join(
            e3,
            (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")),
            "left_semi",
        )
        .select(
            F.col("a").alias("id_a"),
            F.col("b").alias("id_b"),
            F.col("c").alias("id_c"),
        )
        .orderBy("id_a", "id_b", "id_c")
    )


# ---------------------------------------------------------------------------
# Recursive contamination spread (WITH RECURSIVE — Spark 4 SQL surface)
# ---------------------------------------------------------------------------

SPREAD_MAX_HOPS = 3
#: seed rule: every 21st base document (a subset of the %7 mutated
#: family, so some seeds have near-dup descendants and most docs don't)
SPREAD_SEED_MOD = 21


def _spread_recursion_sql(pairs: str, seeds: str, extra_ctes: str = "") -> str:
    """The depth-bounded transitive walk — IDENTICAL text in Spark and
    DuckDB (both support WITH RECURSIVE; Spark 4.1 restricts the
    recursive leg to UNION ALL, so the walk bounds depth and dedups
    AFTER the recursion — which also makes path enumeration finite on
    this cyclic, undirected graph). ``extra_ctes`` lets the oracle
    prepend its corpus/pair CTEs under the same single WITH RECURSIVE
    clause (a second nested WITH would be a parse error)."""
    return f"""
    WITH RECURSIVE
    {extra_ctes}
    und AS (
        SELECT id_a AS node, id_b AS peer FROM {pairs}
        UNION ALL
        SELECT id_b AS node, id_a AS peer FROM {pairs}
    ),
    walk(node, depth) AS (
        SELECT doc_id, 0 FROM {seeds}
        UNION ALL
        SELECT u.peer, w.depth + 1
        FROM walk w JOIN und u ON u.node = w.node
        WHERE w.depth < {SPREAD_MAX_HOPS}
    )
    SELECT node AS doc_id, CAST(MIN(depth) AS BIGINT) AS hops
    FROM walk
    GROUP BY node
    """


@query(
    "contamination_spread",
    oracle=_spread_recursion_sql(
        "pairq",
        "seedq",
        extra_ctes=f"""
    corpus AS ({CLUSTER_CORPUS_SQL}),
    pairq AS ({_PAIRS_SQL}),
    seedq AS (
        SELECT doc_id FROM corpus
        WHERE doc_id % {SPREAD_SEED_MOD} = 0 AND doc_id < 10000
    ),""",
    ),
)
def contamination_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive benchmark contamination: every document within
    {SPREAD_MAX_HOPS} near-dup hops of a seed (benchmark) document,
    with its hop distance — run as a Spark ``WITH RECURSIVE`` SQL walk
    over the DataFrame-built near-dup pair graph.

    Single-hop n-gram overlap (benchmark_decontamination) misses the
    CHAIN case: a paraphrase of a paraphrase of an eval item shares no
    long n-gram with the original but sits two near-dup hops away —
    the cluster corpus synthesizes exactly that (gen2 links to the
    original only through gen1). The recursion is the SQL-surface twin
    of connected_components' iterative propagation: each recursion
    level is one hash join of the frontier against the edge list —
    the same physical shape the DataFrame loop runs, with Catalyst
    managing the iteration instead of the driver. Depth is bounded
    (UNION ALL legs enumerate paths, not visited-sets, so unbounded
    depth on a cyclic graph would not terminate); MIN(depth) after the
    recursion collapses the path multiset to per-doc hop distance.

    At 100 TB: frontier joins are hash-partitioned on node id like any
    CC round; the bounded depth caps the blowup on high-degree
    components the same way the star-contraction alternative caps
    round count — and a df_cap'd pair graph (jaccard_pairs' guard)
    keeps boilerplate hubs out of the walk entirely."""
    corpus = _cluster_corpus(spark, sf_dir)
    pairs = jaccard_pairs(corpus, 4, JACCARD_CLUSTER_THRESHOLD).localCheckpoint(
        eager=True
    )
    pairs.createOrReplaceTempView("__spread_pairs")
    corpus.filter(
        (F.col("doc_id") % SPREAD_SEED_MOD == 0) & (F.col("doc_id") < 10000)
    ).select("doc_id").createOrReplaceTempView("__spread_seeds")
    return spark.sql(_spread_recursion_sql("__spread_pairs", "__spread_seeds"))
