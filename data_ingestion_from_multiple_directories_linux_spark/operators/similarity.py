"""Embedding similarity search over ``embeddings`` (LLM-pipeline operators).

* **Brute-force cosine top-k** — the exact baseline: one scan, JVM-side
  zip_with/aggregate dot products, TakeOrderedAndProject. O(n·d) per
  query with zero shuffle of the embedding table — the right shape when
  k and the query batch are small.
* **IVF-bucketed near-duplicate pairs** — the scale path: assign every
  vector to its nearest of K fixed centroids (one broadcast join), then
  search pairs *within cells only* (nprobe=1). Recall < 1 by design at
  cell boundaries — the standard IVF tradeoff — and the DuckDB oracle
  replicates the same assignment, so correctness is checked exactly.

Determinism: all dot products / norms use the quantized-integer
accumulation of functions.vectors (sum(floor(x*y*1e9)) over BIGINT) so
Spark and DuckDB produce bit-identical cosines; see that module's
docstring.

The embedding corpus is near-orthogonal random (max natural cosine ~0.5),
so the near-dup query synthesizes duplicates deterministically:
vec_id % 5 == 0 → a perturbed copy at vec_id + 10000
(v_i + 0.02·((i mod 7) - 3), cosine ~0.97 to its source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.vectors import (
    cosine_q,
    dot_q,
    norm_sq_q,
    sql_cosine_q,
    sql_dot_q,
    sql_norm_sq_q,
    to_double_array,
)
from .registry import query

TOP_K = 20
QUERY_VEC_ID = 0
#: K follows the √n rule (~√6000 at bench scale); more cells = smaller
#: quadratic term per cell, balanced against K assignment dots per vector.
N_CENTROIDS = 32
NEAR_DUP_COSINE = 0.8

#: DuckDB: embeddings as double lists
E_SQL = (
    "SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v "
    "FROM embeddings"
)

#: corpus with synthesized near-duplicate vectors (both engines build it)
VEC_CORPUS_SQL = f"""
    SELECT vec_id, v FROM ({E_SQL})
    UNION ALL
    SELECT vec_id + 10000 AS vec_id,
           list_transform(range(len(v)),
                          i -> v[i+1] + CAST(0.02 AS DOUBLE) * ((i % 7) - 3)) AS v
    FROM ({E_SQL}) WHERE vec_id % 5 = 0
"""


# ---------------------------------------------------------------------------
# Brute-force cosine top-k (exact baseline)
# ---------------------------------------------------------------------------


@query(
    "cosine_topk",
    oracle=f"""
    WITH e AS ({E_SQL}),
    q AS (SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID})
    SELECT e.vec_id, e.label,
           {sql_cosine_q(sql_dot_q('e.v', 'q.qv'),
                         sql_norm_sq_q('e.v'),
                         sql_norm_sq_q('q.qv'))} AS cosine
    FROM e, q
    WHERE e.vec_id <> {QUERY_VEC_ID}
    ORDER BY cosine DESC, e.vec_id
    LIMIT {TOP_K}
    """,
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for one query vector (brute force).

    The query vector is broadcast (a 1-row crossJoin — no driver
    collect); every partition scores its rows with codegen'd
    zip_with/aggregate and the plan ends in TakeOrderedAndProject
    (per-partition heap + driver merge of k rows). At 100 TB this scans
    once with zero shuffle of the table — the exact-search baseline the
    IVF path is measured against.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_array("embedding").alias("v")
    )
    qv = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("v").alias("qv"))
    scored = e.filter(F.col("vec_id") != QUERY_VEC_ID).crossJoin(F.broadcast(qv))
    cos = cosine_q(dot_q("v", "qv"), norm_sq_q("v"), norm_sq_q("qv"))
    return (
        scored.select("vec_id", "label", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
    )


# ---------------------------------------------------------------------------
# IVF-bucketed near-duplicate pairs (the ANN scale path)
# ---------------------------------------------------------------------------


def _assign_cells(corpus: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment (nprobe=1): broadcast the K centroids,
    score K cosines per vector, keep the argmax (ties → smallest cid).
    Norms are computed once per vector/centroid and carried along — the
    pair stage reuses ``nv`` instead of recomputing norms per pair."""
    scored = corpus.crossJoin(F.broadcast(centroids))
    cos = cosine_q(dot_q("v", "cv"), F.col("nv"), F.col("ncv"))
    ranked = scored.select(
        "vec_id", "v", "nv", F.col("cid"), cos.alias("ccos")
    ).withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cid"))
        ),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "vec_id", "v", "nv", F.col("cid").alias("cell")
    )


@query(
    "embedding_near_dup_ivf",
    oracle=f"""
    WITH corpus AS (
        SELECT vec_id, v, {sql_norm_sq_q('v')} AS nv FROM ({VEC_CORPUS_SQL})
    ),
    cent AS (SELECT vec_id AS cid, v AS cv, {sql_norm_sq_q('v')} AS ncv
             FROM ({E_SQL}) WHERE vec_id < {N_CENTROIDS}),
    scored AS (
        SELECT corpus.vec_id, corpus.v, corpus.nv, cent.cid,
               {sql_cosine_q(sql_dot_q('corpus.v', 'cent.cv'),
                             'corpus.nv', 'cent.ncv')} AS ccos
        FROM corpus, cent
    ),
    assigned AS (
        SELECT vec_id, v, nv, cid AS cell
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                           ORDER BY ccos DESC, cid) AS rn
              FROM scored)
        WHERE rn = 1
    ),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cell AS cell,
               {sql_cosine_q(sql_dot_q('a.v', 'b.v'), 'a.nv', 'b.nv')} AS cosine
        FROM assigned a JOIN assigned b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cell, cosine FROM pairs
    WHERE cosine >= {NEAR_DUP_COSINE}
    """,
)
def embedding_near_dup_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs (cosine >= 0.8) via IVF blocking.

    Vectors are assigned to their nearest of K=8 fixed centroids (the
    first 8 base embeddings — deterministic stand-ins for trained
    k-means centroids); pair search runs within cells only. The
    pair-join is hash-partitioned on the cell, so the quadratic term is
    n²/K per cell instead of n² global; K grows with corpus size (√n
    rule) at scale, and nprobe>1 trades compute for boundary recall.
    The oracle replicates the identical assignment, so the entry is an
    exact check of the full IVF pipeline, not a recall estimate.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    mut = e.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform(
            "v", lambda x, i: x + F.lit(0.02) * (i % 7 - 3).cast("double")
        ).alias("v"),
    )
    corpus = e.unionByName(mut).withColumn("nv", norm_sq_q("v"))
    centroids = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cid"),
        F.col("v").alias("cv"),
        norm_sq_q("v").alias("ncv"),
    )
    # assigned feeds both sides of the pair join — persist so the
    # assignment chain (K cosines per vector + argmax window) runs once
    assigned = _assign_cells(corpus, centroids).persist()

    a = assigned.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"),
        F.col("nv").alias("na"), "cell",
    )
    b = assigned.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"),
        F.col("nv").alias("nb"), F.col("cell").alias("cell_b"),
    )
    pairs = a.join(
        b, (F.col("cell") == F.col("cell_b")) & (F.col("id_a") < F.col("id_b"))
    )
    cos = cosine_q(dot_q("va", "vb"), F.col("na"), F.col("nb"))
    return (
        pairs.select("id_a", "id_b", "cell", cos.alias("cosine"))
        .filter(F.col("cosine") >= NEAR_DUP_COSINE)
    )
