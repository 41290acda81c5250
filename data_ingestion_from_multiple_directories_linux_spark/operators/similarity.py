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


# ---------------------------------------------------------------------------
# Random-hyperplane LSH near-duplicate pairs (the banded alternative to IVF)
# ---------------------------------------------------------------------------

#: 2 bands × 8 sign bits: a pair is a candidate if ALL bits of either
#: band agree (banding boosts recall exactly as in minhash LSH).
LSH_BANDS = 2
LSH_BITS = 8
#: primes > 7 parameterizing the deterministic hyperplanes (one per bit)
_LSH_P = (11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67, 71)


def _hyperplane_dot_sql(p: int, q: int, spark_side: bool) -> str:
    """Sign-test dot of v with the deterministic hyperplane
    c(i) = ((i*p + q) % 11) - 5, accumulated as exact BIGINTs
    (floor(x*1e9) * int coefficient) so both engines agree bit-for-bit
    regardless of summation order. Modulus 11 deliberately differs from
    the mod-7 pattern that synthesizes the near-dup perturbations — a
    mod-7 hyperplane correlates with that perturbation direction and
    flips signs far more often than a random hyperplane would (measured:
    recall 25% vs the ~67% random-hyperplane theory)."""
    if spark_side:
        return (
            f"aggregate(transform(v, (x, i) -> "
            f"CAST(floor(x * 1000000000) AS BIGINT) * "
            f"CAST(((i * {p} + {q}) % 11) - 5 AS BIGINT)), "
            f"CAST(0 AS BIGINT), (a, y) -> a + y)"
        )
    return (
        f"CAST(list_sum(list_transform(range(len(v)), i -> "
        f"CAST(floor(v[i+1] * 1000000000) AS BIGINT) * "
        f"CAST(((i * {p} + {q}) % 11) - 5 AS BIGINT))) AS BIGINT)"
    )


def _band_sig_sql(band: int, spark_side: bool) -> str:
    bits = []
    for h in range(LSH_BITS):
        p = _LSH_P[band * LSH_BITS + h]
        q = 5 + 3 * (band * LSH_BITS + h)
        dot = _hyperplane_dot_sql(p, q, spark_side)
        bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << h} ELSE 0 END)")
    return " + ".join(bits)


@query(
    "embedding_near_dup_lsh",
    oracle=f"""
    WITH corpus AS (
        SELECT vec_id, v, {sql_norm_sq_q('v')} AS nv,
               {_band_sig_sql(0, False)} AS s0,
               {_band_sig_sql(1, False)} AS s1
        FROM ({VEC_CORPUS_SQL})
    ),
    keys AS (
        SELECT vec_id, v, nv, 0 AS band, s0 AS sig FROM corpus
        UNION ALL
        SELECT vec_id, v, nv, 1 AS band, s1 AS sig FROM corpus
    ),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {sql_cosine_q(sql_dot_q('a.v', 'b.v'), 'a.nv', 'b.nv')} AS cosine
        FROM keys a JOIN keys b
          ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id
    )
    SELECT DISTINCT id_a, id_b, cosine FROM pairs
    WHERE cosine >= {NEAR_DUP_COSINE}
    """,
)
def embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs via random-hyperplane (SimHash-style)
    LSH — the banded alternative to :func:`embedding_near_dup_ivf`.

    Each vector gets 2 band signatures of 8 sign bits (sign of the dot
    with a deterministic hyperplane); candidate pairs share ALL bits of
    at least one band, so the pair join is an equi-join on (band, sig) —
    hash-partitioned buckets, quadratic only within a bucket, recall
    boosted by banding exactly as in minhash LSH. Unlike IVF there is no
    centroid assignment pass: signatures are a pure projection, so the
    only shuffles are the bucket join and the final pair dedup. Sign
    tests accumulate exact BIGINTs (quantized components × integer
    coefficients), so the oracle replicates the bucketing bit-for-bit
    and the entry checks the full pipeline, not a recall estimate.

    At 100 TB: bits/bands scale with corpus size (more bits → smaller
    buckets, more bands → recall), and the signature projection
    parallelizes with the scan — no global pass like k-means training.
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
    corpus = (
        e.unionByName(mut)
        .withColumn("nv", norm_sq_q("v"))
        .withColumn("s0", F.expr(_band_sig_sql(0, True)))
        .withColumn("s1", F.expr(_band_sig_sql(1, True)))
    )
    # keys feeds both sides of the pair join — persist so the 16
    # interpreted sign-test projections run once, not twice
    keys = corpus.select(
        "vec_id", "v", "nv",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band"), F.col("s0").alias("sig")),
                F.struct(F.lit(1).alias("band"), F.col("s1").alias("sig")),
            )
        ).alias("k"),
    ).select("vec_id", "v", "nv", "k.band", "k.sig").persist()
    a = keys.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"),
        F.col("nv").alias("na"), "band", "sig",
    )
    b = keys.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"),
        F.col("nv").alias("nb"), F.col("band").alias("band_b"),
        F.col("sig").alias("sig_b"),
    )
    pairs = a.join(
        b,
        (F.col("band") == F.col("band_b"))
        & (F.col("sig") == F.col("sig_b"))
        & (F.col("id_a") < F.col("id_b")),
    )
    cos = cosine_q(dot_q("va", "vb"), F.col("na"), F.col("nb"))
    return (
        pairs.select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= NEAR_DUP_COSINE)
        .distinct()
    )
