"""Two-stage retrieval: ANN candidate generation + cross-encoder rerank.

The production LLM-retrieval shape (SURVEY.md §2.12a additive surface;
the reference has no retrieval stack — this extends the engine for the
100 TB training-data brief): a cheap first stage retrieves N_CAND
candidates per query from the vector index, then an EXPENSIVE pairwise
model — a cross-encoder, which scores (query, candidate) JOINTLY and
therefore cannot be precomputed per-document — reranks only those
candidates. The cost structure is the whole point at scale:

* stage 1 is the existing ANN machinery (here the exact brute-force
  baseline of ``cosine_topk``; the IVF path swaps in unchanged): one
  scan, quantized JVM dot products, TakeOrderedAndProject — no shuffle
  of the corpus;
* stage 2 touches N_CAND rows per query — O(N_CAND · d), INDEPENDENT
  of corpus size. The model is broadcast; reranking a 100 TB corpus
  costs the same as reranking 50 rows, because only 50 rows reach it.

The cross-encoder here is a deterministic stand-in with the defining
property of the real thing — an interaction term over the PAIR,
``-u_i·|q_i - c_i|``, not factorizable into independent query/doc
encodings — so the oracle can replay it exactly. A production
transformer cross-encoder replaces ``_cross_score_q`` with an
Arrow-batched Pandas UDF over the same bounded candidate frame (the
multimodal decode stubs set the precedent); every other part of the
plan — bounded candidates, broadcast query, rerank-then-topk — is the
real pattern.

Determinism: per-dimension terms are floored into BIGINT milli-space
(``floor(x · 1e9)``) and summed — order-independent, bit-identical in
DuckDB (the functions.vectors convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import (
    SCALE,
    cosine_q,
    dot_q,
    norm_sq_q,
    sql_cosine_q,
    sql_dot_q,
    sql_norm_sq_q,
    to_double_array,
)
from .registry import query
from .similarity import (
    E_SQL,
    EMB_DIM,
    QUERY_VEC_ID,
    TOPK_QUERY_MOD,
    _assign_cells,
    _ivf_train_assign_ctes,
    _trained_centroids,
    _vec_corpus,
    load_embeddings,
)

#: stage-1 candidate count — the knob that bounds stage-2 cost.
N_CAND = 50
#: final reranked result size.
RERANK_K = 10
#: IVF-staged batch variant: per-query candidate / result sizes.
N_CAND_IVF = 16
RERANK_K_IVF = 5


def _w(i: Column) -> Column:
    """Match-weight for dimension i: ((i·37) mod 19 − 9) / 10 — a fixed
    "trained" weight in [-0.9, 0.9], derived from the dimension index so
    both engines synthesize the identical model with no stored
    artifact."""
    return (((i * 37) % 19) - 9).cast("double") / 10.0


def _u(i: Column) -> Column:
    """Mismatch-penalty weight for dimension i: ((i·23) mod 13) / 10."""
    return ((i * 23) % 13).cast("double") / 10.0


def _cross_score_q(qv: Column | str, cv: Column | str) -> Column:
    """Quantized cross-encoder score of a (query, candidate) pair:
    sum_i floor(w_i·q_i·c_i·1e9) − floor(u_i·|q_i−c_i|·1e9) as BIGINT.
    The |q−c| interaction makes the score genuinely pairwise."""
    q = F.col(qv) if isinstance(qv, str) else qv
    c = F.col(cv) if isinstance(cv, str) else cv
    idx = F.sequence(F.lit(0), F.lit(EMB_DIM - 1))
    terms = F.transform(
        idx,
        lambda i: (
            F.floor(
                _w(i) * F.element_at(q, i + 1) * F.element_at(c, i + 1) * F.lit(SCALE)
            ).cast("long")
            - F.floor(
                _u(i)
                * F.abs(F.element_at(q, i + 1) - F.element_at(c, i + 1))
                * F.lit(SCALE)
            ).cast("long")
        ),
    )
    return F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: acc + x)


def rerank_scores_pandas(cand: DataFrame) -> DataFrame:
    """Arrow-batched twin of :func:`_cross_score_q` — the SEAM where a
    real transformer cross-encoder plugs in: batch model inference over
    the bounded candidate frame via ``mapInPandas`` (never per-row
    Python). Bit-identical to the JVM expression (pytest-pinned):
    both evaluate the same IEEE-double products in the same
    association order — ``((w·q)·c)·1e9`` and ``(u·|q−c|)·1e9`` —
    floor to int64, and sum exactly. Input needs columns
    ``vec_id, v, qv``; output schema ``vec_id long, rerank_n long``."""
    import numpy as np
    import pandas as pd

    i = np.arange(EMB_DIM, dtype=np.int64)
    w = ((i * 37) % 19 - 9) / 10.0
    u = ((i * 23) % 13) / 10.0

    def score_batches(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.vstack(pdf["qv"].to_numpy())
            c = np.vstack(pdf["v"].to_numpy())
            s = (
                np.floor(w * q * c * SCALE).astype(np.int64)
                - np.floor(u * np.abs(q - c) * SCALE).astype(np.int64)
            ).sum(axis=1)
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "rerank_n": s})

    return cand.mapInPandas(score_batches, "vec_id long, rerank_n long")


def rerank_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage 1 of retrieve-then-rerank, exposed as the model seam's
    input contract: the brute cosine top-{N_CAND} candidate frame
    ``(vec_id, label, v, qv, cosine)`` for the query vector — one
    corpus scan with the broadcast 1-row query, TakeOrderedAndProject
    heap, NO shuffle of the corpus. Every stage-2 scorer — the JVM
    expression, :func:`rerank_scores_pandas`, or a real model swapped
    in as an Arrow-batched UDF (pytest-pinned e2e) — consumes exactly
    this frame, so the model choice cannot change what stage 2 costs:
    {N_CAND} rows per query, independent of corpus size."""
    e = load_embeddings(spark, sf_dir).select(
        "vec_id", "label", to_double_array("embedding").alias("v")
    )
    qv = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("v").alias("qv"))
    scored = e.filter(F.col("vec_id") != QUERY_VEC_ID).crossJoin(F.broadcast(qv))
    cos = cosine_q(dot_q("v", "qv"), norm_sq_q("v"), norm_sq_q("qv"))
    return (
        scored.select("vec_id", "label", "v", "qv", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(N_CAND)
    )


_SQL_CROSS_SCORE = f"""CAST(list_sum(list_transform(range({EMB_DIM}),
    i -> CAST(floor(((i*37) % 19 - 9) / 10.0
                    * {{q}}[i+1] * {{c}}[i+1] * 1e9) AS BIGINT)
       - CAST(floor(((i*23) % 13) / 10.0
                    * abs({{q}}[i+1] - {{c}}[i+1]) * 1e9) AS BIGINT)
)) AS BIGINT)"""


@query(
    "rerank_topk_cross",
    oracle=f"""
    WITH e AS ({E_SQL}),
    q AS (SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID}),
    cand AS (
        SELECT e.vec_id, e.label, e.v, q.qv,
               {sql_cosine_q(sql_dot_q('e.v', 'q.qv'),
                             sql_norm_sq_q('e.v'),
                             sql_norm_sq_q('q.qv'))} AS cosine
        FROM e, q
        WHERE e.vec_id <> {QUERY_VEC_ID}
        ORDER BY cosine DESC, e.vec_id
        LIMIT {N_CAND}
    )
    SELECT vec_id, label, cosine,
           {_SQL_CROSS_SCORE.format(q='qv', c='v')} AS rerank_n
    FROM cand
    ORDER BY rerank_n DESC, vec_id
    LIMIT {RERANK_K}
    """,
)
def rerank_topk_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieve-then-rerank: brute cosine top-{N_CAND} candidates for
    the query vector (stage 1, the ``cosine_topk`` machinery), then the
    pairwise cross-encoder score reranks to top-{RERANK_K} (stage 2).

    Plan shape: one corpus scan with the broadcast 1-row query vector
    (allowlisted scalar crossJoin), TakeOrderedAndProject for the
    candidate heap, then the rerank expression over {N_CAND} rows and a
    second (trivial) top-k. Both LIMITs carry unique vec_id tiebreaks
    so the candidate SET — not just the scores — is engine-identical.
    """
    cand = rerank_candidates(spark, sf_dir)
    return (
        cand.select(
            "vec_id",
            "label",
            "cosine",
            _cross_score_q("qv", "v").alias("rerank_n"),
        )
        .orderBy(F.desc("rerank_n"), F.asc("vec_id"))
        .limit(RERANK_K)
    )


def _ivf_rerank_oracle_sql() -> str:
    cos = "cosine"
    from ..functions.vectors import sql_cosine_q, sql_dot_q
    cos_expr = sql_cosine_q(sql_dot_q("q.v", "c.v"), "q.nv", "c.nv")
    cross = _SQL_CROSS_SCORE.format(q="qv", c="cv")
    return f"""
    {_ivf_train_assign_ctes()},
    stage1 AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               q.v AS qv, c.v AS cv,
               {cos_expr} AS cosine,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {cos_expr} DESC, c.vec_id) AS rnk
        FROM assigned q JOIN assigned c
          ON q.cell = c.cell AND c.vec_id != q.vec_id
        WHERE q.vec_id % {TOPK_QUERY_MOD} = 0
    ),
    stage2 AS (
        SELECT query_id, neighbor_id, cosine,
               {cross} AS rerank_n
        FROM stage1 WHERE rnk <= {N_CAND_IVF}
    )
    SELECT query_id, neighbor_id, cosine, rerank_n,
           CAST(rnk2 AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY rerank_n DESC, neighbor_id)
                  AS rnk2
        FROM stage2
    ) WHERE rnk2 <= {RERANK_K_IVF}
    """


@query("rerank_topk_ivf", oracle=_ivf_rerank_oracle_sql())
def rerank_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale form of retrieve-then-rerank: IVF stage 1 swaps in for
    the brute-force scan UNCHANGED (the claim ``rerank_topk_cross``'s
    docstring makes, demonstrated) — and the queries come as a BATCH
    (every {TOPK_QUERY_MOD}-th corpus vector), the production shape.

    Stage 1 prunes to each query's cell-mates via the same trained
    assignment every IVF query shares (O(corpus/K) candidates per
    query), ranks by quantized cosine, keeps {N_CAND_IVF}; stage 2
    reranks those with the pairwise cross-encoder score and keeps
    {RERANK_K_IVF}. Both windows run over in-cell candidate counts,
    never the corpus; every LIMIT-like window carries a unique
    neighbor_id tiebreak so the candidate SET is engine-identical.
    The oracle replays training, assignment, both rankings and the
    cross score bit-for-bit.
    """
    from pyspark.sql import Window as W

    corpus = _vec_corpus(spark, sf_dir)
    centroids = _trained_centroids(spark, sf_dir)
    assigned = _assign_cells(corpus, centroids)

    from ..functions.vectors import cosine_q, dot_q

    q = assigned.filter(F.col("vec_id") % TOPK_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("nv").alias("qn"), "cell",
    )
    c = assigned.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"),
        F.col("nv").alias("cn"), F.col("cell").alias("cell_c"),
    )
    cos = cosine_q(dot_q("qv", "cv"), F.col("qn"), F.col("cn"))
    stage1 = (
        q.join(
            c,
            (F.col("cell") == F.col("cell_c"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select("query_id", "neighbor_id", "qv", "cv", cos.alias("cosine"))
        .withColumn(
            "rnk",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
            ),
        )
        .filter(F.col("rnk") <= N_CAND_IVF)
    )
    stage2 = stage1.select(
        "query_id",
        "neighbor_id",
        "cosine",
        _cross_score_q("qv", "cv").alias("rerank_n"),
    )
    rnk2 = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.desc("rerank_n"), "neighbor_id")
    )
    return (
        stage2.withColumn("rank", rnk2.cast("long"))
        .filter(F.col("rank") <= RERANK_K_IVF)
        .select("query_id", "neighbor_id", "cosine", "rerank_n", "rank")
    )
