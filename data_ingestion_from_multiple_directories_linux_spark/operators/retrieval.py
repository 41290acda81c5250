"""Sparse (BM25) retrieval and hybrid sparse+dense rank fusion.

The dense side of retrieval is fully built out (cosine / IVF / PQ /
rerank ladder, operators/similarity.py + reranking.py). This module
adds the SPARSE arm — BM25 over an inverted index — and the fusion
step production retrieval stacks run on top of both: reciprocal-rank
fusion (RRF, Cormack et al. SIGIR'09), the standard way to combine a
lexical ranker with an embedding ranker without score calibration.

Query model: query-by-document ("related documents"). Anchors are
every ``ANCHOR_STEP``-th document (the reranking module's convention
for query selection); each anchor's top-``QUERY_TERMS`` tokens by
(tf DESC, term ASC) form its lexical query, and its embedding
(vec_id ≡ doc_id on the synthetic corpus, TESTDATA.md) is its dense
query vector. Both arms therefore express the same information need,
which is what makes fusing their ranks meaningful.

Determinism contract (what lets DuckDB replay this bit-for-bit):

* BM25 uses the RATIONAL idf surrogate (N+1)/(df+1) — monotone in the
  textbook log idf, zero logarithms (the tf_idf_scores precedent:
  ln() differs in the last ulp across engines).
* Each per-term score is ONE fixed-shape double expression — products
  and divisions in an explicitly parenthesized order are correctly
  rounded IEEE ops, so both engines produce the identical double —
  then floor-quantized to integer micros. Per-(query, doc) totals are
  exact BIGINT sums of those micros: order-independent, so Spark's
  partial aggregation cannot drift from DuckDB's single-threaded sum.
* RRF is pure integer arithmetic end to end: 10^6 div (60 + rank),
  summed over arms. Spark ``div`` truncation == DuckDB ``//`` floor on
  these non-negative values.

Scale shape (100 TB): the inverted index (tf) is the only data-sized
shuffle; the df broadcast is semi-joined to the query-term set first —
bounded by n_queries × QUERY_TERMS rows, never vocabulary-sized — and
the two corpus scalars are 1-row broadcasts; the anchor term table is
(n_queries × 3) rows and
broadcasts onto the tf index, so candidate generation is an index
probe, never a corpus scan per query; both per-query rankings window
over candidate sets (docs sharing ≥1 query term; top-N_ARM dense
hits), never the corpus. The dense arm reuses cosine machinery that is
already scan-shaped with a broadcast query side.

Reference behavioral parity: the reference's retrieval surface is
LIKE-any filtering (scripts/query_tables.py); BM25/RRF extend it to
ranked retrieval as SURVEY §2.12a additive surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import tokens
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
from .similarity import E_SQL, load_embeddings
from .text_analysis import TOK_SQL

#: every ANCHOR_STEP-th doc below ANCHOR_MAX_ID is a query anchor —
#: 8 anchors, valid at every SF (doc_id and vec_id both cover 0..399).
ANCHOR_STEP = 50
ANCHOR_MAX_ID = 400
#: lexical query width: the anchor's top tokens by (tf DESC, term ASC).
QUERY_TERMS = 3
#: final result depth per query, and per-arm candidate depth for fusion.
TOP_K = 10
N_ARM = 20
#: RRF smoothing constant (the k=60 of Cormack et al.).
RRF_K = 60
#: BM25 shape constants — written as identical literals on both engines.
K1 = "1.2"
ONE_MINUS_B = "0.25"
B = "0.75"

# ---------------------------------------------------------------------------
# Shared oracle CTE block (BM25 side) — bm25_topk and hybrid_rrf_fusion
# consume the SAME text, so the two surfaces cannot disagree about
# tokenization, idf, or anchor selection.
# ---------------------------------------------------------------------------

_BM25_CTES = f"""
    tok AS (
        SELECT doc_id, unnest({TOK_SQL.format(c='text')}) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok GROUP BY doc_id, term
    ),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tok FROM tok),
    anchors AS (
        SELECT doc_id AS query_id FROM documents
        WHERE doc_id % {ANCHOR_STEP} = 0 AND doc_id < {ANCHOR_MAX_ID}
    ),
    qterms AS (
        SELECT query_id, term FROM (
            SELECT a.query_id, t.term,
                   row_number() OVER (
                       PARTITION BY a.query_id ORDER BY t.tf DESC, t.term
                   ) AS rn
            FROM anchors a JOIN tf t ON t.doc_id = a.query_id
        ) WHERE rn <= {QUERY_TERMS}
    ),
    scored AS (
        SELECT q.query_id, t.doc_id,
               CAST(SUM(CAST(floor((
                   (((CAST(nd.n_docs AS DOUBLE) + CAST(1.0 AS DOUBLE))
                     / (CAST(df.df AS DOUBLE) + CAST(1.0 AS DOUBLE)))
                    * (CAST(t.tf AS DOUBLE) * CAST(2.2 AS DOUBLE)))
                   / (CAST(t.tf AS DOUBLE)
                      + (CAST({K1} AS DOUBLE)
                         * (CAST({ONE_MINUS_B} AS DOUBLE)
                            + (CAST({B} AS DOUBLE)
                               * (CAST(dl.dl * nd.n_docs AS DOUBLE)
                                  / CAST(s.n_tok AS DOUBLE))))))
               ) * CAST(1000000.0 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS bm25_micro,
               CAST(COUNT(*) AS BIGINT) AS n_terms_hit
        FROM qterms q
        JOIN tf t ON t.term = q.term AND t.doc_id <> q.query_id
        JOIN df ON df.term = t.term
        JOIN dl ON dl.doc_id = t.doc_id
        CROSS JOIN nd CROSS JOIN s
        GROUP BY q.query_id, t.doc_id
    )"""


def build_tf_index(docs: DataFrame) -> DataFrame:
    """(doc_id, term, tf) inverted index from ``docs(doc_id, text)`` —
    THE tokenize-once artifact both the batch queries and the streaming
    index maintainer materialize (one definition, so the streamed index
    can be pinned bit-identical to a one-shot build)."""
    tok = docs.select(
        "doc_id", F.explode_outer(tokens("text")).alias("term")
    ).filter(F.col("term").isNotNull())
    return tok.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf")
    )


def bm25_scored_from_index(tf: DataFrame, nd: DataFrame) -> DataFrame:
    """(query_id, doc_id, bm25_micro, n_terms_hit) from a prebuilt
    (doc_id, term, tf) index plus a 1-row (n_docs) frame — the serving
    path shared by the batch query (which builds the index from the
    corpus scan) and the streaming index maintainer (which reads the
    persisted segment table). ``nd`` must count ALL corpus documents,
    token-less ones included (they carry no index rows but shift idf
    and the dl normalization — the reason the streaming maintainer
    keeps a per-segment doc-count cell alongside the tf segments).

    Inverted-index probe, not a corpus scan: the (n_queries ×
    QUERY_TERMS) anchor-term table broadcasts onto tf."""
    # The index feeds FIVE consumers (anchors, qterms, candidates, df,
    # dl/n_tok); persist it so it materializes ONCE — at 100 TB the
    # persisted tf IS the index a retrieval system maintains anyway.
    # dl / n_tok are derived from tf (Σtf per doc == token count), not
    # from a second tokenization pass.
    tf = tf.persist()
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    df_ = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    ntok = tf.select(F.sum("tf").cast("long").alias("n_tok"))

    # anchors from the index's own doc set: a token-less anchor has no
    # qterms and contributes nothing in the corpus-scan path either, so
    # the two derivations score identically
    anchors = (
        tf.select("doc_id")
        .distinct()
        .filter(
            (F.col("doc_id") % ANCHOR_STEP == 0)
            & (F.col("doc_id") < ANCHOR_MAX_ID)
        )
        .select(F.col("doc_id").alias("query_id"))
    )
    qt_rn = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.desc("tf"), F.asc("term"))
    )
    qterms = (
        anchors.join(tf, anchors.query_id == tf.doc_id)
        .select("query_id", "term", "tf")
        .withColumn("rn", qt_rn)
        .filter(F.col("rn") <= QUERY_TERMS)
        .select("query_id", "term")
    )

    # df is VOCABULARY-sized — at 100 TB broadcasting it whole is the
    # scale-killer. Only the query terms' rows can ever match the
    # candidate frame, so semi-join df down to the bounded qterms term
    # set first: the broadcast build side is then ≤ n_queries ×
    # QUERY_TERMS rows regardless of corpus vocabulary.
    df_q = df_.join(
        F.broadcast(qterms.select("term").distinct()), "term", "semi"
    )
    cand = (
        tf.join(F.broadcast(qterms), "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(F.broadcast(df_q), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(ntok))
    )
    idf = (F.col("n_docs").cast("double") + F.lit(1.0)) / (
        F.col("df").cast("double") + F.lit(1.0)
    )
    num = F.col("tf").cast("double") * F.lit(2.2)
    dlr = (F.col("dl") * F.col("n_docs")).cast("double") / F.col("n_tok").cast(
        "double"
    )
    denom = F.col("tf").cast("double") + (
        F.lit(float(K1)) * (F.lit(float(ONE_MINUS_B)) + (F.lit(float(B)) * dlr))
    )
    micro = F.floor(((idf * num) / denom) * F.lit(1000000.0)).cast("long")
    return cand.groupBy("query_id", "doc_id").agg(
        F.sum(micro).cast("long").alias("bm25_micro"),
        F.count("*").cast("long").alias("n_terms_hit"),
    )


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-scan path: build the tf index + doc count from the
    documents table, then serve through the shared index scorer."""
    d = load_table(spark, sf_dir, "documents", spread=True)
    nd = d.select(F.count("*").cast("long").alias("n_docs"))
    return bm25_scored_from_index(build_tf_index(d.select("doc_id", "text")), nd)


@query(
    "bm25_topk",
    oracle=f"""
    WITH {_BM25_CTES}
    SELECT query_id, doc_id, bm25_micro, n_terms_hit,
           CAST(rn AS BIGINT) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY bm25_micro DESC, doc_id
        ) AS rn FROM scored
    ) WHERE rn <= {TOP_K}
    """,
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 related documents per anchor query.

    Okapi BM25 (k1=1.2, b=0.75) with the rational idf surrogate and
    per-term micro quantization described in the module docstring; the
    per-query ranking window runs over the candidate set only (docs
    sharing ≥1 query term with the anchor — the inverted-index probe),
    so no global sort and no corpus-sized window state anywhere."""
    scored = _bm25_scored(spark, sf_dir)
    rn = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.desc("bm25_micro"), F.asc("doc_id"))
    )
    return (
        scored.withColumn("rank", rn.cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "doc_id", "bm25_micro", "n_terms_hit", "rank")
    )


def _dense_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, dense_rank) — cosine top-N_ARM per anchor
    embedding (vec_id ≡ doc_id). Broadcast anchor vectors, one corpus
    scan, per-query window over N_ARM-capped candidates."""
    e = load_embeddings(spark, sf_dir).select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    qv = e.filter(
        (F.col("vec_id") % ANCHOR_STEP == 0) & (F.col("vec_id") < ANCHOR_MAX_ID)
    ).select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    scored = (
        e.crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            cosine_q(dot_q("v", "qv"), norm_sq_q("v"), norm_sq_q("qv")).alias(
                "cosine"
            ),
        )
    )
    rn = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("doc_id"))
    )
    return (
        scored.withColumn("dense_rank", rn.cast("long"))
        .filter(F.col("dense_rank") <= N_ARM)
        .select("query_id", "doc_id", "dense_rank")
    )


@query(
    "hybrid_rrf_fusion",
    oracle=f"""
    WITH {_BM25_CTES},
    e AS ({E_SQL}),
    danchor AS (
        SELECT vec_id AS query_id, v AS qv FROM e
        WHERE vec_id % {ANCHOR_STEP} = 0 AND vec_id < {ANCHOR_MAX_ID}
    ),
    dscore AS (
        SELECT a.query_id, e.vec_id AS doc_id,
               {sql_cosine_q(sql_dot_q('e.v', 'a.qv'),
                             sql_norm_sq_q('e.v'),
                             sql_norm_sq_q('a.qv'))} AS cosine
        FROM e JOIN danchor a ON e.vec_id <> a.query_id
    ),
    drank AS (
        SELECT query_id, doc_id, CAST(rn AS BIGINT) AS dense_rank FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, doc_id
            ) AS rn FROM dscore
        ) WHERE rn <= {N_ARM}
    ),
    srank AS (
        SELECT query_id, doc_id, CAST(rn AS BIGINT) AS sparse_rank FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY bm25_micro DESC, doc_id
            ) AS rn FROM scored
        ) WHERE rn <= {N_ARM}
    ),
    fused AS (
        SELECT COALESCE(sr.query_id, dr.query_id) AS query_id,
               COALESCE(sr.doc_id, dr.doc_id) AS doc_id,
               sr.sparse_rank, dr.dense_rank,
               CAST(COALESCE(1000000 // ({RRF_K} + sr.sparse_rank), 0)
                    + COALESCE(1000000 // ({RRF_K} + dr.dense_rank), 0)
                    AS BIGINT) AS rrf_micro
        FROM srank sr FULL OUTER JOIN drank dr
          ON sr.query_id = dr.query_id AND sr.doc_id = dr.doc_id
    )
    SELECT query_id, doc_id, sparse_rank, dense_rank, rrf_micro,
           CAST(rn AS BIGINT) AS fused_rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY rrf_micro DESC, doc_id
        ) AS rn FROM fused
    ) WHERE rn <= {TOP_K}
    """,
)
def hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 and dense-cosine top-20 arms per anchor,
    fused by reciprocal-rank fusion (Σ_arms 10^6 div (60 + rank), an
    absent arm contributing 0) and cut to a fused top-10.

    The two arms share the anchor set; the sparse arm shares its CTE
    block verbatim with bm25_topk (one string constant) so the two
    registered surfaces cannot diverge. Full-outer USING join keeps
    docs found by only one arm — the point of fusion. RRF is rank-only:
    no score calibration between BM25 micros and cosine, which is why
    production stacks default to it."""
    sparse = _bm25_scored(spark, sf_dir)
    s_rn = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.desc("bm25_micro"), F.asc("doc_id"))
    )
    srank = (
        sparse.withColumn("sparse_rank", s_rn.cast("long"))
        .filter(F.col("sparse_rank") <= N_ARM)
        .select("query_id", "doc_id", "sparse_rank")
    )
    drank = _dense_ranked(spark, sf_dir)
    fused = srank.join(drank, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        "sparse_rank",
        "dense_rank",
        (
            F.coalesce(
                F.expr(f"1000000 div ({RRF_K} + sparse_rank)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"1000000 div ({RRF_K} + dense_rank)"), F.lit(0)
            )
        )
        .cast("long")
        .alias("rrf_micro"),
    )
    f_rn = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.desc("rrf_micro"), F.asc("doc_id"))
    )
    return (
        fused.withColumn("fused_rank", f_rn.cast("long"))
        .filter(F.col("fused_rank") <= TOP_K)
        .select(
            "query_id",
            "doc_id",
            "sparse_rank",
            "dense_rank",
            "rrf_micro",
            "fused_rank",
        )
    )
