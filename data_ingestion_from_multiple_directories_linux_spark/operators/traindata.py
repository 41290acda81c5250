"""Training-example transforms: fill-in-the-middle (FIM) span prep.

FIM training (Bavarian et al. '22, "Efficient Training of Language
Models to Fill in the Middle") rewrites a fraction of documents as
prefix/suffix→middle examples: the document is split at a pseudo-random
middle span and re-serialized as <PRE>prefix<SUF>suffix<MID>middle so
an autoregressive model learns infilling. The transform itself is the
data-pipeline part — a pure projection, one corpus scan, zero shuffle
— and that is what this operator implements.

Determinism: span positions derive from doc_id arithmetic (the
md5-split convention would also work, but integer arithmetic keeps the
oracle free of hex→int conversions, which the two engines spell
differently): with L = length(text),

    cap      = greatest(L div 3, 1)
    m_start  = 2 + (doc_id · 7)  mod cap      -- 1-based, ≥ 2
    m_len    = 1 + (doc_id · 13) mod cap

so 1 ≤ prefix, 1 ≤ middle, and the suffix may be empty when the span
abuts the end. substring(s, pos, len) is 1-based with identical
clamping semantics in Spark and DuckDB, and the reassembly invariant
prefix ‖ middle ‖ suffix == text is pytest-pinned per row.

At 100 TB this is the canonical map-only stage: narrow projection
inside whole-stage codegen, parallel with the scan, output co-
partitioned with input for the downstream pack/shuffle (L39/L47).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

#: documents shorter than this are left out of FIM (too short to split).
FIM_MIN_CHARS = 32
#: sentinel tokens of the PSM (prefix-suffix-middle) serialization.
PRE_TOK = "<PRE>"
SUF_TOK = "<SUF>"
MID_TOK = "<MID>"


@query(
    "fim_span_prep",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, text, length(text) AS n,
               greatest(length(text) // 3, 1) AS cap
        FROM documents
        WHERE text IS NOT NULL AND length(text) >= {FIM_MIN_CHARS}
    ),
    spans AS (
        SELECT doc_id, text, n,
               2 + ((doc_id * 7) % cap) AS m_start,
               1 + ((doc_id * 13) % cap) AS m_len
        FROM base
    )
    SELECT doc_id,
           substr(text, 1, m_start - 1) AS prefix,
           substr(text, m_start, m_len) AS middle,
           substr(text, m_start + m_len, n) AS suffix,
           CAST(m_start - 1 AS BIGINT) AS prefix_len,
           CAST(length(substr(text, m_start, m_len)) AS BIGINT) AS middle_len,
           CAST(length(substr(text, m_start + m_len, n)) AS BIGINT)
               AS suffix_len,
           '{PRE_TOK}' || substr(text, 1, m_start - 1)
               || '{SUF_TOK}' || substr(text, m_start + m_len, n)
               || '{MID_TOK}' || substr(text, m_start, m_len) AS fim_text
    FROM spans
    """,
)
def fim_span_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, prefix, middle, suffix, *lens, fim_text) — the FIM/PSM
    rewrite of every document long enough to split. Reassembly
    invariant prefix‖middle‖suffix == text holds for every row."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") >= FIM_MIN_CHARS)
    )
    n = F.length("text")
    # integer division: Spark `/` on longs is double division — use div
    cap = F.greatest(F.expr("length(text) div 3"), F.lit(1)).cast("long")
    spans = d.select(
        "doc_id",
        "text",
        n.cast("long").alias("n"),
        (F.lit(2) + (F.col("doc_id") * 7) % cap).cast("int").alias("m_start"),
        (F.lit(1) + (F.col("doc_id") * 13) % cap).cast("int").alias("m_len"),
    )
    prefix = F.expr("substring(text, 1, m_start - 1)")
    middle = F.expr("substring(text, m_start, m_len)")
    suffix = F.expr("substring(text, m_start + m_len, n)")
    return spans.select(
        "doc_id",
        prefix.alias("prefix"),
        middle.alias("middle"),
        suffix.alias("suffix"),
        (F.col("m_start") - 1).cast("long").alias("prefix_len"),
        F.length(middle).cast("long").alias("middle_len"),
        F.length(suffix).cast("long").alias("suffix_len"),
        F.concat(
            F.lit(PRE_TOK),
            prefix,
            F.lit(SUF_TOK),
            suffix,
            F.lit(MID_TOK),
            middle,
        ).alias("fim_text"),
    )


# ---------------------------------------------------------------------------
# Length-based curriculum phases (histogram quantiles, no global sort)
# ---------------------------------------------------------------------------

#: curriculum phases (quartiles of the corpus by length).
N_PHASES = 4


@query(
    "curriculum_phases",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, length(coalesce(text, '')) AS len FROM documents
    ),
    hist AS (
        SELECT len, CAST(COUNT(*) AS BIGINT) AS cnt FROM base GROUP BY len
    ),
    cum AS (
        SELECT len, SUM(cnt) OVER (ORDER BY len) AS cum
        FROM hist
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
    bounds AS (
        SELECT p, MIN(len) AS t FROM (
            SELECT c.len, p.p
            FROM cum c, (SELECT unnest([1, 2, 3]) AS p) p, nd
            WHERE c.cum * {N_PHASES} >= p.p * nd.n
        ) GROUP BY p
    )
    SELECT b.doc_id, CAST(b.len AS BIGINT) AS n_chars_len,
           CAST(1 + COALESCE(SUM(CASE WHEN b.len > bo.t THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS phase
    FROM base b LEFT JOIN bounds bo ON TRUE
    GROUP BY b.doc_id, b.len
    """,
)
def curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_chars_len, phase 1..4) — length-based curriculum
    assignment (short-to-long is the classic sequence-length curriculum)
    WITHOUT a global sort: the corpus collapses to a length histogram
    (bounded domain), exact quartile thresholds come from the cumulative
    window over that tiny table (t_p = min length with cum·4 ≥ p·N), and
    each document's phase is 1 + #thresholds it exceeds — a broadcast
    join of a 3-row bounds table against the scan. The ntile()
    alternative is an Exchange SinglePartition over the corpus; this
    shape is one aggregate + one map stage at any scale. Phases are
    stable under duplicate lengths (all docs of one length share a
    phase — the well-defined behavior ntile cannot give)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length(F.coalesce("text", F.lit(""))).alias("len")
    )
    hist = d.groupBy("len").agg(F.count("*").cast("long").alias("cnt"))
    cum = hist.select(
        "len",
        F.sum("cnt").over(W.orderBy("len")).cast("long").alias("cum"),
    )
    nd = d.select(F.count("*").cast("long").alias("n"))
    ps = spark.range(1, N_PHASES).select(F.col("id").cast("long").alias("p"))
    bounds = (
        cum.crossJoin(F.broadcast(ps))
        .crossJoin(F.broadcast(nd))
        .filter(F.col("cum") * N_PHASES >= F.col("p") * F.col("n"))
        .groupBy("p")
        .agg(F.min("len").alias("t"))
    )
    joined = d.crossJoin(F.broadcast(bounds.select("t")))
    return (
        joined.groupBy("doc_id", "len")
        .agg(
            (
                F.lit(1)
                + F.coalesce(
                    F.sum(F.when(F.col("len") > F.col("t"), 1).otherwise(0)),
                    F.lit(0),
                )
            )
            .cast("long")
            .alias("phase")
        )
        .select("doc_id", F.col("len").cast("long").alias("n_chars_len"), "phase")
    )
