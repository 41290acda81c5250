"""Rank-ensembled quality blending — percentile-normalize N signals
with ZERO global sorts.

Combining heterogeneous quality signals (stopword density, punctuation
density, length, classifier scores) by raw value is calibration-
sensitive: one signal's scale dominates. The robust ensemble is RANK
blending — normalize each signal to its corpus percentile, then
combine ranks. The naive plan is N global sort windows (N corpus
shuffles into one partition — the canonical scale killer).

This operator computes exact min-ranks with no global sort at all:
every signal is integer-quantized into a BOUNDED domain (milli-ratios
in [0, 1000]; token length saturates at LEN_CAP), so a signal's rank
function is a cumulative histogram over at most ~2001 distinct values
— an aggregate-sized frame. Per signal: one groupBy(value) count, one
window over the tiny histogram (bounded frame — the documented
single-partition allowance, selection.py/sequence_packing precedent),
one broadcast join back. rank(x) = #rows with strictly smaller value
(min-rank: tie-stable, needs no tiebreak, engine-portable), normalized
to permille of (n_docs − 1).

blend_pm = stop_rank_pm + len_rank_pm − punct_rank_pm: prose-like and
substantial documents score high, symbol soup scores low — the same
direction conventions as the L9 quality heuristics, but scale-free.

Scale shape: ONE corpus scan computes all three signals (checkpointed
— four consumers), then everything downstream is histogram-sized.
At 100 TB the corpus never shuffles and never sorts.

Reference parity: none; SURVEY §2.12a additive (L169).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import punct_count, stopword_hits, tokens
from .registry import query
from .text_analysis import STOPWORDS, TOK_SQL

#: token-length saturation: docs at/over the cap tie (bounds the
#: length histogram's domain; length differences beyond the cap carry
#: no quality signal anyway).
LEN_CAP = 1000


def _signals_sql() -> str:
    stop = (
        "CASE WHEN len(toks) > 0 THEN "
        f"CAST(len(list_filter(toks, x -> x IN {STOPWORDS!r})) AS DOUBLE)"
        " / len(toks) ELSE 0.0 END"
    )
    punct = (
        "CASE WHEN length(text) > 0 THEN "
        "CAST(length(text)"
        " - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))"
        " AS DOUBLE) / length(text) ELSE 0.0 END"
    )
    return f"""
    SELECT doc_id,
           CAST(floor(1000.0 * ({stop})) AS BIGINT) AS stop_milli,
           CAST(floor(1000.0 * ({punct})) AS BIGINT) AS punct_milli,
           CAST(LEAST(COALESCE(len(toks), 0), {LEN_CAP}) AS BIGINT) AS len_v
    FROM (SELECT doc_id, text, {TOK_SQL.format(c='text')} AS toks
          FROM documents WHERE doc_id IS NOT NULL)
    """


def _rank_cte_sql(sig: str) -> str:
    """Cumulative-histogram min-rank for one signal column of ``s``."""
    return f"""
    h_{sig} AS (SELECT {sig} AS v, COUNT(*) AS cnt FROM s GROUP BY {sig}),
    c_{sig} AS (
        SELECT v, CAST(COALESCE(SUM(cnt) OVER (
            ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
        ), 0) AS BIGINT) AS smaller
        FROM h_{sig}
    )"""


@query(
    "quality_rank_blend",
    oracle=f"""
    WITH s AS ({_signals_sql()}),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM s),
    {_rank_cte_sql('stop_milli')},
    {_rank_cte_sql('punct_milli')},
    {_rank_cte_sql('len_v')}
    SELECT s.doc_id,
           CAST((1000 * cs.smaller) // GREATEST(n.n_docs - 1, 1) AS BIGINT)
               AS stop_rank_pm,
           CAST((1000 * cp.smaller) // GREATEST(n.n_docs - 1, 1) AS BIGINT)
               AS punct_rank_pm,
           CAST((1000 * cl.smaller) // GREATEST(n.n_docs - 1, 1) AS BIGINT)
               AS len_rank_pm,
           CAST((1000 * cs.smaller) // GREATEST(n.n_docs - 1, 1)
              + (1000 * cl.smaller) // GREATEST(n.n_docs - 1, 1)
              - (1000 * cp.smaller) // GREATEST(n.n_docs - 1, 1)
              AS BIGINT) AS blend_pm
    FROM s
    JOIN c_stop_milli cs ON s.stop_milli = cs.v
    JOIN c_punct_milli cp ON s.punct_milli = cp.v
    JOIN c_len_v cl ON s.len_v = cl.v
    CROSS JOIN n
    """,
)
def quality_rank_blend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, stop_rank_pm, punct_rank_pm, len_rank_pm, blend_pm):
    each signal's exact corpus min-rank in permille (share of documents
    with a strictly smaller value), and the rank-ensembled quality
    blend stop + len − punct. No global sort anywhere — each rank comes
    from a cumulative histogram over the signal's bounded integer
    domain, broadcast back onto the single corpus scan."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    toks = tokens("text")
    n_tok = F.size(toks)

    def ratio(num: Column, den: Column) -> Column:
        return F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))

    s = d.select(
        "doc_id",
        F.floor(F.lit(1000.0) * ratio(stopword_hits(toks), n_tok))
        .cast("long")
        .alias("stop_milli"),
        F.floor(
            F.lit(1000.0) * ratio(punct_count("text"), F.length("text"))
        )
        .cast("long")
        .alias("punct_milli"),
        F.least(
            F.coalesce(n_tok.cast("long"), F.lit(0)), F.lit(LEN_CAP)
        ).alias("len_v"),
    ).localCheckpoint(eager=True)  # one scan, four consumers

    n_docs = s.select(F.count("*").cast("long").alias("n_docs"))

    def rank_map(sig: str) -> DataFrame:
        h = s.groupBy(F.col(sig).alias("v")).agg(
            F.count("*").cast("long").alias("cnt")
        )
        win = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
        return h.select(
            "v",
            F.coalesce(F.sum("cnt").over(win), F.lit(0))
            .cast("long")
            .alias(f"smaller_{sig}"),
        )

    out = (
        s.join(
            F.broadcast(rank_map("stop_milli")),
            s.stop_milli == F.col("v"),
        )
        .drop("v")
        .join(
            F.broadcast(rank_map("punct_milli")),
            s.punct_milli == F.col("v"),
        )
        .drop("v")
        .join(F.broadcast(rank_map("len_v")), s.len_v == F.col("v"))
        .drop("v")
        .crossJoin(F.broadcast(n_docs))
    )
    pm = lambda sig: F.expr(  # noqa: E731
        f"CAST((1000 * smaller_{sig}) DIV GREATEST(n_docs - 1, 1) AS BIGINT)"
    )
    return out.select(
        "doc_id",
        pm("stop_milli").alias("stop_rank_pm"),
        pm("punct_milli").alias("punct_rank_pm"),
        pm("len_v").alias("len_rank_pm"),
        (pm("stop_milli") + pm("len_v") - pm("punct_milli"))
        .cast("long")
        .alias("blend_pm"),
    )
