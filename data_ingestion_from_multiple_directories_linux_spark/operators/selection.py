"""Token-budget corpus selection: the best documents that fit.

Training runs are budgeted in TOKENS, not documents — the selection
question is "which documents do we keep so the kept tokens fit the
budget and are the highest-quality ones?" (the data-selection step
between quality scoring and mixing; DoReMi/DSIR-style pipelines put a
scored greedy selection exactly here). This operator ranks documents by
an integer quality score and keeps the maximal PREFIX of that ranking
whose cumulative token count fits SELECT_TOKEN_BUDGET — greedy
quality-first selection, deterministic across engines.

Score: quality_milli = floor(1000·stopword_ratio) −
floor(1000·punct_ratio) — the L9 heuristics (functions/text.py helpers,
the text_quality_scores expressions) collapsed to one BIGINT in
[-1000, 1000]. Natural prose scores high; markup/symbol soup scores
low. Each floor() lands on a single correctly-rounded double product,
so the score is engine-portable (the fixed-shape-projection
convention); ties break on doc_id.

Scale shape — the global "order by score, running sum" is NOT a
single-partition window. quality_milli has a bounded integer domain, so
the plan is the sequence_packing two-phase prefix sum keyed by score
BAND instead of doc_id range:

1. one scan computes (doc_id, n_tokens, quality_milli) — map-only;
2. per-band token subtotals (≤ 2001 bands — a bounded metadata
   collect), exclusive band prefixes broadcast back;
3. within-band inclusive cumsum via a window PARTITIONED by band
   (hash-shuffled, ~1/bands of the data per partition);
   global_cum = band prefix + in-band cumsum, selected =
   global_cum ≤ budget.

Identical output to the naive global-order window (the oracle runs that
form), no ``Exchange SinglePartition`` anywhere (plan-pinned).

Reference parity: none (the reference has no selection surface);
SURVEY §2.12a additive (L163).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import punct_count, stopword_hits, tokens
from .registry import query
from .text_analysis import STOPWORDS, TOK_SQL

#: tokens the selection may keep per run.
SELECT_TOKEN_BUDGET = 10_000


def _quality_milli_sql() -> str:
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
    return (
        f"CAST(floor(1000.0 * ({stop})) AS BIGINT)"
        f" - CAST(floor(1000.0 * ({punct})) AS BIGINT)"
    )


@query(
    "budget_quality_selection",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, text, {TOK_SQL.format(c='text')} AS toks FROM documents
    ),
    s AS (
        -- COALESCE: a NULL-text document carries 0 tokens. Leaving it
        -- NULL diverges the engines — Spark's banded window sums a
        -- possibly-all-NULL frame (NULL cum → row dropped) while the
        -- oracle's global cum skips the NULL and keeps the row.
        SELECT doc_id,
               CAST(COALESCE(len(toks), 0) AS BIGINT) AS n_tokens,
               {_quality_milli_sql()} AS quality_milli
        FROM t
    ),
    c AS (
        SELECT doc_id, quality_milli, n_tokens,
               SUM(n_tokens) OVER (
                   ORDER BY quality_milli DESC, doc_id
               ) AS cum_incl
        FROM s
    )
    SELECT doc_id, quality_milli, n_tokens,
           CAST(cum_incl - n_tokens AS BIGINT) AS cum_before
    FROM c WHERE cum_incl <= {SELECT_TOKEN_BUDGET}
    """,
)
def budget_quality_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, quality_milli, n_tokens, cum_before) — the selected
    documents: the maximal quality-ranked prefix whose cumulative token
    count fits SELECT_TOKEN_BUDGET. cum_before is each kept document's
    token offset within the selection (ranking order), so the output
    doubles as a deterministic layout for the selected shard."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens("text")
    n_tok = F.size(toks)

    def ratio(num, den):
        return F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))

    q_milli = (
        F.floor(F.lit(1000.0) * ratio(stopword_hits(toks), n_tok)).cast("long")
        - F.floor(
            F.lit(1000.0) * ratio(punct_count("text"), F.length("text"))
        ).cast("long")
    )
    # two consumers (the band-subtotal collect and the returned plan)
    # read the scored frame; localCheckpoint materializes the scan ONCE
    # with a GC-bounded lifetime — an unpersisted cache entry here would
    # outlive the call in long-lived sessions (round-10 review note)
    s = d.select(
        "doc_id",
        F.coalesce(n_tok, F.lit(0)).cast("long").alias("n_tokens"),
        q_milli.alias("quality_milli"),
    ).localCheckpoint(eager=True)

    empty_shape = (
        "doc_id",
        "quality_milli",
        "n_tokens",
        F.lit(0).cast("long").alias("cum_before"),
    )
    # bands: quality_milli is integer in [-1000, 1000]; negate so band
    # ASC == score DESC (the same exact-bounds trick sequence_packing
    # uses on doc_id ranges, keyed here by the bounded score domain)
    t = s.withColumn("_b", (-F.col("quality_milli")).cast("long"))
    subs = t.groupBy("_b").agg(F.sum("n_tokens").alias("sub")).collect()
    if not subs:  # empty corpus: schema-stable empty result
        return s.select(*empty_shape)
    running, prefix_rows = 0, []
    for row in sorted(subs, key=lambda r: r["_b"]):
        prefix_rows.append((int(row["_b"]), running))
        running += int(row["sub"] or 0)
    pref = spark.createDataFrame(prefix_rows, "_b bigint, _pref bigint")
    win = (
        W.partitionBy("_b")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum_incl = F.col("_pref") + F.sum("n_tokens").over(win)
    return (
        t.join(F.broadcast(pref), "_b")
        .withColumn("_cum", cum_incl)
        .filter(F.col("_cum") <= SELECT_TOKEN_BUDGET)
        .select(
            "doc_id",
            "quality_milli",
            "n_tokens",
            (F.col("_cum") - F.col("n_tokens")).cast("long").alias("cum_before"),
        )
    )
