"""Quality-classifier calibration over the documents corpus.

A corpus pipeline gates training data with cheap quality classifiers
(fasttext-style linear models over surface features). Before trusting
a gate at 100 TB you CALIBRATE it: bin the classifier score, measure
the observed positive rate per bin (the reliability table), and sweep
thresholds for precision/recall — the two queries here.

Design decisions for exactness and scale:

* **Fixed, broadcast model.** The classifier is a pre-trained linear
  model — integer weights over integer surface features (token count,
  char count, stopword hits), so the score is a BIGINT with zero
  float drift. Training lives elsewhere; calibration is read-only.
* **Logit-space bins.** The sigmoid is monotone, so fixed-width bins
  of the raw score z are exactly decile-equivalent to bins of
  sigmoid(z) — and avoid transcendental exp(), whose last-ulp
  differences between engines would break the value hash.
* **Fixed-width bins, not ntile.** ntile needs a GLOBAL sort; fixed
  bins ``floor(z / 500)`` are a pure projection + a groupBy on a few
  dozen keys — map-side partials do all the work, no skew possible.
* **Threshold metrics from the bin histogram.** Thresholds are bin
  boundaries, so TP/FP/FN/TN per threshold are exact sums over the
  ≤ ~30-row binned table (each bin row exploded over the 4-threshold
  literal array) — the second phase never rescans the corpus.

On the synthetic corpus the ``lang='en'`` label is independent of the
text content by construction, and the reliability table duly reports
per-bin rates hugging the base rate — the operator's job is the
measurement, not the model; a real corpus swaps the weights, nothing
else.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import STOPWORDS, tokens
from .registry import query
from .text_analysis import TOK_SQL

#: fixed "trained" integer weights: z = W_TOK·n_tokens + W_CHAR·n_chars
#: + W_STOP·n_stopwords + BIAS (milli-logit space).
W_TOK, W_CHAR, W_STOP, BIAS = 25, -2, 300, 500
#: calibration bin width in milli-logits.
BIN_W = 500
#: decision thresholds for the precision/recall sweep — multiples of
#: BIN_W so bin-histogram sums are EXACT (z >= t  ⟺  bin_lo >= t).
THRESHOLDS = (1000, 2000, 3000, 4000)

#: per-doc score + label, DuckDB side (the Spark twin is _scored()).
_SCORED_SQL = f"""
    SELECT doc_id,
           {W_TOK} * len({TOK_SQL.format(c='text')})
           + {W_CHAR} * n_chars
           + {W_STOP} * len(list_filter({TOK_SQL.format(c='text')},
                                        x -> x IN {STOPWORDS!r}))
           + {BIAS} AS z,
           CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
    FROM documents
"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    z = (
        F.lit(W_TOK) * F.size(toks).cast("long")
        + F.lit(W_CHAR) * F.col("n_chars")
        + F.lit(W_STOP)
        * F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("long")
        + F.lit(BIAS)
    )
    pos = F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0))
    return d.select("doc_id", z.alias("z"), pos.alias("pos"))


def _bin(z: Column) -> Column:
    """floor(z / BIN_W) via double division — Spark's integer ``div``
    truncates toward zero while DuckDB's ``//`` floors, so negative
    scores would bin differently; floor over an exact double agrees
    everywhere (|z| ≪ 2^52)."""
    return F.floor(z.cast("double") / BIN_W).cast("long")


_SQL_BIN = f"CAST(floor(CAST(z AS DOUBLE) / {BIN_W}) AS BIGINT)"


@query(
    "quality_calibration_bins",
    oracle=f"""
    WITH t AS ({_SCORED_SQL})
    SELECT {_SQL_BIN} AS bin,
           {_SQL_BIN} * {BIN_W} AS z_lo,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST((1000 * SUM(pos)) // COUNT(*) AS BIGINT) AS rate_milli
    FROM t
    GROUP BY 1
    """,
)
def quality_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table: per score-bin document count, positive count
    and observed positive rate (milli, floor-divided — integer-exact).
    One projection + one groupBy on ≤ a few dozen bin keys."""
    s = _scored(spark, sf_dir)
    b = _bin(F.col("z"))
    return (
        s.groupBy(b.alias("bin"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("pos").cast("long").alias("n_pos"),
        )
        .select(
            "bin",
            (F.col("bin") * BIN_W).alias("z_lo"),
            "n",
            "n_pos",
            F.expr("(1000 * n_pos) div n").cast("long").alias("rate_milli"),
        )
    )


@query(
    "quality_threshold_metrics",
    oracle=f"""
    WITH t AS ({_SCORED_SQL}),
    th AS (SELECT unnest({list(THRESHOLDS)}) AS thresh),
    m AS (
        SELECT th.thresh,
               CAST(SUM(CASE WHEN t.z >= th.thresh THEN t.pos ELSE 0 END)
                    AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN t.z >= th.thresh THEN 1 - t.pos ELSE 0 END)
                    AS BIGINT) AS fp,
               CAST(SUM(CASE WHEN t.z < th.thresh THEN t.pos ELSE 0 END)
                    AS BIGINT) AS fn,
               CAST(SUM(CASE WHEN t.z < th.thresh THEN 1 - t.pos ELSE 0 END)
                    AS BIGINT) AS tn
        FROM t CROSS JOIN th
        GROUP BY 1
    )
    SELECT CAST(thresh AS BIGINT) AS thresh, tp, fp, fn, tn,
           CAST((1000 * tp) // greatest(tp + fp, 1) AS BIGINT)
               AS precision_milli,
           CAST((1000 * tp) // greatest(tp + fn, 1) AS BIGINT)
               AS recall_milli
    FROM m
    """,
)
def quality_threshold_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall sweep over fixed thresholds, computed from the
    bin HISTOGRAM (phase 2 never rescans the corpus): each ≤ ~30-row
    bin is exploded over the 4-threshold literal array and the
    confusion counts are exact bin sums because thresholds sit on bin
    boundaries. The oracle takes the direct per-document route — the
    equality of the two is what's being checked."""
    bins = (
        _scored(spark, sf_dir)
        .groupBy(_bin(F.col("z")).alias("bin"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("pos").cast("long").alias("n_pos"),
        )
    )
    t = F.explode(F.array(*[F.lit(t) for t in THRESHOLDS])).alias("thresh")
    exploded = bins.select("bin", "n", "n_pos", t)
    above = F.col("bin") * BIN_W >= F.col("thresh")
    # NULL bins (NULL text/n_chars) match neither side of the
    # threshold, mirroring the oracle's CASE on a NULL z.
    return (
        exploded.groupBy("thresh")
        .agg(
            F.sum(F.when(above, F.col("n_pos")).otherwise(0))
            .cast("long")
            .alias("tp"),
            F.sum(F.when(above, F.col("n") - F.col("n_pos")).otherwise(0))
            .cast("long")
            .alias("fp"),
            F.sum(F.when(~above, F.col("n_pos")).otherwise(0))
            .cast("long")
            .alias("fn"),
            F.sum(F.when(~above, F.col("n") - F.col("n_pos")).otherwise(0))
            .cast("long")
            .alias("tn"),
        )
        .select(
            F.col("thresh").cast("long").alias("thresh"),
            "tp",
            "fp",
            "fn",
            "tn",
            F.expr("(1000 * tp) div greatest(tp + fp, 1)")
            .cast("long")
            .alias("precision_milli"),
            F.expr("(1000 * tp) div greatest(tp + fn, 1)")
            .cast("long")
            .alias("recall_milli"),
        )
    )


@query(
    "classifier_auc_exact",
    oracle=f"""
    WITH t AS ({_SCORED_SQL}),
    g AS (
        SELECT z,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(pos) AS BIGINT) AS npos
        FROM t WHERE z IS NOT NULL
        GROUP BY z
    ),
    c AS (
        SELECT z, n, npos, n - npos AS nneg,
               COALESCE(SUM(n - npos) OVER (ORDER BY z
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS neg_below
        FROM g
    ),
    s AS (
        SELECT CAST(SUM(npos * (2 * neg_below + nneg)) AS BIGINT) AS num2,
               CAST(SUM(npos) AS BIGINT) AS npos,
               CAST(SUM(nneg) AS BIGINT) AS nneg
        FROM c
    )
    SELECT npos, nneg,
           CAST((1000000 * num2) // (2 * greatest(npos * nneg, 1)) AS BIGINT)
               AS auc_micro
    FROM s
    """,
)
def classifier_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of the quality classifier via the rank statistic
    (Mann-Whitney U with average-rank tie handling): over distinct
    scores z, AUC·2·npos·nneg = Σ_z npos_z·(2·neg_below(z) + nneg_z) —
    each positive beats every lower-scored negative once and splits
    ties at the same z. Integer-exact end to end (micro-AUC by floor
    division), so the hash compare is byte-stable.

    Scale shape: the corpus collapses to DISTINCT SCORES first (the
    same bounded-domain trick as vocab ranking), so the cumulative
    window runs over |score domain| rows, not corpus rows — and the
    final three-number summary is a 1-row scalar (the allowlisted
    kmv/tf_idf class). For an unbounded score domain the two-phase
    bucketed prefix-sum (peak_concurrency_daily's device) swaps in.
    NULL scores are excluded on both sides (they rank nowhere)."""
    from pyspark.sql import Window as W

    g = (
        _scored(spark, sf_dir)
        .filter(F.col("z").isNotNull())
        .groupBy("z")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("pos").cast("long").alias("npos"),
        )
        .withColumn("nneg", F.col("n") - F.col("npos"))
    )
    w = W.orderBy("z").rowsBetween(W.unboundedPreceding, -1)
    c = g.withColumn(
        "neg_below", F.coalesce(F.sum("nneg").over(w), F.lit(0))
    )
    s = c.agg(
        F.sum(
            F.col("npos") * (2 * F.col("neg_below") + F.col("nneg"))
        ).cast("long").alias("num2"),
        F.sum("npos").cast("long").alias("npos"),
        F.sum("nneg").cast("long").alias("nneg"),
    )
    return s.select(
        "npos",
        "nneg",
        F.expr("(1000000 * num2) div (2 * greatest(npos * nneg, 1))")
        .cast("long")
        .alias("auc_micro"),
    )
