"""Time-window aggregations over ``events`` (SURVEY.md §2.12 streaming
surface — new capability beyond the reference, driven by the events test
table).

Each query is written against the batch DataFrame, but the expressions
(``F.window`` / ``F.session_window``) are exactly what runs under
``readStream`` with a watermark — the streaming e2e test reuses them; the
DuckDB oracle recomputes the windows relationally (time_bucket /
gaps-and-islands), so the window semantics themselves are verified.

Scale: window aggregation is a single hash shuffle on (window, keys) with
map-side partial aggregation; in streaming mode the watermark bounds
state (late rows beyond it are dropped), and session windows merge in the
state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

SESSION_GAP = "30 minutes"


@query(
    "tumbling_window_counts",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
           time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling-window event counts per type — the canonical
    streaming aggregate (``readStream … withWatermark …
    groupBy(window(ts, '1 hour'), event_type)``); both engines align
    windows to the epoch."""
    ev = load_table(spark, sf_dir, "events")
    w = F.window("ts", "1 hour")
    return ev.groupBy(w, "event_type").agg(F.count("*").alias("n")).select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "event_type",
        "n",
    )


@query(
    "sliding_window_counts",
    oracle="""
    SELECT ws AS window_start,
           ws + INTERVAL 2 HOUR AS window_end,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (
        SELECT unnest([time_bucket(INTERVAL 1 HOUR, ts),
                       time_bucket(INTERVAL 1 HOUR, ts) - INTERVAL 1 HOUR]) AS ws
        FROM events
    )
    GROUP BY ws
    """,
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows sliding every hour: each event lands in two
    overlapping windows (Spark expands this inside the window exec; the
    oracle expands it explicitly via unnest of the two phase-shifted
    buckets)."""
    ev = load_table(spark, sf_dir, "events")
    w = F.window("ts", "2 hours", "1 hour")
    return ev.groupBy(w).agg(F.count("*").alias("n")).select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "n",
    )


@query(
    "session_window_stats",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         >= INTERVAL {SESSION_GAP}
                    THEN 1 ELSE 0 END AS brk
        FROM events
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL {SESSION_GAP} AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sess
    GROUP BY user_id, sess_id
    """,
)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap
    (``F.session_window`` — merges events while the gap to the session
    end is < 30 min; a gap >= 30 min starts a new session, which is what
    the oracle's gaps-and-islands lag/cumsum reconstruction encodes).
    The streaming twin uses the same expression with
    ``applyInPandasWithState``-free native session state."""
    ev = load_table(spark, sf_dir, "events")
    sw = F.session_window("ts", SESSION_GAP)
    return ev.groupBy("user_id", sw).agg(F.count("*").alias("n_events")).select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# Analytic (lag/lead) windows
# ---------------------------------------------------------------------------


@query(
    "event_gaps_lag",
    oracle="""
    SELECT event_id, user_id,
           epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS gap_us,
           LEAD(event_type) OVER w AS next_event_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def event_gaps_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gaps (lag) and next action (lead).

    The reference has no analytic functions beyond ROW_NUMBER (SURVEY
    §2.6); lag/lead round out the window family — the standard shape for
    sessionization features and funnel analysis. Gap is an exact BIGINT
    microsecond difference (unix_micros ≙ DuckDB epoch_us), and the
    ordering carries event_id as a unique tiebreak so both engines
    resolve equal timestamps identically.

    One hash shuffle on user_id; the sort is within-partition. Same
    scale shape as any window aggregate — skewed users are the risk,
    mitigated the usual way (salt the heavy hitters or bound per-user
    history upstream).
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_us"
        ),
        F.lead("event_type").over(w).alias("next_event_type"),
    )


@query(
    "multires_rollup_events",
    oracle="""
    WITH hourly AS (
        SELECT time_bucket(INTERVAL 1 HOUR, ts) AS h,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
    )
    SELECT time_bucket(INTERVAL 1 DAY, h) AS day,
           event_type,
           CAST(SUM(n) AS BIGINT) AS n,
           CAST(SUM(CAST(sum_value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           CAST(COUNT(*) AS BIGINT) AS n_hours
    FROM hourly
    GROUP BY 1, 2
    """,
)
def multires_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: the DAILY aggregate is
    derived from the HOURLY aggregate, never from raw events — the
    continuous-aggregate pattern (TimescaleDB hypertable rollups,
    Druid/Pinot star-tree cubes). Counts and decimal-quantized sums are
    re-aggregable, so each coarser resolution reads the much smaller
    finer rollup: at 100 TB the hourly layer is materialized
    incrementally by the streaming twin (tumbling_window_counts with
    availableNow) and day/week/month queries touch only rollup rows —
    the raw corpus is scanned exactly once per hour of data.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value_dec"),
        )
        .select(
            F.col("window.start").alias("h"), "event_type", "n", "sum_value_dec"
        )
    )
    return (
        hourly.groupBy(F.date_trunc("day", "h").alias("day"), "event_type")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("sum_value_dec").cast("double").alias("sum_value"),
            F.count("*").cast("bigint").alias("n_hours"),
        )
    )
