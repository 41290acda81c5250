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
from ..functions.cleansing import SQL_IN_QUANT_DOMAIN
from .registry import query

#: quantization-domain gate over the events value column, interpolated
#: from the canonical template so the oracle bound cannot desynchronize
#: from fn/cleansing.QUANT_DOMAIN (ADVICE r06 #2; pinned by
#: tests/test_functions.py::test_quant_domain_oracle_literals).
_VALUE_IN_QUANT = SQL_IN_QUANT_DOMAIN.format(c="value")

SESSION_GAP = "30 minutes"


@query(
    "tumbling_window_counts",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
           time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events WHERE ts IS NOT NULL
    GROUP BY 1, 2, 3
    """,
)
def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling-window event counts per type — the canonical
    streaming aggregate (``readStream … withWatermark …
    groupBy(window(ts, '1 hour'), event_type)``); both engines align
    windows to the epoch. Spark's window generator silently DROPS
    NULL timestamps while DuckDB's time_bucket groups them — the
    no-time-no-window contract is stated explicitly on both sides
    (adversarial-corpus finding, same for every window/rollup query in
    this module)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
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
        FROM events WHERE ts IS NOT NULL
    )
    GROUP BY ws
    """,
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows sliding every hour: each event lands in two
    overlapping windows (Spark expands this inside the window exec; the
    oracle expands it explicitly via unnest of the two phase-shifted
    buckets). NULL-ts contract: see tumbling_window_counts."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
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
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         >= INTERVAL {SESSION_GAP}
                    THEN 1 ELSE 0 END AS brk
        FROM events WHERE ts IS NOT NULL
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
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
    ``applyInPandasWithState``-free native session state. NULL-ts
    contract: see tumbling_window_counts."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
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
    FROM events WHERE ts IS NOT NULL
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
    history upstream). NULL-ts events are excluded on both sides: a
    row without a time has no position in the sequence, and the
    engines disagree where NULL sorts (see tumbling_window_counts).
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
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
    oracle=f"""
    WITH hourly AS (
        SELECT time_bucket(INTERVAL 1 HOUR, ts) AS h,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events
        WHERE ts IS NOT NULL AND {_VALUE_IN_QUANT}
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
    NULL-ts contract: see tumbling_window_counts; values ride the
    shared quantization-domain guard (fn/cleansing.in_quant_domain —
    NULL rows kept, NaN/±Inf/huge excluded before the DECIMAL(18,2)
    quantization can abort; nonfinite-float-sweep finding).
    """
    from ..functions.cleansing import in_quant_domain

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & in_quant_domain("value")
    )
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


# ---------------------------------------------------------------------------
# Moving aggregates + sequential funnel (product-analytics shapes)
# ---------------------------------------------------------------------------


@query(
    "moving_avg_user_value",
    oracle=f"""
    SELECT user_id, event_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS v5_sum,
           CAST(COUNT(*)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS v5_n,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS cum_sum
    FROM events
    WHERE ts IS NOT NULL AND {_VALUE_IN_QUANT}
    """,
)
def moving_avg_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user moving window (5-row sum + count) and running total over
    the event stream — the rolling-feature shape every behavioral model
    pipeline computes. Sums accumulate as DECIMAL so both engines agree
    bit-for-bit (float running sums drift between engines); the caller
    divides v5_sum/v5_n for the average. One hash-partitioned window per
    user, (ts, event_id) tiebreak keeps frames deterministic.
    NULL-ts contract: see event_gaps_lag; values ride the shared
    quantization-domain guard (fn/cleansing.in_quant_domain — NULL
    rows kept, NaN/±Inf/huge excluded before the DECIMAL cast can
    abort; out-of-domain rows leave the feature stream entirely, in
    both engines alike)."""
    from pyspark.sql import Window as W

    from ..functions.cleansing import in_quant_domain

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & in_quant_domain("value")
    )
    w5 = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, W.currentRow)
    )
    wc = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    dec = F.col("value").cast("decimal(18,2)")
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(dec).over(w5).cast("double").alias("v5_sum"),
        F.count("*").over(w5).cast("long").alias("v5_n"),
        F.sum(dec).over(wc).cast("double").alias("cum_sum"),
    )


@query(
    "funnel_conversion",
    oracle="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    v AS (
        SELECT user_id, MIN(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT u.user_id,
           CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                     WHEN c.user_id IS NOT NULL THEN 2
                     WHEN v.user_id IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS funnel_stage
    FROM u
    LEFT JOIN v ON u.user_id = v.user_id
    LEFT JOIN c ON u.user_id = c.user_id
    LEFT JOIN p ON u.user_id = p.user_id
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential funnel (view → click → purchase, strictly ordered in
    time): per user, the deepest stage reached where each step must
    happen AFTER the first occurrence of the previous step — the
    product-analytics conversion query (and the event-sequence shape
    behavioral filtering of training data uses).

    Scale: three filtered min-aggregations and three joins, all
    hash-partitioned on user_id — co-partitioned joins, no window over
    the full stream, no per-user collect. At 100 TB the same plan holds;
    a repartition(user_id) before the first agg co-locates all stages."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.select("user_id").distinct()
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c.select("user_id", "t_click"), "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    stage = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        u.join(v, "user_id", "left")
        .join(c.select("user_id", "t_click"), "user_id", "left")
        .join(p.select("user_id", "t_purchase"), "user_id", "left")
        .select("user_id", stage.cast("long").alias("funnel_stage"))
    )


@query(
    "user_value_outliers",
    oracle=f"""
    WITH q AS (
        SELECT user_id, event_id,
               CAST(CAST(floor(value * 1000000) AS BIGINT)
                    AS DECIMAL(10,0)) AS qv
        FROM events
        WHERE {_VALUE_IN_QUANT}
    ),
    st AS (
        SELECT user_id,
               CAST(COUNT(*) AS DECIMAL(9,0)) AS n,
               CAST(SUM(qv) AS DECIMAL(18,0)) AS s,
               CAST(SUM(CAST(qv AS DECIMAL(19,0)) * qv) AS DECIMAL(28,0)) AS ss
        FROM q GROUP BY user_id
    ),
    d AS (
        SELECT q.user_id, q.event_id,
               CAST(st.n * q.qv - st.s AS DECIMAL(18,0)) AS dev,
               st.n, st.s, st.ss
        FROM q JOIN st ON q.user_id = st.user_id
    )
    SELECT user_id, event_id FROM d
    WHERE CAST(dev AS DECIMAL(19,0)) * dev
          > 4 * (n * ss - CAST(s AS DECIMAL(19,0)) * s)
    """,
)
def user_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score outliers (|value - mean| > 2·stddev), computed
    ENTIRELY in integer arithmetic so both engines agree exactly: values
    quantize to micro-units and the z-test (v - mean)² > 4·var becomes
    (n·qv - s)² > 4·(n·ss - s²) after multiplying through by n² — no
    float sqrt, no variance drift. DECIMAL widths are tuned, not
    maximal: DuckDB executes products of width ≤ 18 in int64 (runtime
    overflow for these magnitudes) and refuses products wider than 38,
    so every multiplication is arranged to land in (19, 38] — the
    int128 window. The shape every data-quality pass needs (flag
    anomalous numeric rows per entity) with cross-engine-reproducible
    output.

    The z-test operates within the micro-quantization domain
    |value| < 10^4 (whose quantized form fills DECIMAL(10,0) exactly —
    the widths above are load-bearing, see below): NaN/±Inf have no
    z-score, and a huge-but-finite value (1e308) saturates Spark's
    floor(double→long) at LONG_MIN where DuckDB's cast aborts
    (nonfinite-float-sweep finding). The SQL_IN_QUANT_DOMAIN gate
    (abs(value) < QUANT_DOMAIN) excludes all of those in one portable
    predicate (NaN compares above everything in both engines, so it
    fails the <); out-of-domain magnitudes are
    a RANGE-check violation — a different quality rule, upstream of
    z-scoring. NULL rows are KEPT (``IS NULL OR ...``) so the per-user
    row counts — and with them every deviation threshold — are
    unchanged.

    Scale: one partial-agg groupBy per user for (n, s, ss), then a
    co-partitioned join back — no window, no collect; the stats frame is
    |users| rows."""
    from ..functions.cleansing import in_quant_domain

    ev = load_table(spark, sf_dir, "events").filter(
        in_quant_domain("value")
    )
    q = ev.select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 1_000_000)
        .cast("long")
        .cast("decimal(10,0)")
        .alias("qv"),
    )
    st = q.groupBy("user_id").agg(
        F.count("*").cast("decimal(9,0)").alias("n"),
        F.sum("qv").cast("decimal(18,0)").alias("s"),
        F.sum(F.col("qv") * F.col("qv")).cast("decimal(28,0)").alias("ss"),
    )
    j = q.join(st, "user_id").withColumn(
        "dev", (F.col("n") * F.col("qv") - F.col("s")).cast("decimal(18,0)")
    )
    var_n2 = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    return j.filter(F.col("dev") * F.col("dev") > 4 * var_n2).select(
        "user_id", "event_id"
    )


@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events WHERE ts IS NOT NULL
    ),
    pairs AS (
        SELECT prev_type AS from_type, event_type AS to_type,
               COUNT(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT from_type, to_type,
           CAST(n AS BIGINT) AS n,
           CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS n_from,
           CAST((1000 * n) // SUM(n) OVER (PARTITION BY from_type)
                AS BIGINT) AS share_permille
    FROM pairs
    ORDER BY from_type, to_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavior model: the event-type transition matrix —
    for every (from, to) pair of consecutive events within a user
    stream, the count and the row-normalized transition share (the
    empirical Markov matrix funnels and next-action predictors start
    from).

    Plan: one lag() window partitioned by user_id (sequence stays
    inside each user's partition), one groupBy on the (from, to) pair,
    then the row-normalizing window over the K×K result — bounded by
    the event-type-cardinality square (25 rows here), partitioned by
    from_type so even that is parallel. Shares are integer permille
    (1000·n DIV row total): exact in both engines, no float
    division. NULL-ts contract: see event_gaps_lag."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    pairs = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    wrow = Window.partitionBy("from_type")
    return (
        pairs.select(
            "from_type",
            "to_type",
            F.col("n").cast("long").alias("n"),
            F.sum("n").over(wrow).cast("long").alias("n_from"),
        )
        .withColumn(
            "share_permille",
            F.expr("(1000 * n) DIV n_from").cast("long"),
        )
        .orderBy("from_type", "to_type")
    )


#: journey length (first N events) and how many top paths to report
PATH_LEN = 4
PATH_TOP_K = 20


@query(
    "top_event_paths",
    oracle=f"""
    WITH ranked AS (
        SELECT user_id, event_type,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS rn
        FROM events WHERE ts IS NOT NULL
    ),
    paths AS (
        SELECT user_id,
               COALESCE(string_agg(event_type, '>' ORDER BY rn), '')
                   AS path
        FROM ranked WHERE rn <= {PATH_LEN}
        GROUP BY user_id
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM paths
    GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT {PATH_TOP_K}
    """,
)
def top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: each user's first {PATH_LEN} event types as an
    ordered path string, counted and ranked — the onboarding-funnel
    discovery query ("what do users actually do first?").

    Plan: one user-partitioned rank window keeps only the first
    {PATH_LEN} events per user (WindowGroupLimit prunes the rest before
    they move), the path assembles per user from a sorted struct
    collect — order carried by the (rn, type) struct sort inside the
    group, NOT by assuming collect_list order — and the final count +
    top-k is a groupBy on the path string with TakeOrderedAndProject.
    The only full-data stage is the first window; everything after
    operates on one row per user, then one row per distinct path.

    NULL contract (adversarial-corpus finding): both engines SKIP NULL
    event types inside a path (concat_ws drops NULL array elements;
    string_agg ignores NULL inputs), but a user whose every ranked
    event is NULL gets '' from concat_ws and NULL from string_agg —
    the oracle coalesces so both report the empty path.
    NULL-ts contract: see event_gaps_lag."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = e.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= PATH_LEN)
    paths = ranked.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(PATH_TOP_K)
    )


#: ntile bucket count for the customer-value quartiles
NTILE_BUCKETS = 4


@query(
    "ntile_customer_quartiles",
    oracle=f"""
    WITH tiled AS (
        SELECT c_mktsegment, c_acctbal,
               NTILE({NTILE_BUCKETS}) OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey
               ) AS quartile
        FROM customer
    )
    SELECT c_mktsegment, CAST(quartile AS BIGINT) AS quartile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               AS segment_balance
    FROM tiled
    GROUP BY c_mktsegment, quartile
    ORDER BY c_mktsegment, quartile
    """,
)
def ntile_customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-value quartiles per market segment — NTILE over a
    UNIQUE total order (balance desc, custkey tiebreak; without the
    tiebreak, engines may split ties across bucket boundaries
    differently), rolled up to (segment, quartile) balance totals.

    Scale plan: one exchange on c_mktsegment feeds the window; a
    handful of segments caps parallelism here, so at real scale the
    pattern of choice is the histogram-quantile sketch
    (timeseries.histogram_quantiles) — NTILE is the exact-assignment
    variant for when every ROW needs its bucket id (e.g. building
    training strata), and the rollup keeps the result at
    segments × {NTILE_BUCKETS} rows."""
    from pyspark.sql import Window

    from .registry import dsum

    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.col("c_custkey")
    )
    return (
        c.withColumn("quartile", F.ntile(NTILE_BUCKETS).over(w).cast("long"))
        .groupBy("c_mktsegment", "quartile")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            dsum("c_acctbal", 2).alias("segment_balance"),
        )
        .orderBy("c_mktsegment", "quartile")
    )


@query(
    "percent_rank_part_prices",
    oracle="""
    SELECT p_brand, p_partkey,
           PERCENT_RANK() OVER (
               PARTITION BY p_brand
               ORDER BY p_retailprice, p_partkey
           ) AS price_pr,
           CUME_DIST() OVER (
               PARTITION BY p_brand
               ORDER BY p_retailprice, p_partkey
           ) AS price_cd
    FROM part
    WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
    ORDER BY p_brand, p_partkey
    """,
)
def percent_rank_part_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative price position of every part within its brand —
    PERCENT_RANK ((rank−1)/(n−1)) and CUME_DIST (rank/n) over the same
    unique order, so both are single exact IEEE divisions that match
    cross-engine bit-for-bit.

    Scale plan: one exchange on p_brand; each brand's partition sorts
    independently (thousands of brands at catalog scale → full
    parallelism); the two ranks share one window frame, so Spark
    computes them in a single Window operator pass, no second sort."""
    from pyspark.sql import Window

    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    )
    w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return (
        p.select(
            "p_brand",
            "p_partkey",
            F.percent_rank().over(w).alias("price_pr"),
            F.cume_dist().over(w).alias("price_cd"),
        )
        .orderBy("p_brand", "p_partkey")
    )
