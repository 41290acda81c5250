"""Time-series operators: time-weighted aggregation, gap-fill with
carry-forward, fixed-bin histograms (SURVEY.md §2.12a L63-L65).

The events table is an irregular observation stream; these are the three
hypertable-style primitives consumers ask of one (the shapes TimescaleDB
ships as ``time_weight``/``locf``/``histogram``), built as pure
window/join dataflows partitioned by user_id — per-series work stays
inside one partition, series process in parallel, nothing global.

Determinism devices: durations are integer seconds (unix_micros DIV),
values quantized to integer milli-units BEFORE multiplication (the
``floor(x·1e3)`` device shared with functions/vectors.py), and ratios
divide two exactly-representable-in-double integers — so Spark and
DuckDB hash-compare exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.cleansing import SQL_IN_QUANT_DOMAIN
from .registry import query

#: quantization-domain gate over the events value column, interpolated
#: from the canonical template so the oracle bound cannot desynchronize
#: from fn/cleansing.QUANT_DOMAIN (ADVICE r06 #2; pinned by
#: tests/test_functions.py::test_quant_domain_oracle_literals).
_VALUE_IN_QUANT = SQL_IN_QUANT_DOMAIN.format(c="value")

__all__ = [
    "time_weighted_avg_value",
    "gap_fill_hourly_locf",
    "value_histogram_events",
]


@query(
    "time_weighted_avg_value",
    oracle=f"""
    WITH seq AS (
        SELECT user_id,
               CAST(FLOOR(value * 1000) AS BIGINT) AS vmilli,
               (epoch_us(lead(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                )) - epoch_us(ts)) // 1000000 AS dur_s
        FROM events
        WHERE {_VALUE_IN_QUANT}
    )
    SELECT user_id,
           CAST(SUM(vmilli * dur_s) AS BIGINT) AS num_milli_sec,
           CAST(SUM(dur_s) AS BIGINT) AS total_sec,
           CAST(SUM(vmilli * dur_s) AS DOUBLE)
               / CAST(SUM(dur_s) AS DOUBLE) AS twa_milli
    FROM seq
    WHERE dur_s IS NOT NULL
    GROUP BY user_id
    HAVING SUM(dur_s) > 0
    """,
)
def time_weighted_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of `value` per user — each observation
    weighted by how long it was current (until the next event), the
    correct mean for irregularly-sampled state.

    Plan: one lead() window partitioned by user_id (each series sorts
    locally inside its partition), then a groupBy on the SAME key — the
    aggregation reuses the window's hash partitioning, so the whole
    query pays ONE exchange. Arithmetic: value quantized to integer
    milli-units, duration to integer seconds; the weighted sum is exact
    BIGINT (bounded by milli-value·series-span ≈ 1.3e12 per user, far
    inside both BIGINT and double-exact range), and the final ratio
    divides two exactly-representable doubles — identical IEEE result
    in both engines, no decimal→double rounding hazard. The last
    observation of each series has no successor and drops out (NULL
    duration), the standard open-interval convention. Values ride the
    shared quantization-domain guard (fn/cleansing.in_quant_domain —
    NULL rows kept so their durations still count; NaN/±Inf/huge
    excluded BEFORE the lead() chain, so an out-of-domain observation
    hands its interval to its predecessor in both engines alike;
    nonfinite-float-sweep finding)."""
    from ..functions.cleansing import in_quant_domain

    e = load_table(spark, sf_dir, "events").filter(
        in_quant_domain("value")
    )
    seq = e.select(
        "user_id",
        F.floor(F.col("value") * 1000).cast("long").alias("vmilli"),
        F.expr(
            "(unix_micros(lead(ts) over (partition by user_id"
            " order by ts, event_id)) - unix_micros(ts)) div 1000000"
        ).alias("dur_s"),
    )
    return (
        seq.filter(F.col("dur_s").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(F.col("vmilli") * F.col("dur_s"))
            .cast("long")
            .alias("num_milli_sec"),
            F.sum("dur_s").cast("long").alias("total_sec"),
        )
        .filter(F.col("total_sec") > 0)
        .select(
            "user_id",
            "num_milli_sec",
            "total_sec",
            (
                F.col("num_milli_sec").cast("double")
                / F.col("total_sec").cast("double")
            ).alias("twa_milli"),
        )
    )


#: microseconds per hour — the gap-fill bucket width
HOUR_US = 3_600_000_000

#: longest gap (in hours) the fill will synthesize rows across. Gaps
#: longer than this break the series: synthesized rows stop after
#: MAX_FILL_HOURS slots and resume at the next real observation. This
#: bounds the operator's fan-out to O(observations × MAX_FILL_HOURS)
#: regardless of the data — without it, ONE corrupt centuries-away
#: timestamp makes the dense min..max spine ~5M slots per affected
#: series (measured: TaskResultLost abort on a 1678..2262 corpus).
#: 2000 h ≈ 83 days; the widest real gap at sf0.1 is 141 h (14×
#: headroom), so results on the test corpora are identical to an
#: unbounded fill.
MAX_FILL_HOURS = 2000


@query(
    "gap_fill_hourly_locf",
    oracle=f"""
    WITH hourly AS (
        SELECT user_id, epoch_us(ts) // {HOUR_US} AS hr, value,
               row_number() OVER (
                   PARTITION BY user_id, epoch_us(ts) // {HOUR_US}
                   ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
    ),
    last_per_hr AS (
        SELECT user_id, hr, value FROM hourly WHERE rn = 1
    ),
    obs AS (
        SELECT user_id, hr, value,
               lead(hr) OVER (
                   PARTITION BY user_id ORDER BY hr NULLS FIRST
               ) AS next_hr
        FROM last_per_hr
    ),
    slots AS (
        SELECT user_id, value, hr AS obs_hr,
               unnest(generate_series(hr,
                   LEAST(COALESCE(next_hr - 1, hr),
                         hr + {MAX_FILL_HOURS}))) AS hr
        FROM obs
    )
    SELECT user_id, hr,
           last_value(CASE WHEN hr = obs_hr THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY hr
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS filled_value,
           (hr != obs_hr OR value IS NULL) AS is_gap
    FROM slots
    """,
)
def gap_fill_hourly_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill each user's series to an hourly grid, filling missing
    hours by last-observation-carried-forward (LOCF) — but never
    across a gap wider than MAX_FILL_HOURS (series break instead).

    Plan: reduce events to one observation per (user, hour) — the
    latest, via a per-bucket row_number — then generate each
    OBSERVATION's slot run with sequence()/explode: from its own hour
    up to the hour before the next observation, capped at
    MAX_FILL_HOURS. The cap is the 100 TB safety property: fan-out is
    O(observations × cap) by construction, so a single corrupt
    pre-1970/far-future timestamp cannot inflate a series' spine into
    millions of rows (the former per-series min..max dense spine
    did exactly that — one 1678 event meant a ~5M-slot array). The
    LOCF itself is last(ignorenulls) over the user-partitioned slot
    order, so an observed-but-NULL value still carries the previous
    non-null one; the filled value is the raw stored double carried
    unchanged. is_gap marks synthesized rows and observed-NULL hours.
    Vs the join-based spine this also drops a groupBy and the
    spine↔observation join: slots inherit their generating
    observation inline. NULL timestamps vanish in both engines
    (sequence(NULL,·) explodes to nothing; lead ordering is pinned
    NULLS FIRST to Spark's default so neighbours agree)."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.select(
        "user_id",
        F.expr(f"unix_micros(ts) div {HOUR_US}").alias("hr"),
        "value",
        "ts",
        "event_id",
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("user_id", "hr").orderBy(
                F.desc("ts"), F.desc("event_id")
            )
        ),
    )
    last_per_hr = hourly.filter(F.col("rn") == 1).select(
        "user_id", "hr", "value"
    )
    obs = last_per_hr.withColumn(
        "next_hr",
        F.lead("hr").over(
            Window.partitionBy("user_id").orderBy(F.asc_nulls_first("hr"))
        ),
    )
    slots = obs.select(
        "user_id",
        "value",
        F.col("hr").alias("obs_hr"),
        F.explode(
            F.expr(
                "sequence(hr, least(coalesce(next_hr - 1, hr),"
                f" hr + {MAX_FILL_HOURS}))"
            )
        ).alias("hr"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return slots.select(
        "user_id",
        "hr",
        F.last(
            F.when(F.col("hr") == F.col("obs_hr"), F.col("value")),
            ignorenulls=True,
        ).over(w).alias("filled_value"),
        (
            (F.col("hr") != F.col("obs_hr")) | F.col("value").isNull()
        ).alias("is_gap"),
    )


#: histogram geometry: 20 bins of width 25 covering the value domain
HIST_WIDTH = 25
HIST_BINS = 20


@query(
    "value_histogram_events",
    oracle=f"""
    WITH binned AS (
        SELECT CAST(LEAST(GREATEST(FLOOR(value / {HIST_WIDTH}), -1),
                          {HIST_BINS - 1}) AS BIGINT) AS bin,
               COUNT(*) AS n
        FROM events WHERE isfinite(value) GROUP BY 1
    ),
    spine AS (
        SELECT unnest(generate_series(0, {HIST_BINS - 1})) AS bin
    )
    SELECT s.bin,
           CAST(s.bin * {HIST_WIDTH} AS DOUBLE) AS lo,
           CAST((s.bin + 1) * {HIST_WIDTH} AS DOUBLE) AS hi,
           CAST(COALESCE(b.n, 0) AS BIGINT) AS n
    FROM spine s LEFT JOIN binned b ON s.bin = b.bin
    ORDER BY s.bin
    """,
)
def value_histogram_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin value histogram over events, WITH empty bins — the
    difference between a GROUP BY (which silently omits zero-count
    bins, breaking downstream plotting/alerting) and a histogram.

    Plan: one map-side-combined groupBy on the bin id (the only
    shuffle, ≤{HIST_BINS} result rows), then a generated bin spine
    ({HIST_BINS} rows from one sequence()) left-joins the counts and
    coalesces absent bins to 0. The bin id is floor(value/width) —
    a single IEEE divide+floor, identical in both engines. The spine
    is constant-size, so the join broadcasts it; at any data scale the
    post-aggregation work is O(bins)."""
    from ..functions.cleansing import is_finite

    # Histogram over FINITE values: NULL/NaN/±Inf aren't on the real
    # line — NaN's bin cast aborts under ANSI in both engines
    # (nonfinite-float-sweep finding), so they're excluded up front by
    # the shared is_finite predicate (which drops NULL too, matching
    # the previous NULL-bin fall-off behaviour exactly).
    e = load_table(spark, sf_dir, "events").filter(is_finite("value"))
    # clamp into the top bin: values past the spine (observed at bench
    # scale: value > 500) would otherwise fall off the left join and
    # silently vanish from the histogram — the exact inaccuracy the
    # spine exists to prevent (review finding). The low clamp (-1, a
    # sentinel bin the spine join drops) keeps huge-but-FINITE
    # negatives portable: Spark's floor(double→long) silently
    # SATURATES at LONG_MIN where DuckDB's BIGINT cast aborts
    # (nonfinite-float-sweep finding), so the clamp must happen before
    # any engine-specific saturation can differ.
    binned = (
        e.groupBy(
            F.least(
                F.greatest(
                    F.floor(F.col("value") / HIST_WIDTH).cast("long"),
                    F.lit(-1),
                ),
                F.lit(HIST_BINS - 1),
            ).alias("bin")
        ).agg(F.count("*").alias("n"))
    )
    spine = spark.range(1).select(
        F.explode(F.expr(f"sequence(0, {HIST_BINS - 1})")).alias("bin")
    )
    return (
        spine.join(F.broadcast(binned), "bin", "left")
        .select(
            F.col("bin").cast("long").alias("bin"),
            (F.col("bin") * HIST_WIDTH).cast("double").alias("lo"),
            ((F.col("bin") + 1) * HIST_WIDTH).cast("double").alias("hi"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        )
        .orderBy("bin")
    )


#: quantile targets in permille, and the fine histogram geometry the
#: quantiles are read from (width 0.5 over the value domain [0, 500))
QUANTILES_PERMILLE = (500, 900, 990)
FINE_BINS_PER_UNIT = 2
#: fine bins clamp to ±2^40: far outside any real value domain (the
#: quantile targets are unaffected — clamped extremes stay extreme in
#: the cumulative order), but inside the window where double FLOOR is
#: exact (2^52) and the BIGINT cast total. Without it a huge-but-
#: finite value (1e308) makes Spark's floor(double→long) SATURATE
#: silently while DuckDB's cast ABORTS — the clamp pins one portable
#: behaviour before the engines can diverge.
FINE_BIN_CLAMP = 1 << 40


@query(
    "histogram_quantiles",
    oracle=f"""
    WITH hist AS (
        SELECT CAST(LEAST(GREATEST(FLOOR(value * {FINE_BINS_PER_UNIT}),
                                   -{FINE_BIN_CLAMP}),
                          {FINE_BIN_CLAMP}) AS BIGINT) AS bin,
               COUNT(*) AS n
        FROM events WHERE isfinite(value) GROUP BY 1
    ),
    cum AS (
        SELECT bin, SUM(n) OVER (
            ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS cum_n
        FROM hist
    ),
    tot AS (SELECT COUNT(*) AS n_total FROM events
            WHERE isfinite(value)),
    hit AS (
        SELECT
          MIN(CASE WHEN cum_n >= (500 * n_total + 999) // 1000
                   THEN bin END) AS b500,
          MIN(CASE WHEN cum_n >= (900 * n_total + 999) // 1000
                   THEN bin END) AS b900,
          MIN(CASE WHEN cum_n >= (990 * n_total + 999) // 1000
                   THEN bin END) AS b990,
          MAX(n_total) AS n_total
        FROM cum, tot
    )
    SELECT 500 AS quantile_permille, b500 AS bin,
           CAST(b500 AS DOUBLE) / {FINE_BINS_PER_UNIT} AS lo,
           CAST(b500 + 1 AS DOUBLE) / {FINE_BINS_PER_UNIT} AS hi,
           CAST(n_total AS BIGINT) AS n_total FROM hit
    UNION ALL
    SELECT 900, b900, CAST(b900 AS DOUBLE) / {FINE_BINS_PER_UNIT},
           CAST(b900 + 1 AS DOUBLE) / {FINE_BINS_PER_UNIT},
           CAST(n_total AS BIGINT) FROM hit
    UNION ALL
    SELECT 990, b990, CAST(b990 AS DOUBLE) / {FINE_BINS_PER_UNIT},
           CAST(b990 + 1 AS DOUBLE) / {FINE_BINS_PER_UNIT},
           CAST(n_total AS BIGINT) FROM hit
    """,
)
def histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantiles: p50/p90/p99 read off a fine fixed-bin
    histogram — the 100 TB quantile pattern. An exact quantile needs a
    global sort (or per-group sort) of the raw data; a histogram needs
    ONE map-side-combined groupBy, its per-partition states merge by
    addition (so it composes across days/sources/rollups), and the
    quantile is then a constant-size post-processing step with a known
    error bound of one bin width.

    Plan: bin groupBy (the only wide stage, ≤1000 result rows), running
    sum over the bounded bin table (single partition of ≤1000 rows —
    the same deliberately-tiny tail as key_skew_profile), the 1-row
    count scalar broadcast in, and all three quantile targets found in
    ONE aggregate pass (MIN(CASE WHEN cum≥target THEN bin)). Targets
    are integer ceil((q·n)/1000); the reported [lo, hi) brackets the
    true quantile by construction. Rows with NULL or nonfinite value
    carry no rankable measurement and are excluded on both sides
    (Spark's FLOOR(NULL) bin would otherwise sort into the cumulative
    sum at the opposite end from DuckDB's — adversarial-corpus
    finding; a NaN/±Inf bin cast aborts DuckDB's BIGINT cast outright
    — nonfinite-float-sweep finding; the shared is_finite predicate
    drops NULL too, so one filter covers both)."""
    from ..functions.cleansing import is_finite

    e = load_table(spark, sf_dir, "events").filter(is_finite("value"))
    hist = e.groupBy(
        F.least(
            F.greatest(
                F.floor(F.col("value") * FINE_BINS_PER_UNIT).cast("long"),
                F.lit(-FINE_BIN_CLAMP),
            ),
            F.lit(FINE_BIN_CLAMP),
        ).alias("bin")
    ).agg(F.count("*").alias("n"))
    cum = hist.select(
        "bin",
        F.sum("n")
        .over(
            Window.orderBy("bin").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("cum_n"),
    )
    # n_total derives from the ALREADY-REDUCED histogram (every event
    # lands in exactly one bin), not a second full scan of events —
    # at 100 TB the extra scan doubles the corpus I/O (review finding)
    tot = hist.agg(F.sum("n").alias("n_total"))
    hit = cum.crossJoin(F.broadcast(tot)).agg(
        *[
            F.min(
                F.when(
                    F.col("cum_n")
                    >= F.expr(f"({q} * n_total + 999) div 1000"),
                    F.col("bin"),
                )
            ).alias(f"b{q}")
            for q in QUANTILES_PERMILLE
        ],
        F.max("n_total").alias("n_total"),
    )
    rows = ", ".join(
        f"{q}L, b{q}, cast(b{q} as double) / {FINE_BINS_PER_UNIT}, "
        f"cast(b{q} + 1 as double) / {FINE_BINS_PER_UNIT}"
        for q in QUANTILES_PERMILLE
    )
    return hit.select(
        F.expr(
            f"stack({len(QUANTILES_PERMILLE)}, {rows})"
            " as (quantile_permille, bin, lo, hi)"
        ),
        F.col("n_total").cast("long").alias("n_total"),
    )


#: the incremental boundary: days before this are the "stored" rollup,
#: days from it on are the "delta" being merged in
ROLLUP_SPLIT_DAY = "2024-01-16"


@query(
    "incremental_rollup_merge",
    oracle=f"""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT)
               AS sum_vmilli,
           CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS avg_vmilli
    FROM events
    WHERE ts IS NOT NULL AND {_VALUE_IN_QUANT}
    GROUP BY 1, 2
    """,
)
def incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance: a stored daily rollup merged with
    a new delta partition MUST equal the full recompute — and the
    oracle is that full recompute, so the driver's hash compare
    certifies the merge algebra itself.

    The engine side deliberately computes the rollup INCREMENTALLY:
    partial states (count, integer value sum) for the history slice and
    the delta slice separately, then a union + re-aggregate — the
    O(delta + rollup) nightly-maintenance path, vs the O(history)
    recompute. The algebra that makes it valid: keep SUMs and COUNTs as
    the stored state (they merge by addition) and derive AVG at read
    time — never store an average, averages don't merge. At 100 TB the
    history side reads the (tiny) stored rollup table, not the events
    table; here both sides derive from events with a date split so the
    oracle can state the equivalent single-pass query. NULL-ts rows
    belong to no day and are excluded on both sides (the Spark split
    filters already dropped them implicitly — NULL < split is NULL —
    while the oracle grouped them into a NULL day;
    adversarial-corpus finding). Values ride the shared
    quantization-domain guard (fn/cleansing.in_quant_domain — NULL
    rows kept for the count, NaN/±Inf/huge excluded before the milli
    quantization saturates/aborts; nonfinite-float-sweep finding)."""
    from ..functions.cleansing import in_quant_domain

    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & in_quant_domain("value")
    )
    # string day key: pandas-level date-vs-datetime ambiguity between
    # engines' DATE types makes the hash compare flaky; 'yyyy-MM-dd' is
    # unambiguous in both
    day = F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias("day")
    vmilli = F.floor(F.col("value") * 1000).cast("long")
    split = F.lit(ROLLUP_SPLIT_DAY).cast("date")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(day, "event_type").agg(
            F.count("*").cast("long").alias("n"),
            F.sum(vmilli).cast("long").alias("sum_vmilli"),
        )

    stored = partial(e.filter(F.col("ts").cast("date") < split))
    delta = partial(e.filter(F.col("ts").cast("date") >= split))
    return (
        stored.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sum_vmilli").cast("long").alias("sum_vmilli"),
        )
        .select(
            "day",
            "event_type",
            "n",
            "sum_vmilli",
            (
                F.col("sum_vmilli").cast("double")
                / F.col("n").cast("double")
            ).alias("avg_vmilli"),
        )
    )


#: rolling-window width in days for active-user counting
WAU_WINDOW_DAYS = 7


@query(
    "rolling_active_users",
    oracle=f"""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    mx AS (SELECT MAX(day) AS max_day FROM ud),
    contrib AS (
        SELECT ud.user_id, ud.day AS active_day,
               ud.day + CAST(o AS INTEGER) AS target_day
        FROM ud, UNNEST(generate_series(0, {WAU_WINDOW_DAYS - 1})) AS t(o)
    )
    SELECT strftime(target_day, '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau,
           CAST(COUNT(DISTINCT CASE WHEN active_day = target_day
                                    THEN user_id END) AS BIGINT) AS dau
    FROM contrib, mx
    WHERE target_day <= mx.max_day
    GROUP BY target_day
    ORDER BY target_day
    """,
)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling {WAU_WINDOW_DAYS}-day active users (WAU) next to daily
    actives (DAU) — the metric a naive implementation computes with a
    per-day COUNT(DISTINCT) over a self-joined date range, which
    re-scans the stream once per day.

    The scalable rewrite: reduce to distinct (user, day) pairs ONCE
    (the only full-data shuffle), then each pair CONTRIBUTES itself to
    the {WAU_WINDOW_DAYS} window anchors it falls into — a constant-
    factor explode, not a range join — and one distinct-count per
    anchor day finishes it. DAU rides the same pass as a conditional
    distinct (offset-0 contributions only). Anchors past the stream
    end are dropped via the 1-row max-day scalar (broadcast). Day keys
    are 'yyyy-MM-dd' strings — engine DATE types differ at the pandas
    level; strings don't."""
    e = load_table(spark, sf_dir, "events")
    ud = e.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    mx = ud.agg(F.max("day").alias("max_day"))
    contrib = ud.select(
        "user_id",
        F.col("day").alias("active_day"),
        F.explode(
            F.expr(f"sequence(0, {WAU_WINDOW_DAYS - 1})")
        ).alias("o"),
    ).select(
        "user_id",
        "active_day",
        F.expr("date_add(active_day, o)").alias("target_day"),
    )
    return (
        contrib.crossJoin(F.broadcast(mx))
        .filter(F.col("target_day") <= F.col("max_day"))
        .groupBy("target_day")
        .agg(
            F.countDistinct("user_id").cast("long").alias("wau"),
            F.countDistinct(
                F.when(
                    F.col("active_day") == F.col("target_day"),
                    F.col("user_id"),
                )
            )
            .cast("long")
            .alias("dau"),
        )
        .select(
            F.date_format("target_day", "yyyy-MM-dd").alias("day"),
            "wau",
            "dau",
        )
        .orderBy("day")
    )


@query(
    "quantiles_by_event_type",
    oracle=f"""
    WITH hist AS (
        SELECT event_type,
               CAST(LEAST(GREATEST(FLOOR(value * {FINE_BINS_PER_UNIT}),
                                   -{FINE_BIN_CLAMP}),
                          {FINE_BIN_CLAMP}) AS BIGINT) AS bin,
               COUNT(*) AS n
        FROM events WHERE isfinite(value) GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, bin,
               SUM(n) OVER (
                   PARTITION BY event_type ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_n
        FROM hist
    ),
    tot AS (
        SELECT event_type, COUNT(*) AS n_group FROM events
        WHERE isfinite(value) GROUP BY 1
    ),
    hit AS (
        SELECT c.event_type,
          MIN(CASE WHEN cum_n >= (500 * n_group + 999) // 1000
                   THEN bin END) AS b500,
          MIN(CASE WHEN cum_n >= (900 * n_group + 999) // 1000
                   THEN bin END) AS b900,
          MIN(CASE WHEN cum_n >= (990 * n_group + 999) // 1000
                   THEN bin END) AS b990,
          MAX(n_group) AS n_group
        FROM cum c JOIN tot t ON c.event_type = t.event_type
        GROUP BY c.event_type
    )
    SELECT event_type, 500 AS quantile_permille,
           CAST(b500 AS DOUBLE) / {FINE_BINS_PER_UNIT} AS lo,
           CAST(b500 + 1 AS DOUBLE) / {FINE_BINS_PER_UNIT} AS hi,
           CAST(n_group AS BIGINT) AS n_group FROM hit
    UNION ALL
    SELECT event_type, 900, CAST(b900 AS DOUBLE) / {FINE_BINS_PER_UNIT},
           CAST(b900 + 1 AS DOUBLE) / {FINE_BINS_PER_UNIT},
           CAST(n_group AS BIGINT) FROM hit
    UNION ALL
    SELECT event_type, 990, CAST(b990 AS DOUBLE) / {FINE_BINS_PER_UNIT},
           CAST(b990 + 1 AS DOUBLE) / {FINE_BINS_PER_UNIT},
           CAST(n_group AS BIGINT) FROM hit
    """,
)
def quantiles_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped mergeable quantiles: p50/p90/p99 of value PER EVENT TYPE
    off per-group fine histograms — histogram_quantiles' grouped form,
    and the shape that shows why the histogram route wins at scale: an
    exact per-group quantile needs a sort within every group; the
    histogram needs one (group, bin) groupBy, and the cumulative window
    runs over each group's ≤1000-row bin table PARTITIONED BY GROUP —
    groups in parallel, bounded input, never a single-partition stage
    (contrast with the global histogram_quantiles, whose one bounded
    window is the documented exception). Group totals join back
    broadcast; all three targets resolve in one MIN(CASE) aggregate
    per group. NULL/nonfinite-value contract and the ±2^40 bin clamp:
    see histogram_quantiles — same predicate, same clamp, same
    reasons."""
    from ..functions.cleansing import is_finite

    e = load_table(spark, sf_dir, "events").filter(is_finite("value"))
    hist = e.groupBy(
        "event_type",
        F.least(
            F.greatest(
                F.floor(F.col("value") * FINE_BINS_PER_UNIT).cast("long"),
                F.lit(-FINE_BIN_CLAMP),
            ),
            F.lit(FINE_BIN_CLAMP),
        ).alias("bin"),
    ).agg(F.count("*").alias("n"))
    cum = hist.select(
        "event_type",
        "bin",
        F.sum("n")
        .over(
            Window.partitionBy("event_type")
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("cum_n"),
    )
    # group totals from the reduced histogram, not a second events scan
    # (same reasoning as histogram_quantiles)
    tot = hist.groupBy("event_type").agg(F.sum("n").alias("n_group"))
    hit = (
        cum.join(F.broadcast(tot), "event_type")
        .groupBy("event_type")
        .agg(
            *[
                F.min(
                    F.when(
                        F.col("cum_n")
                        >= F.expr(f"({q} * n_group + 999) div 1000"),
                        F.col("bin"),
                    )
                ).alias(f"b{q}")
                for q in QUANTILES_PERMILLE
            ],
            F.max("n_group").alias("n_group"),
        )
    )
    rows = ", ".join(
        # {q}L long literal — keep in lockstep with histogram_quantiles'
        # stack rows (review finding: the two had drifted on the suffix)
        f"{q}L, b{q}, cast(b{q} as double) / {FINE_BINS_PER_UNIT}, "
        f"cast(b{q} + 1 as double) / {FINE_BINS_PER_UNIT}"
        for q in QUANTILES_PERMILLE
    )
    return hit.select(
        "event_type",
        F.expr(
            f"stack({len(QUANTILES_PERMILLE)}, {rows})"
            " as (quantile_permille, bin, lo, hi)"
        ),
        F.col("n_group").cast("long").alias("n_group"),
    ).select("event_type", "quantile_permille", "lo", "hi", "n_group")


# ---------------------------------------------------------------------------
# M4 downsampling (visual-fidelity time-series reduction)
# ---------------------------------------------------------------------------

#: 6-hour pixel buckets over the 30-day events span (~120 buckets)
M4_BUCKET_US = 6 * 3_600_000_000


@query(
    "m4_downsample_events",
    oracle=f"""
    WITH e AS (
        SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS us, value,
               CAST(epoch_us(ts) // {M4_BUCKET_US} AS BIGINT) AS bucket
        FROM events WHERE value IS NOT NULL
    ),
    r AS (
        SELECT *,
            row_number() OVER (PARTITION BY bucket
                               ORDER BY us, event_id) AS rf,
            row_number() OVER (PARTITION BY bucket
                               ORDER BY us DESC, event_id DESC) AS rl,
            row_number() OVER (PARTITION BY bucket
                               ORDER BY value, event_id) AS rmn,
            row_number() OVER (PARTITION BY bucket
                               ORDER BY value DESC, event_id DESC) AS rmx
        FROM e
    )
    SELECT bucket, 'first' AS role, event_id, us, value FROM r WHERE rf = 1
    UNION ALL
    SELECT bucket, 'last', event_id, us, value FROM r WHERE rl = 1
    UNION ALL
    SELECT bucket, 'min', event_id, us, value FROM r WHERE rmn = 1
    UNION ALL
    SELECT bucket, 'max', event_id, us, value FROM r WHERE rmx = 1
    """,
)
def m4_downsample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling (Jugel et al., VLDB '14): per time bucket the
    first/last/min/max points — the lossless-for-rendering reduction
    every monitoring UI runs before plotting (a line through these 4
    points per pixel column draws the SAME pixels as the full series),
    and the standard first pass before eyeballing 100 TB of telemetry.

    One groupBy(bucket) with four struct-extremum aggregates — the
    map-side-combining argmin/argmax device (ordering fields first,
    payload riding behind a UNIQUE tiebreak so struct comparison never
    reaches it) — then a 4-role stack of the one-row-per-bucket result.
    ONE shuffle of (bucket, 4 structs) partials; contrast the naive
    4-window formulation, which sorts the full series 4 times (the
    oracle does exactly that — correct and slow is fine THERE). NULL
    values are excluded (they have no y-coordinate)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    us = F.expr("unix_micros(ts)")
    d = e.select(
        "event_id",
        us.alias("us"),
        "value",
        F.expr(f"unix_micros(ts) div {M4_BUCKET_US}").alias("bucket"),
    )
    t_struct = F.struct("us", "event_id", "value")
    v_struct = F.struct("value", "event_id", "us")
    agg = d.groupBy("bucket").agg(
        F.min(t_struct).alias("f"),
        F.max(t_struct).alias("l"),
        F.min(v_struct).alias("mn"),
        F.max(v_struct).alias("mx"),
    )
    return agg.select(
        "bucket",
        F.expr(
            "stack(4,"
            " 'first', f.event_id, f.us, f.value,"
            " 'last',  l.event_id, l.us, l.value,"
            " 'min',   mn.event_id, mn.us, mn.value,"
            " 'max',   mx.event_id, mx.us, mx.value"
            ") AS (role, event_id, us, value)"
        ),
    ).select("bucket", "role", "event_id", "us", "value")


# ---------------------------------------------------------------------------
# Peak concurrency (sweep line over session intervals)
# ---------------------------------------------------------------------------

CONC_GAP_US = 30 * 60 * 1_000_000  #: session gap (30 min, as L15)
DAY_US = 86_400_000_000


@query(
    "peak_concurrency_daily",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS us,
               CASE WHEN CAST(epoch_us(ts) AS BIGINT)
                         - lag(CAST(epoch_us(ts) AS BIGINT)) OVER (
                               PARTITION BY user_id ORDER BY ts, event_id)
                         >= {CONC_GAP_US}
                    THEN 1 ELSE 0 END AS brk
        FROM events
    ),
    islands AS (
        SELECT user_id, us,
               SUM(brk) OVER (PARTITION BY user_id
                              ORDER BY us, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS island
        FROM marked
    ),
    sessions AS (
        SELECT user_id, island, MIN(us) AS s_us, MAX(us) AS e_us
        FROM islands GROUP BY user_id, island
    ),
    sweep AS (
        SELECT s_us AS us, 1 AS delta FROM sessions
        UNION ALL
        SELECT e_us + 1 AS us, -1 AS delta FROM sessions
    ),
    daily AS (
        SELECT us // {DAY_US} AS day, us, delta FROM sweep
    ),
    day_tot AS (
        SELECT day, SUM(delta) AS tot FROM daily GROUP BY day
    ),
    day_pref AS (
        SELECT day,
               COALESCE(SUM(tot) OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS pref
        FROM day_tot
    ),
    active AS (
        SELECT d.day,
               p.pref + SUM(d.delta) OVER (
                   PARTITION BY d.day ORDER BY d.us
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS n_active
        FROM daily d JOIN day_pref p ON p.day = d.day
    )
    SELECT CAST(day AS BIGINT) AS day,
           CAST(MAX(n_active) AS BIGINT) AS peak_concurrency
    FROM active GROUP BY day
    """,
)
def peak_concurrency_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent user sessions per day — the capacity-planning
    statistic — via the classic sweep line: sessions (30-min-gap
    islands) emit +1 at start and -1 just after their inclusive end,
    and the running sum of deltas in time order IS the number of
    active sessions at each instant; max per day is the peak.

    The running sum is the global-cumsum trap (order spans the whole
    timeline), handled exactly like sequence_packing's two-phase
    prefix sum: per-DAY cumulative sums (hash-partitioned by day, the
    RANGE frame folds all deltas at one instant together so equal-
    timestamp start/end pairs resolve order-independently) plus an
    exclusive day-prefix offset from the per-day delta totals — the
    only ordered window over the full range runs on ONE ROW PER DAY
    (30 rows here; bounded by calendar days at any corpus size, the
    same deliberately-tiny tail as key_skew_profile)."""
    e = load_table(spark, sf_dir, "events")
    us = F.expr("unix_micros(ts)")
    marked = e.select(
        "user_id",
        "event_id",
        us.alias("us"),
        F.when(
            us
            - F.lag(us).over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
            )
            >= CONC_GAP_US,
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    # island cumsum ordered by ('us', 'event_id') — the SAME total
    # order the brk lag used. Ordering by 'us' alone would assign the
    # session-boundary row nondeterministically among duplicate
    # (user_id, ts) events (advisor finding, round 4).
    islands = marked.withColumn(
        "island",
        F.sum("brk").over(
            Window.partitionBy("user_id")
            .orderBy("us", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sessions = islands.groupBy("user_id", "island").agg(
        F.min("us").alias("s_us"), F.max("us").alias("e_us")
    )
    sweep = sessions.select(
        F.col("s_us").alias("us"), F.lit(1).alias("delta")
    ).unionByName(
        sessions.select(
            (F.col("e_us") + 1).alias("us"), F.lit(-1).alias("delta")
        )
    )
    daily = sweep.select(
        F.expr(f"us div {DAY_US}").alias("day"), "us", "delta"
    )
    day_tot = daily.groupBy("day").agg(F.sum("delta").alias("tot"))
    day_pref = day_tot.select(
        "day",
        F.coalesce(
            F.sum("tot").over(
                Window.orderBy("day").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("pref"),
    )
    active = daily.join(F.broadcast(day_pref), "day").select(
        "day",
        (
            F.col("pref")
            + F.sum("delta").over(
                Window.partitionBy("day")
                .orderBy("us")
                .rangeBetween(Window.unboundedPreceding, Window.currentRow)
            )
        ).alias("n_active"),
    )
    return active.groupBy(F.col("day").cast("long").alias("day")).agg(
        F.max("n_active").cast("long").alias("peak_concurrency")
    )


def m4_downsample_stream(
    events: DataFrame, bucket: str = "1 hour", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming twin of :func:`m4_downsample_events`: the downsample
    maintained CONTINUOUSLY — struct-extremum aggregates inside a
    watermarked tumbling window, append mode emitting each pixel
    bucket's 4 points once the watermark closes it. The monitoring
    pipeline shape: the chart's reduction computed as data arrives,
    never a re-scan. State per window = 4 structs, bounded by the
    watermark horizon."""
    us = F.expr("unix_micros(ts)")
    t_struct = F.struct(F.col("us"), F.col("event_id"), F.col("value"))
    v_struct = F.struct(F.col("value"), F.col("event_id"), F.col("us"))
    agg = (
        events.withWatermark("ts", watermark)
        .filter(F.col("value").isNotNull())
        .withColumn("us", us)
        .groupBy(F.window("ts", bucket))
        .agg(
            F.min(t_struct).alias("f"),
            F.max(t_struct).alias("l"),
            F.min(v_struct).alias("mn"),
            F.max(v_struct).alias("mx"),
        )
    )
    return agg.select(
        F.col("window.start").alias("bucket_start"),
        F.expr(
            "stack(4,"
            " 'first', f.event_id, f.us, f.value,"
            " 'last',  l.event_id, l.us, l.value,"
            " 'min',   mn.event_id, mn.us, mn.value,"
            " 'max',   mx.event_id, mx.us, mx.value"
            ") AS (role, event_id, us, value)"
        ),
    )
