"""SQL-surface batch: GROUPING SETS, dense ranks over ties, array
higher-order functions (SURVEY.md §2.12a).

ROLLUP and CUBE (operators/relational.py L16/L17) are the two canned
grouping-set hierarchies; arbitrary GROUPING SETS, DENSE_RANK's
tie-compressed numbering, and the collect/sort/transform array pipeline
complete the warehouse SQL surface a reference user would expect to
keep working after the switch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import dsum, dsum_sql, query

__all__ = [
    "grouping_sets_status_priority",
    "dense_rank_order_values",
    "user_event_type_arrays",
    "exact_moment_correlation",
]


@query(
    "grouping_sets_status_priority",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {dsum_sql('o_totalprice', 2)} AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def grouping_sets_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — the two one-dimension marginals
    WITHOUT the (status, priority) cross or the grand total (which is
    what distinguishes it from the canned ROLLUP/CUBE shapes).

    Scale plan: Spark expands grouping sets by replicating each input
    row once per set with the non-set columns nulled, then runs ONE
    partial-aggregated hash aggregate — cost is sets × input map-side,
    shuffle carries only the (few × groups) partials. Identical
    expansion semantics in DuckDB, so the NULL-marker rows line up."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            dsum("o_totalprice", 2).alias("total_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@query(
    "dense_rank_order_values",
    oracle="""
    WITH binned AS (
        SELECT o_orderpriority,
               CAST(FLOOR(o_totalprice / 10000) AS BIGINT) AS price_bin
        FROM orders
    )
    SELECT o_orderpriority, price_bin,
           CAST(DENSE_RANK() OVER (
               PARTITION BY o_orderpriority ORDER BY price_bin DESC
           ) AS BIGINT) AS bin_rank,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM binned
    GROUP BY o_orderpriority, price_bin
    ORDER BY o_orderpriority, price_bin DESC
    """,
)
def dense_rank_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DENSE_RANK over genuinely tied values: orders binned to 10k
    price bands, bands dense-ranked per priority — rank numbering has
    no gaps across ties, the property ROW_NUMBER (W1 dedup) and RANK
    don't give. Deterministic because the rank input is the DISTINCT
    band list (ties collapse BEFORE ranking — also the scale move: the
    window sorts |bands| rows per priority, never |orders|)."""
    o = load_table(spark, sf_dir, "orders")
    binned = o.groupBy(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") / 10000).cast("long").alias("price_bin"),
    ).agg(F.count("*").cast("long").alias("n_orders"))
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("price_bin"))
    return (
        binned.withColumn("bin_rank", F.dense_rank().over(w).cast("long"))
        .select("o_orderpriority", "price_bin", "bin_rank", "n_orders")
        .orderBy("o_orderpriority", F.desc("price_bin"))
    )


@query(
    "user_event_type_arrays",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               list_sort(COALESCE(
                   list(DISTINCT event_type)
                       FILTER (WHERE event_type IS NOT NULL),
                   [])) AS types
        FROM events
        GROUP BY user_id
    )
    SELECT user_id,
           COALESCE(array_to_string(types, ','), '') AS type_set,
           CAST(len(types) AS BIGINT) AS n_types,
           CAST(len(list_filter(types, t -> t IN ('click', 'purchase')))
                AS BIGINT) AS n_conversion_types
    FROM per_user
    ORDER BY user_id
    """,
)
def user_event_type_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array pipeline per user: distinct event types collected, sorted
    (collect_set order is partition-dependent — sort_array makes the
    value deterministic), then reduced with HIGHER-ORDER functions
    (filter over the array) without ever exploding back to rows.

    Scale plan: one user_id shuffle; the array ops run inside
    whole-stage codegen on the grouped result (bounded: ≤5 types per
    user), and the string join is only for the cross-engine hash — a
    real pipeline would keep the array column. The filter lambda is
    JVM-side (Catalyst HigherOrderFunction), NOT a Python UDF.

    NULL contract (two review findings): Spark's collect_set silently
    drops NULL elements while DuckDB's list(DISTINCT) keeps them — the
    oracle filters NULLs explicitly; and for a user whose EVERY event
    has NULL event_type the FILTERed aggregate returns NULL where
    collect_set returns [] — COALESCE(..., []) restores the empty
    array, and a second COALESCE absorbs DuckDB's array_to_string([])
    = NULL (Spark's join of [] is '') so both engines emit
    ('', 0, 0)."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_set("event_type")).alias("types")
    )
    is_conv = lambda t: t.isin("click", "purchase")  # noqa: E731
    return (
        per_user.select(
            "user_id",
            F.array_join("types", ",").alias("type_set"),
            F.size("types").cast("long").alias("n_types"),
            F.size(F.filter("types", is_conv)).cast("long").alias(
                "n_conversion_types"
            ),
        )
        .orderBy("user_id")
    )


@query(
    "exact_moment_correlation",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sy,
               CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,4)))
                    AS DOUBLE) AS sxy,
               CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4)))
                    AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_extendedprice * l_extendedprice
                             AS DECIMAL(28,4))) AS DOUBLE) AS syy
        FROM lineitem
        GROUP BY l_returnflag
    )
    , d AS (
        SELECT *,
               sqrt(GREATEST(n * sxx - sx * sx, 0.0)
                    * GREATEST(n * syy - sy * sy, 0.0)) AS den
        FROM m
    )
    SELECT l_returnflag,
           n,
           CASE WHEN den > 0 THEN
               floor((n * sxy - sx * sy) / den * 1e12 + 0.5) / 1e12
           END AS corr_qty_price,
           floor((n * sxy - sx * sy) / (CAST(n AS DOUBLE) * n)
             * 1e6 + 0.5) / 1e6
               AS covar_pop_scaled
    FROM d
    ORDER BY l_returnflag
    """,
)
def exact_moment_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + population covariance per return flag,
    computed from EXACT decimal moments (n, Σx, Σy, Σxy, Σx², Σy²)
    instead of the built-in ``corr``/``covar_pop`` — those accumulate
    in floating point, so their last bits depend on partition order and
    would never hash-match across engines. Moments quantized to DECIMAL
    are associative-exact; the final formula is a fixed IEEE expression
    over six exact inputs, quantized to 12 decimals because engines may
    fuse the multiply-subtract differently (FMA) and drift by one ULP.
    The quantization is ``floor(v*1e12 + 0.5)/1e12`` SPELLED OUT in
    both engines — each engine's native ROUND(double, n) is a
    different algorithm (Spark: BigDecimal of the shortest repr,
    HALF_UP; DuckDB: multiply-round-divide) and they can disagree by
    1e-12 near .5 boundaries (review finding); the explicit IEEE
    sequence is bit-identical by construction.

    Scale plan: one map-combined groupBy (six sums per group, partial
    aggregation), one shuffle of one row per (partition, flag); the
    correlation arithmetic is a projection over a 3-row frame. This is
    also the mergeable-statistics pattern: per-shard moment frames can
    be summed later (incremental_rollup_merge's algebra) and the
    correlation re-derived without touching raw data."""
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    x = F.col("l_quantity")
    y = F.col("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x.cast("decimal(18,2)")).cast("double").alias("sx"),
        F.sum(y.cast("decimal(18,2)")).cast("double").alias("sy"),
        F.sum((x * y).cast("decimal(28,4)")).cast("double").alias("sxy"),
        F.sum((x * x).cast("decimal(28,4)")).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(28,4)")).cast("double").alias("syy"),
    )
    n = F.col("n").cast("double")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")

    def quant(c, scale: float):
        # same IEEE op sequence as the oracle — see docstring
        return F.floor(c * F.lit(scale) + F.lit(0.5)) / F.lit(scale)

    # variance terms clamp at 0 (exact moments re-rounded to double can
    # land one ulp NEGATIVE for a zero-variance group — n=1, or a
    # constant column — and sqrt(-ulp) is NaN, which floor() then
    # aborts on under ANSI); a zero denominator yields NULL correlation
    # in BOTH engines (single-row-corpus sweep finding)
    vx = F.greatest(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)
    )
    vy = F.greatest(
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"), F.lit(0.0)
    )
    den = F.sqrt(vx * vy)
    return (
        m.select(
            "l_returnflag",
            "n",
            F.when(den > 0, quant(num / den, 1e12)).alias("corr_qty_price"),
            quant(num / (n * n), 1e6).alias("covar_pop_scaled"),
        )
        .orderBy("l_returnflag")
    )
