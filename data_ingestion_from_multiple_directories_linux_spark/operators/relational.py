"""Relational operator layer — SURVEY.md §2.3–§2.10 parity.

Every operator the reference executes (pandas in-process or SQL shipped to
PostgreSQL) re-expressed as a declarative Spark DataFrame plan over the
driver test tables, each with a DuckDB oracle. Docstrings cite the reference
behavior being re-expressed (file:line into ``/root/reference``).

All queries are pure DataFrame/SQL — no Python UDFs — so Catalyst applies
predicate pushdown, column pruning, join selection (broadcast for dims) and
whole-stage codegen. At 100 TB the same plans hold: filters reach the
parquet scan, small dimension joins broadcast, aggregations are partial
(map-side) before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.cleansing import SQL_IN_QUANT_DOMAIN
from .registry import dsum, dsum_sql, query

#: quantization-domain gate over the events value column, interpolated
#: from the canonical template so the oracle bound cannot desynchronize
#: from fn/cleansing.QUANT_DOMAIN (ADVICE r06 #2; pinned by
#: tests/test_functions.py::test_quant_domain_oracle_literals).
_VALUE_IN_QUANT = SQL_IN_QUANT_DOMAIN.format(c="value")

# ---------------------------------------------------------------------------
# Flagship aggregation (A3/A4/C13 composite — TPC-H-Q1-shaped)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
           {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
           {dsum_sql('l_quantity')} / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: grouped multi-aggregate with filter + derived measures.

    The reference's richest aggregates are the state-machine summary
    (pcs_summary_report.py:25-34) and per-group counts
    (stg_monitoring_summary.sql:1-10); this is the same shape over lineitem
    with arithmetic measures. Scale: filter pushed to parquet scan,
    partial aggregation map-side, 2-key groupBy shuffles only the
    pre-aggregated state.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc, 4).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            (dsum("l_quantity") / F.count("*")).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Work-queue dequeue (S7: F1 + F2 + O1 + O2)
# ---------------------------------------------------------------------------


@query(
    "work_queue_dequeue",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate, o_orderpriority
    FROM orders
    WHERE o_orderstatus = 'O'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND NOT (o_orderpriority ILIKE '1-%' OR o_orderpriority ILIKE '2-%')
    ORDER BY o_orderdate, o_orderkey
    LIMIT 500
    """,
)
def work_queue_dequeue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pending-work dequeue: equality + watermark + NOT-ILIKE-ANY + ORDER BY + LIMIT.

    Mirrors the sync_file dequeue (reference file_loader.py:247-255:
    ``processed=1 AND modified_date >= ... AND NOT decrypted_file_name
    ILIKE ANY(...) ORDER BY modified_date, file_name LIMIT 50000``).
    Deterministic: (o_orderdate, o_orderkey) is a total order.
    Scale: Catalyst plans TakeOrderedAndProject — no full sort.
    """
    o = load_table(spark, sf_dir, "orders")
    pri = F.lower(F.col("o_orderpriority"))
    not_like_any = ~(pri.like("1-%") | pri.like("2-%"))
    return (
        o.filter(
            (F.col("o_orderstatus") == "O")
            & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & not_like_any
        )
        .orderBy("o_orderdate", "o_orderkey")
        .limit(500)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# State-machine summary (A3 conditional aggregation)
# ---------------------------------------------------------------------------


@query(
    "state_machine_summary",
    oracle="""
    SELECT COUNT(*) AS total_events,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS views,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
           COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signups,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS errors,
           COUNT(CASE WHEN value > 50 THEN 1 END) AS high_value
    FROM events
    """,
)
def state_machine_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row state-bucket summary (SUM(CASE WHEN state=k THEN 1 …) × buckets).

    Re-expresses the processed-state report (reference
    pcs_summary_report.py:25-34, summary_report/
    file_ingestion_summary_report.sql:2-5) over events.event_type.
    Scale: single partial-agg pass, one row out — no data shuffle beyond
    32 partial states.
    """
    ev = load_table(spark, sf_dir, "events")

    def bucket(val: str) -> F.Column:
        return F.count(F.when(F.col("event_type") == val, 1))

    return ev.agg(
        F.count("*").alias("total_events"),
        bucket("click").alias("clicks"),
        bucket("view").alias("views"),
        bucket("purchase").alias("purchases"),
        bucket("signup").alias("signups"),
        bucket("error").alias("errors"),
        F.count(F.when(F.col("value") > 50, 1)).alias("high_value"),
    )


# ---------------------------------------------------------------------------
# Window dedup (W1 / M4)
# ---------------------------------------------------------------------------

_DEDUP_WINDOW_SQL = """
    SELECT o_orderkey, o_custkey, o_orderdate,
           ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC
           ) AS row_num
    FROM orders
"""


def _dedup_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return o.select(
        "o_orderkey", "o_custkey", "o_orderdate", F.row_number().over(w).alias("row_num")
    )


@query(
    "dedup_keep_newest",
    oracle=f"SELECT o_orderkey, o_custkey, o_orderdate FROM ({_DEDUP_WINDOW_SQL}) WHERE row_num = 1",
)
def dedup_keep_newest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-newest-per-key dedup via ROW_NUMBER window.

    The reference's only window function: duplicate repair on sync_file
    (quality_assessments/duplicates_check.sql:26-54 —
    ``ROW_NUMBER() OVER (PARTITION BY file_name, facility_id ORDER BY
    modified_date DESC)`` then delete row_num > 1). Scale: single hash
    shuffle on the partition key; skewed keys handled by AQE.
    """
    return (
        _dedup_ranked(spark, sf_dir)
        .filter(F.col("row_num") == 1)
        .drop("row_num")
    )


@query(
    "duplicate_extra_rows",
    oracle=f"SELECT o_orderkey, o_custkey, row_num FROM ({_DEDUP_WINDOW_SQL}) WHERE row_num > 1",
)
def duplicate_extra_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The delete-set of the dedup: every row ranked after the newest
    (duplicates_check.sql:26-48 inner SELECT; the DELETE consumes it)."""
    return (
        _dedup_ranked(spark, sf_dir)
        .filter(F.col("row_num") > 1)
        .select("o_orderkey", "o_custkey", "row_num")
    )


# ---------------------------------------------------------------------------
# Joins (J1 anti, J2 semi, J3 self, J5 broadcast lookup)
# ---------------------------------------------------------------------------


@query(
    "anti_join_no_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
    )
    """,
)
def anti_join_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS): entities with no matching log row.

    Mirrors the not-yet-deleted file scan (reference
    automate_file_delete.py:97-102: sync_file rows with no success/failed
    row in file_deletion_log, which filters the log side on status).
    Scale: Catalyst decorrelates NOT EXISTS to a left-anti hash join; the
    smaller side broadcasts under AQE.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(
        o, c["c_custkey"] == o["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "semi_join_failed_retry",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    )
    """,
)
def semi_join_failed_retry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (IN/EXISTS subquery): retry-set selection.

    Mirrors the failed-previously retry check (reference
    file_loader.py:343-369 ``_check_if_faillogged``) and the IN-subquery
    delete set (duplicates_check.sql:49-54).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(
        o, c["c_custkey"] == o["o_custkey"], "left_semi"
    ).select("c_custkey", "c_mktsegment")


@query(
    "self_join_sibling_success",
    oracle="""
    SELECT DISTINCT a.o_orderkey FROM orders a
    JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey <> b.o_orderkey
     AND b.o_orderstatus = 'F'
    """,
)
def self_join_sibling_success(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows having a sibling (same key, different row) in a given state.

    Mirrors UPDATE…FROM duplicate repair (duplicates_check.sql:20-23:
    ``a.file_name = b.file_name AND a.id != b.id AND b.processed = 2``).
    The oracle states it as the literal self equi-join; the Spark plan is
    the scale-safe aggregate form — a windowed per-key count of
    qualifying rows, keep rows where a *sibling* qualifies
    (``n_F - (own is F) > 0``). One hash shuffle on the key, no
    orders×orders pair explosion on skewed keys (per-key quadratic in
    the join form; the reference's Postgres leaned on an index instead).
    NULL keys are dropped first: the oracle's equi-join never matches
    NULL = NULL, while Window.partitionBy would group all NULL keys
    into one sibling set (review finding).
    """
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull()
    )
    w = W.partitionBy("o_custkey")
    is_f = F.when(F.col("o_orderstatus") == "F", 1)
    n_f = F.count(is_f).over(w)
    own = F.coalesce(is_f, F.lit(0))
    return (
        o.select("o_orderkey", (n_f - own).alias("_n_sib_f"))
        .filter(F.col("_n_sib_f") > 0)
        .select("o_orderkey")
    )


@query(
    "broadcast_brand_revenue",
    oracle=f"""
    SELECT p.p_brand,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def broadcast_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast (map-side) dimension lookup join + aggregate.

    Mirrors the per-facility scalar lookups against small mapping tables
    (reference file_loader.py:211-216, :221-231 central_partner_mapping).
    Scale: part is a dimension — broadcast it explicitly so the 100 TB
    fact side never shuffles for the join; aggregation is partial.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(dsum(rev, 4).alias("revenue"), F.count("*").alias("n_items"))
    )


@query(
    "update_join_propagate",
    oracle="""
    SELECT c.c_custkey,
           CASE WHEN o.o_custkey IS NOT NULL THEN 'active' ELSE 'inactive' END AS status_flag
    FROM customer c
    LEFT JOIN (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O') o
      ON c.c_custkey = o.o_custkey
    """,
)
def update_join_propagate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE…FROM as read-modify-write: propagate a status across rows that
    join to a qualifying sibling (duplicates_check.sql:20-23 semantics:
    column rewrite driven by a join, expressed as a projection)."""
    c = load_table(spark, sf_dir, "customer")
    open_cust = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_custkey")
        .distinct()
    )
    joined = c.join(open_cust, c["c_custkey"] == open_cust["o_custkey"], "left")
    return joined.select(
        "c_custkey",
        F.when(F.col("o_custkey").isNotNull(), "active")
        .otherwise("inactive")
        .alias("status_flag"),
    )


# ---------------------------------------------------------------------------
# Aggregations (A2 count distinct, A5 min/max, A7 agg over limited subquery)
# ---------------------------------------------------------------------------


@query(
    "count_distinct_users",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def count_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT key) per group.

    Mirrors the facility patient count (reference file_loader.py:211-216:
    ``COUNT(DISTINCT uuid) WHERE stg_datim_id=… AND archived=0``).
    Scale: Spark expands distinct-agg into a two-stage partial/merge; for
    100 TB interactive use the engine also exposes approx_count_distinct
    (HLL) — not oracle-checked because it is approximate by design.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


@query(
    "minmax_priority_window",
    oracle="""
    SELECT o_orderpriority,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order,
           COUNT(*) AS n
    FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1999-12-31'
    GROUP BY o_orderpriority
    """,
)
def minmax_priority_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX over a BETWEEN time window (reference
    file_ingestion_summary_report.sql:48-55: ``MIN(start_time),
    MAX(end_time) … WHERE ingest_end_time BETWEEN t1 AND t2``)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_orderdate").between(
                F.lit("1996-01-01").cast("timestamp"),
                F.lit("1999-12-31").cast("timestamp"),
            )
        )
        .groupBy("o_orderpriority")
        .agg(
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("n"),
        )
    )


@query(
    "top_spender_subquery_agg",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS n_top
    FROM (
        SELECT c_custkey, c_nationkey FROM customer
        ORDER BY c_acctbal DESC, c_custkey LIMIT 200
    ) z
    GROUP BY c_nationkey
    """,
)
def top_spender_subquery_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over a LIMIT'd derived table (reference
    multi_file_ingestion_process.py:40-56: derived table with LIMIT 50
    then GROUP BY facility_id COUNT)."""
    c = load_table(spark, sf_dir, "customer")
    top = c.orderBy(F.desc("c_acctbal"), F.asc("c_custkey")).limit(200)
    return top.groupBy("c_nationkey").agg(F.count("*").alias("n_top"))


# ---------------------------------------------------------------------------
# Sorts / limits / top-k (O1–O3)
# ---------------------------------------------------------------------------


@query(
    "top_k_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by measure (reference table_sizes.sql:10-11: ``ORDER BY
    size_bytes DESC LIMIT 100``). Scale: plans as TakeOrderedAndProject —
    per-partition heap + driver merge, no global sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Set ops (U1 union all, U2 distinct)
# ---------------------------------------------------------------------------


@query(
    "union_pipeline_summary",
    oracle="""
    SELECT 'orders' AS pipeline, o_orderstatus AS status, COUNT(*) AS n
    FROM orders GROUP BY o_orderstatus
    UNION ALL
    SELECT 'lineitem' AS pipeline, l_returnflag AS status, COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def union_pipeline_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two per-pipeline summaries (reference
    file_ingestion_summary_report.sql:1-26 stacks the file-pipeline and
    dsd-pipeline rows)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    left = o.groupBy("o_orderstatus").agg(F.count("*").alias("n")).select(
        F.lit("orders").alias("pipeline"), F.col("o_orderstatus").alias("status"), "n"
    )
    right = li.groupBy("l_returnflag").agg(F.count("*").alias("n")).select(
        F.lit("lineitem").alias("pipeline"), F.col("l_returnflag").alias("status"), "n"
    )
    return left.unionByName(right)


@query(
    "distinct_status_priority",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def distinct_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT (reference automate_table_extraction.py:53,
    stg_monitoring_summary.sql:14)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()


@query(
    "salted_skew_counts",
    oracle=f"""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {dsum_sql('value')} AS total_value
    FROM events
    WHERE {_VALUE_IN_QUANT}
    GROUP BY user_id
    """,
)
def salted_skew_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-stage (salted) aggregation.

    A hot grouping key overwhelms its reducer in a plain groupBy; the
    standard fix is salting: stage 1 aggregates on (key, salt) — spreading
    each hot key over N reducers — stage 2 merges the N partials per key.
    Results are identical to the plain groupBy (the oracle) because both
    measures are associative: counts are integers and the value sum is
    decimal-quantized (order-independent). Spark's map-side partial
    aggregation makes this redundant for plain counts, but the pattern is
    the building block for skewed high-cardinality aggregates (e.g.
    collect-heavy or distinct-heavy measures) at 100 TB; AQE skew-join
    handles the join-side equivalent. Values ride the shared
    quantization-domain guard (fn/cleansing.in_quant_domain — NULL
    rows kept, NaN/±Inf/huge excluded; nonfinite-float-sweep finding).
    """
    from ..functions.cleansing import in_quant_domain

    ev = load_table(spark, sf_dir, "events").filter(
        in_quant_domain("value")
    )
    n_salt = 16
    stage1 = (
        ev.withColumn("_salt", F.col("event_id") % n_salt)
        .groupBy("user_id", "_salt")
        .agg(
            F.count("*").alias("pc"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("pv"),
        )
    )
    return stage1.groupBy("user_id").agg(
        F.sum("pc").alias("n_events"),
        F.sum("pv").cast("double").alias("total_value"),
    )


@query(
    "except_open_not_failed",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def except_open_not_failed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference): customers with open orders and no failed
    ones. Beyond the reference's UNION/DISTINCT surface (§2.8 notes
    Spark provides these anyway); plans as a left-anti join after
    distinct — no sort, hash-partitioned."""
    o = load_table(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    failed = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    # subtract == SQL EXCEPT (distinct); exceptAll would keep leftover
    # multiplicities of custkeys present on both sides
    return open_.subtract(failed)


@query(
    "intersect_repeat_customers",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def intersect_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers appearing in both states (plans as a
    left-semi join after distinct)."""
    o = load_table(spark, sf_dir, "orders")
    open_ = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    failed = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_.intersect(failed)


@query(
    "rollup_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status → status×priority → grand total)
    in one pass — free capability beyond the reference's flat GROUP BYs
    (§2.5 note); partial aggregation applies per grouping set.

    The grand-total (``()``) set is a SEPARATE always-one-row aggregate
    union'd in, not part of the grouping-sets expand: ANSI (and the
    reference's PostgreSQL, and DuckDB) emit the () row even over EMPTY
    input, while Spark's ``rollup`` — a groupBy over the expanded
    grouping id — emits zero rows there (empty-corpus sweep finding).
    The extra branch is a COUNT(*)-only scan (column-pruned to parquet
    footer counts); on non-empty input the result is byte-identical to
    the plain rollup."""
    o = load_table(spark, sf_dir, "orders")
    return _grouping_sets_with_grand_total(
        o, [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"]]
    )


@query(
    "cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations in one pass. Grand-total row
    union'd separately for ANSI empty-input semantics — see
    :func:`rollup_status_priority`."""
    o = load_table(spark, sf_dir, "orders")
    return _grouping_sets_with_grand_total(
        o,
        [
            ["o_orderstatus", "o_orderpriority"],
            ["o_orderstatus"],
            ["o_orderpriority"],
        ],
    )


def _grouping_sets_with_grand_total(
    o: DataFrame, sets: list[list[str]]
) -> DataFrame:
    """The non-empty grouping sets via one expand+groupBy pass, plus the
    () set as an explicit single-row aggregate (present even over empty
    input, per ANSI — Spark's cube/rollup drop it there)."""
    keyed = o.groupingSets(
        sets, "o_orderstatus", "o_orderpriority"
    ).agg(F.count("*").alias("n"))
    grand = o.agg(F.count("*").alias("n")).select(
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("string").alias("o_orderpriority"),
        "n",
    )
    return keyed.unionByName(grand)


# ---------------------------------------------------------------------------
# Filters (F3 not-in, F4 regex, F9 between) + grouped counts (A4)
# ---------------------------------------------------------------------------


@query(
    "notin_priority_counts",
    oracle="""
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
    FROM orders
    WHERE o_orderpriority NOT IN ('5-LOW', '4-NOT SPECIFIED')
    GROUP BY o_orderpriority, o_orderstatus
    """,
)
def notin_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN filter + grouped counts ordered by count (reference
    stg_monitoring_summary.sql:1-10, stg_records_deletion_process.py:35)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(~F.col("o_orderpriority").isin("5-LOW", "4-NOT SPECIFIED"))
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


@query(
    "regex_part_filter",
    oracle="""
    SELECT p_partkey, p_name, p_type FROM part
    WHERE regexp_matches(p_name, '^(red|blue)')
      AND NOT regexp_matches(p_type, '^ECO')
    """,
)
def regex_part_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex predicate + negated regex (reference table_sizes.sql:8:
    ``table_name !~ '_[0-9]+$'``)."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").rlike("^(red|blue)") & ~F.col("p_type").rlike("^ECO")
    ).select("p_partkey", "p_name", "p_type")


# ---------------------------------------------------------------------------
# Scalar functions (C1–C14)
# ---------------------------------------------------------------------------


@query(
    "filename_parse_lineage",
    oracle="""
    SELECT doc_id,
           source || '_' || CAST(doc_id AS VARCHAR) || '_20250103141949_decrypted.json'
               AS file_name,
           regexp_replace(
               source || '_' || CAST(doc_id AS VARCHAR) || '_20250103141949_decrypted.json',
               '(_[0-9]+)+(_decrypted)?\\.json$', '') AS table_name,
           regexp_extract(
               source || '_' || CAST(doc_id AS VARCHAR) || '_20250103141949_decrypted.json',
               '_([0-9]+)_[0-9]{14}_decrypted\\.json$', 1) AS batch_id
    FROM documents
    """,
)
def filename_parse_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filename → (table, batch) derivation.

    The reference derives the staging table by stripping numeric filename
    parts (file_loader.py:288-309; SQL analogue
    file_ingestion_summary_report.sql:29 ``REGEXP_REPLACE(file_name,
    '_[0-9]+.*|\\.json','')``) and the batch id as the second-to-last
    ``_`` token (file_loader.py:556). Here the filename is synthesized
    deterministically from documents so the oracle can recompute it.
    """
    d = load_table(spark, sf_dir, "documents")
    fname = F.concat(
        F.col("source"),
        F.lit("_"),
        F.col("doc_id").cast("string"),
        F.lit("_20250103141949_decrypted.json"),
    )
    return d.select(
        "doc_id",
        fname.alias("file_name"),
        F.regexp_replace(fname, r"(_[0-9]+)+(_decrypted)?\.json$", "").alias(
            "table_name"
        ),
        F.regexp_extract(fname, r"_([0-9]+)_[0-9]{14}_decrypted\.json$", 1).alias(
            "batch_id"
        ),
    )


@query(
    "null_normalization",
    oracle="""
    SELECT doc_id, raw_value,
           CASE WHEN raw_value IN ('', ' ', 'null') THEN NULL ELSE raw_value END
               AS clean_value
    FROM (
        SELECT doc_id,
               CASE CAST(doc_id % 5 AS INTEGER)
                    WHEN 0 THEN '' WHEN 1 THEN ' ' WHEN 2 THEN 'null'
                    ELSE lang END AS raw_value
        FROM documents
    )
    """,
)
def null_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empty/'null' string → NULL normalization applied to every column
    before load (reference file_loader.py:477-496
    ``_replace_empty_strings_with_null``; dsd per-value variant
    dsd_loader.py:572-583). Raw values synthesized so all three sentinel
    shapes occur."""
    d = load_table(spark, sf_dir, "documents")
    raw = (
        F.when(F.col("doc_id") % 5 == 0, "")
        .when(F.col("doc_id") % 5 == 1, " ")
        .when(F.col("doc_id") % 5 == 2, "null")
        .otherwise(F.col("lang"))
    )
    from ..functions.cleansing import normalize_null_sentinels

    return d.select(
        "doc_id",
        raw.alias("raw_value"),
        normalize_null_sentinels(raw).alias("clean_value"),
    )


@query(
    "date_validation_split",
    oracle="""
    SELECT event_id, raw_date,
           TRY_CAST(raw_date AS TIMESTAMP) AS parsed_ts,
           (raw_date IS NOT NULL AND TRY_CAST(raw_date AS TIMESTAMP) IS NULL)
               AS is_bad
    FROM (
        SELECT event_id,
               CASE CAST(event_id % 4 AS INTEGER)
                    WHEN 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
                    WHEN 1 THEN 'not-a-date'
                    WHEN 2 THEN '2024-02-31 00:00:00'
                    ELSE strftime(ts, '%Y-%m-%d') END AS raw_date
        FROM events
    )
    """,
)
def date_validation_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date validation with NULL-on-bad-parse and quarantine verdict.

    The reference runs pandas ``to_datetime(errors='raise')`` per value and
    collects failing record ids (file_loader.py:498-521
    ``_date_validation``; dsd per-value variant dsd_loader.py:625-633).
    Spark-first: ``try_cast(ts)`` returns NULL on a bad parse, so
    bad := raw IS NOT NULL AND parsed IS NULL — one vectorized pass, no
    row loop; the quarantine split (G3) is two filters over this flag.
    """
    ev = load_table(spark, sf_dir, "events")
    raw = (
        F.when(F.col("event_id") % 4 == 0, F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
        .when(F.col("event_id") % 4 == 1, "not-a-date")
        .when(F.col("event_id") % 4 == 2, "2024-02-31 00:00:00")
        .otherwise(F.date_format("ts", "yyyy-MM-dd"))
    )
    from ..functions.cleansing import try_parse_timestamp

    out = ev.select("event_id", raw.alias("raw_date"))
    parsed = try_parse_timestamp(F.col("raw_date"))
    return out.select(
        "event_id",
        "raw_date",
        parsed.alias("parsed_ts"),
        (F.col("raw_date").isNotNull() & parsed.isNull()).alias("is_bad"),
    )


@query(
    "pii_mask_constant",
    oracle="""
    SELECT c_custkey, '******' AS c_name_masked, c_mktsegment FROM customer
    """,
)
def pii_mask_constant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constant-overwrite PII redaction + column exclusion.

    Reference masks name/phone columns with '******'
    (file_loader.py:608-621) and drops biometric match columns
    (file_loader.py:600-603). Projection-only — zero shuffle.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey", F.lit("******").alias("c_name_masked"), "c_mktsegment"
    )


_RAW_PROPS_SQL = (
    """'{"surname":"user' || COALESCE(CAST(user_id AS VARCHAR), '')"""
    """ || '","note":"' || COALESCE(event_type, '')"""
    """ || '","phone_number":"' || CAST(event_id AS VARCHAR) || '"}'"""
)
_MASKED_PROPS_SQL = (
    """'{"surname":"******","note":"' || COALESCE(event_type, '')"""
    """ || '","phone_number":"******"}'"""
)


def _pii_json(ev: DataFrame) -> Column:
    """A synthesized JSON-object string with PII keys (surname,
    phone_number) and a non-PII key (note) — input for the mask_pii
    parity queries. The oracle rebuilds the identical string by concat.
    NULL inputs coalesce to '' on BOTH sides: Spark's map-to_json
    renders a NULL value as JSON null while the oracle's || chain
    would null the whole string — the sentinel keeps the parity
    comparison about MASKING, not null rendering (adversarial-corpus
    finding)."""
    return F.to_json(
        F.create_map(
            F.lit("surname"),
            F.concat(
                F.lit("user"),
                F.coalesce(F.col("user_id").cast("string"), F.lit("")),
            ),
            F.lit("note"),
            F.coalesce(F.col("event_type"), F.lit("")),
            F.lit("phone_number"),
            F.col("event_id").cast("string"),
        )
    )


@query(
    "json_extract_props",
    oracle=f"""
    SELECT event_id,
           CASE WHEN json_valid(props)
                AND regexp_matches(
                    trim(json_extract_string(props, '$.k')),
                    '^[+-]?[0-9]+$')
                THEN TRY_CAST(trim(json_extract_string(props, '$.k'))
                              AS BIGINT) END AS k_value,
           {_RAW_PROPS_SQL} AS raw_props,
           {_MASKED_PROPS_SQL} AS masked_props
    FROM events
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON parse + key masking + re-serialize (reference mask_pii,
    file_loader.py:523-536: json.loads → overwrite 5 keys if present →
    json.dumps). Spark-first: the real ``mask_json_keys`` expression —
    one in-place regexp_replace over all PII keys (type-preserving;
    map-rewrite fallback only for >24-deep container values) — applied
    to a synthesized JSON column holding PII and non-PII keys; the oracle
    constructs the masked rewrite independently, so the entry fails if
    the masking expression breaks. get_json_object covers the extract
    side. All JVM expressions, no Python UDF. Two-stage masking
    (``mask_json_keys_staged``): the heavy stage-1 regexp materializes
    once behind a projection boundary instead of re-evaluating in each
    fallback-CASE branch (0.370 → 0.157 s at sf0.1). Still a pure
    projection — no shuffle: at scale the scan's own splits give the
    parallelism."""
    from ..functions.masking import mask_json_keys_staged

    ev = load_table(spark, sf_dir, "events")
    raw = _pii_json(ev)
    base = ev.select(
        "event_id",
        # try_cast: a fractional/boolean/malformed k yields NULL
        # instead of aborting the job under ANSI mode; the oracle's
        # integral-grammar regex reproduces exactly which strings
        # convert (adversarial-corpus finding)
        F.get_json_object("props", "$.k").try_cast("bigint").alias("k_value"),
        raw.alias("raw_props"),
    )
    return mask_json_keys_staged(base, "raw_props", "masked_props")


@query(
    "struct_field_mask",
    oracle=f"""
    SELECT event_id,
           event_type AS extra_type,
           {_MASKED_PROPS_SQL} AS extra_value_masked
    FROM events
    """,
)
def struct_field_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct field access + rebuild (C11, reference file_loader.py:606:
    ``{'type': x['type'], 'value': mask_pii(x['value'])}``): build a
    struct<type,value>, mask inside ``value`` via withField, read both
    fields back. Verifies the struct masking end-to-end against an
    independently-constructed oracle string, in the two-stage plan
    shape (``mask_struct_value_staged``): the heavy stage-1 regexp
    runs once per row behind a projection boundary instead of once per
    fallback branch — and instead of once per getField read-back,
    which re-inlined the whole masked-struct expression twice in the
    old one-expression form. Pure projection — no shuffle, like
    ``json_extract_props``."""
    from ..functions.masking import mask_struct_value_staged

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        F.struct(
            F.col("event_type").alias("type"), _pii_json(ev).alias("value")
        ).alias("extra"),
    )
    masked = mask_struct_value_staged(base, "extra")
    return masked.select(
        "event_id",
        F.col("extra").getField("type").alias("extra_type"),
        F.col("extra").getField("value").alias("extra_value_masked"),
    )


@query(
    "struct_to_json",
    oracle="""
    SELECT o_orderkey,
           CAST(to_json(struct_pack(
               key := o_orderkey,
               status := COALESCE(o_orderstatus, ''),
               priority := COALESCE(o_orderpriority, '')
           )) AS VARCHAR) AS order_json
    FROM orders
    """,
)
def struct_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dict → JSON string (C12, reference dsd_loader.py:584-585,
    :638-639: ``json.dumps(value)`` when a cell holds a dict): build a
    struct from row columns and serialize with ``to_json`` — the
    Spark-native form of the reference's per-cell ``json.dumps``. The
    oracle serializes the same struct in DuckDB, so field order, quoting
    and numeric formatting are all checked. Pure projection — no
    shuffle. Note Spark's ``to_json`` OMITS null struct fields while
    DuckDB emits ``"field": null`` — both sides coalesce the string
    fields to '' so a NULL priority serializes identically
    (adversarial-corpus finding; the key column is the table key,
    never NULL)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("key"),
                F.coalesce(F.col("o_orderstatus"), F.lit("")).alias("status"),
                F.coalesce(F.col("o_orderpriority"), F.lit("")).alias(
                    "priority"
                ),
            )
        ).alias("order_json"),
    )


@query(
    "substring_truncate",
    oracle="""
    SELECT doc_id,
           substr(text, 1, 40) AS preview,
           CAST(length(text) AS BIGINT) AS text_len
    FROM documents
    """,
)
def substring_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-message style truncation (reference file_loader.py:189
    ``[0:10000]``, :377-384 ``[:500] + truncated``)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.substring("text", 1, 40).alias("preview"),
        F.length("text").cast("long").alias("text_len"),
    )


@query(
    "concat_runid_format",
    oracle="""
    SELECT event_id, 'IPID_' || strftime(ts, '%Y%m%d_%H_%M') AS run_id FROM events
    """,
)
def concat_runid_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-id minting ``IPID_<ts:%Y%m%d_%H_%M>`` (reference
    file_ingestion_process.py:52)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.concat(F.lit("IPID_"), F.date_format("ts", "yyyyMMdd_HH_mm")).alias(
            "run_id"
        ),
    )


@query(
    "session_duration_secs",
    oracle="""
    SELECT user_id,
           date_diff('second', MIN(ts), MAX(ts)) AS duration_secs,
           COUNT(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def session_duration_secs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp arithmetic ``(end - start) AS time_taken`` (reference
    file_ingestion_summary_report.sql:38) as whole-second duration."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
            "duration_secs"
        ),
        F.count("*").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# DML as read-modify-write (M2 bulk update)
# ---------------------------------------------------------------------------


@query(
    "bulk_update_requeue",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'F' AND o_orderpriority LIKE '1-%'
                THEN 'R' ELSE o_orderstatus END AS new_status
    FROM orders
    """,
)
def bulk_update_requeue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk UPDATE with predicate as a conditional column rewrite
    (reference file_ingestion_summary_report.sql:63-67 requeue;
    stg_monitoring_summary.sql:21-23 ``SET processed='N' WHERE
    processed='F'``). The persistent form is write-temp-swap overwrite —
    see operators/maintenance.py."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(
            (F.col("o_orderstatus") == "F") & F.col("o_orderpriority").like("1-%"),
            "R",
        )
        .otherwise(F.col("o_orderstatus"))
        .alias("new_status"),
    )


# ---------------------------------------------------------------------------
# Multi-join analytic queries (TPC-H q3/q5/q10 shapes)
# ---------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-03-15'
      AND l_shipdate > TIMESTAMP '1997-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q3 shape: 3-way fact join, filtered on every table, grouped
    revenue, top-10. Scale plan: all three filters reach their parquet
    scans (segment, order date, ship date prune before any join), the
    joins shuffle on the natural keys with map-side partial aggregation
    on the grouped revenue, and the top-10 is TakeOrderedAndProject —
    never a global sort. Tiebreak (o_orderdate, l_orderkey) keeps the
    LIMIT deterministic across engines."""
    cutoff = F.lit("1997-03-15").cast("timestamp")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > cutoff
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(rev, 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q5 shape: 6-table join where customer and supplier must sit
    in the SAME nation, revenue per nation over one order year. Scale
    plan: nation⋈region prune to one region and BROADCAST into BOTH
    fact-dim sides BEFORE any fact shuffle — supplier joins the pruned
    nation dim (keeping n_name) and customer semi-joins the same key
    set, so the orderkey/suppkey shuffles only ever carry the region's
    rows (~1/5; Catalyst won't reorder the joins itself — review
    finding). The local-supplier predicate (c_nationkey = s_nationkey)
    rides the supplier join as an equi-key, not a post-filter. One
    partial-agg shuffle on n_name at the end."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nat = n.join(r, F.col("n_regionkey") == F.col("r_regionkey")).select(
        "n_nationkey", "n_name"
    )
    s2 = s.join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    c2 = c.join(
        F.broadcast(nat.select(F.col("n_nationkey").alias("cn_key"))),
        F.col("c_nationkey") == F.col("cn_key"),
        "left_semi",
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c2.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s2,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(dsum(rev, 4).alias("revenue"))
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-10-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q10 shape: top-20 customers by revenue lost to returns in
    one quarter. Scale plan: the quarter and returnflag filters prune at
    the scans, nation broadcasts, the fact joins shuffle on custkey /
    orderkey with partial aggregation, and the top-20 is
    TakeOrderedAndProject with a c_custkey tiebreak."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(rev, 4).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )
