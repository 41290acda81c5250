"""TPC-H-shape analytic queries, final batch (SURVEY.md §2.12a L56).

Completes the 22-shape TPC-H spectrum. The driver testdata has no
``partsupp`` table and lineitem/orders carry a pared-down column set
(no ``l_commitdate``/``l_receiptdate``/``l_shipmode``, no
``o_comment``), so five of these shapes are *principled adaptations*:
the physical-plan shape each TPC-H query exists to exercise is kept
exactly, and the missing column is replaced by a same-typed stand-in:

* q2  — correlated-MAX-per-group over a many:many bridge; the
  part→supplier bridge is ``DISTINCT (l_partkey, l_suppkey)`` from
  lineitem (what partsupp would provide) and min-cost becomes
  max-acctbal.
* q9  — 5-table profit rollup by (nation, year); the supplycost term
  is absent so "profit" is discounted revenue.
* q11 — group-by HAVING against a global scalar subquery (value
  concentration); partsupp value becomes part revenue.
* q12 — conditional two-branch counts per category; the
  receipt-vs-commit lateness becomes ship-vs-order delay buckets.
* q13 — left-outer distribution histogram (o_comment filter →
  o_orderpriority filter).
* q15 — aggregate view → global MAX scalar → equality join back.
* q16 — DISTINCT bridge variety count with anti-joined exclusions.
* q20 — nested aggregate dominance (pair-share vs part total) feeding
  a semi join.
* q21 — the double-EXISTS "only supplier who was late on a
  multi-supplier order", decorrelated into one per-order conditional
  aggregate (no correlated re-scans).

The reference pipeline has no analytic tier (reference
file_loader.py stops at work-queue/audit shapes); this family is part
of the additive warehouse surface. All money sums are
DECIMAL-quantized (registry.dsum) so value hashes are byte-stable
between Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import dsum, dsum_sql, query

__all__ = [
    "q2_regional_best_supplier",
    "q9_nation_year_profit",
    "q11_part_value_concentration",
    "q12_delay_priority_classes",
    "q13_customer_order_distribution",
    "q15_top_revenue_supplier",
    "q16_supplier_part_variety",
    "q20_dominant_share_suppliers",
    "q21_sole_late_suppliers",
]

#: q2 filters: one size, one type, one region
Q2_SIZE = 15
Q2_TYPE = "SMALL"
Q2_REGION = "ASIA"


@query(
    "q2_regional_best_supplier",
    oracle=f"""
    WITH bridge AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ), cand AS (
        SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
               ROW_NUMBER() OVER (
                   PARTITION BY p_partkey
                   ORDER BY s_acctbal DESC, s_suppkey
               ) AS rnk
        FROM part
        JOIN bridge   ON l_partkey = p_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        JOIN region   ON r_regionkey = n_regionkey
        WHERE p_size = {Q2_SIZE} AND p_type = '{Q2_TYPE}'
          AND r_name = '{Q2_REGION}'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM cand WHERE rnk = 1
    ORDER BY s_acctbal DESC, p_partkey
    LIMIT 100
    """,
)
def q2_regional_best_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 shape: for each qualifying part, the single best
    supplier in one region — the correlated per-group extremum
    (``ps_supplycost = (SELECT min ...)``), decorrelated to a
    ROW_NUMBER window over the bridge join (adaptation: the partsupp
    bridge is the DISTINCT (partkey, suppkey) projection of lineitem;
    "min cost" becomes "max account balance", same extremum shape).

    Scale plan: the bridge dedup runs AFTER a broadcast semi join
    against the size+type-pruned part dim — only the surviving parts'
    (partkey, suppkey) pairs enter the dedup shuffle, shrinking the
    query's dominant exchange by the part-filter selectivity (dedup
    per pair is independent, so pre-restricting the part set changes
    nothing — review finding); the dedup itself is one map-combined
    groupBy of two int64 columns (never carries text).
    supplier⋈nation⋈region is a broadcast chain that prunes suppliers
    to one region BEFORE the bridge join. The window partitions by
    p_partkey — the same key the bridge join just shuffled on, so AQE
    reuses the partitioning; per-part candidate lists are
    bridge-bounded (suppliers-per-part), never the full table."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") == Q2_SIZE) & (F.col("p_type") == Q2_TYPE))
        .select("p_partkey", "p_name")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q2_REGION)
    regional_supp = (
        s.join(
            F.broadcast(
                n.join(
                    F.broadcast(r),
                    n["n_regionkey"] == r["r_regionkey"],
                ).select("n_nationkey", "n_name")
            ),
            s["s_nationkey"] == F.col("n_nationkey"),
        ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    bridge = (
        li.select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(p.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .distinct()
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.desc("s_acctbal"), F.col("s_suppkey")
    )
    return (
        bridge.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(regional_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.desc("s_acctbal"), "p_partkey")
        .limit(100)
    )


#: q9: the part-name token selecting the product line
Q9_NAME_TOKEN = "widget"


@query(
    "q9_nation_year_profit",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%{Q9_NAME_TOKEN}%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
)
def q9_nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9 shape: product-line profit by supplier nation and
    order year — the widest join tree in the suite (fact ⋈ part ⋈
    supplier ⋈ orders ⋈ nation). Adaptation: no partsupp in the
    testdata, so the ``ps_supplycost`` subtrahend is absent and
    profit is discounted revenue; every join edge of the original is
    kept.

    Scale plan: the p_name LIKE filter prunes part BEFORE the fact
    join (substring pushdown happens at the Spark filter; the pruned
    dim then broadcasts, so the biggest scan is joined by broadcast,
    not shuffle). supplier and nation broadcast too; the only
    fact-fact shuffle is lineitem⋈orders on orderkey. The rollup is
    (25 nations × years) rows — partial-agg combines map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like(f"%{Q9_NAME_TOKEN}%"))
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "profit"
            )
        )
        .orderBy("nation", F.desc("o_year"))
    )


#: q11: supplier nation under scrutiny + concentration fraction
Q11_NATION = "NATION_5"
#: like TPC-H's 0.0001/SF: a fixed fraction empties the result as the
#: part count grows; 0.0002 keeps the HAVING selective-but-nonempty at
#: both test scales (sf0.01: ~4800 parts trade for the nation, sf0.1:
#: ~20000)
Q11_FRACTION = 0.0002


@query(
    "q11_part_value_concentration",
    oracle=f"""
    WITH scoped AS (
        SELECT l_partkey,
               CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(18,4)) AS val
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE n_name = '{Q11_NATION}'
    ), totals AS (
        SELECT CAST(SUM(val) AS DOUBLE) * {Q11_FRACTION} AS threshold
        FROM scoped
    )
    SELECT l_partkey AS partkey,
           CAST(SUM(val) AS DOUBLE) AS part_value
    FROM scoped, totals
    GROUP BY l_partkey, threshold
    HAVING CAST(SUM(val) AS DOUBLE) > threshold
    ORDER BY part_value DESC, partkey
    """,
)
def q11_part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 shape: parts holding an outsized share of one
    nation's traded value — GROUP BY ... HAVING against a global
    scalar subquery over the SAME scoped input. Adaptation: partsupp
    (availqty×supplycost) becomes lineitem discounted revenue; the
    scoped-scan + scalar-threshold-HAVING plan is identical.

    Scale plan: the nation scoping happens through two broadcast dim
    joins BEFORE any aggregation, so both the per-part rollup and the
    global total read the same pruned projection (Spark computes it
    once per branch off a common scan; at 100 TB the scoped frame
    would be persisted). The global total is a 1-row broadcast onto
    the per-part aggregate — no second shuffle. Values quantize to
    DECIMAL(18,4) before summing so the HAVING comparison is exact
    cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name") == Q11_NATION)
        .select("n_nationkey")
    )
    scoped = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "l_partkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,4)")
            .alias("val"),
        )
    )
    totals = scoped.agg(
        (F.sum("val").cast("double") * F.lit(Q11_FRACTION)).alias("threshold")
    )
    return (
        scoped.groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum("val").cast("double").alias("part_value"))
        .crossJoin(F.broadcast(totals))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("partkey", "part_value")
        .orderBy(F.desc("part_value"), "partkey")
    )


#: q12: ship-delay boundary (days) splitting FAST from SLOW fulfilment
Q12_SLOW_DAYS = 60


@query(
    "q12_delay_priority_classes",
    oracle=f"""
    SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                               CAST(l_shipdate AS DATE)) > {Q12_SLOW_DAYS}
                THEN 'SLOW' ELSE 'FAST' END AS delay_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    ORDER BY 1
    """,
)
def q12_delay_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q12 shape: per shipping class, how many critical- vs
    normal-priority orders it carried — one fact-fact join feeding
    TWO conditional counts computed in a single pass (the CASE-WHEN
    inside SUM device; never two scans). Adaptation: no
    l_shipmode/l_commitdate/l_receiptdate in the testdata, so the
    class is derived from the ship-vs-order delay instead of the ship
    mode — same derived-category + dual-conditional-agg plan.

    Scale plan: the ship-date range prunes lineitem at the scan; the
    single shuffle is the orderkey join (both sides pre-projected to
    3 columns); the aggregate output is two rows, combined map-side.
    datediff runs on DATE-truncated values in both engines so the
    bucket boundary is identical."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_shipdate")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "delay_class",
            F.when(
                F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
                > Q12_SLOW_DAYS,
                F.lit("SLOW"),
            ).otherwise(F.lit("FAST")),
        )
        .groupBy("delay_class")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            # ~high, not otherwise(1): a NULL priority must count in
            # NEITHER bucket, matching the oracle's NOT IN three-valued
            # logic (when(high, 0).otherwise(1) would call NULL "low")
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias(
                "low_line_count"
            ),
        )
        .orderBy("delay_class")
    )


@query(
    "q13_customer_order_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c_custkey,
               CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer
        LEFT JOIN orders ON o_custkey = c_custkey
                        AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q13 shape: the customer-order-count histogram — a LEFT
    OUTER join (customers with zero orders MUST appear as c_count=0)
    feeding two stacked aggregations. Adaptation: the o_comment NOT
    LIKE exclusion becomes an o_orderpriority exclusion (same
    join-side filter placement: it must sit in the JOIN condition,
    not a WHERE, or zero-order customers vanish).

    Scale plan: the join shuffles both sides on custkey once; the
    first aggregate reuses that partitioning (groupBy on the join
    key — no second exchange under AQE); the second aggregate's input
    is one row per customer collapsed to ~tens of distinct counts,
    combined map-side. The filter rides the join condition scan-side."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "5-LOW")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").cast("long").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


#: q15: the revenue quarter under review
Q15_START = "1997-01-01"
Q15_END = "1997-04-01"


@query(
    "q15_top_revenue_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {dsum_sql('l_extendedprice * (1 - l_discount)', 4)}
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{Q15_START}'
          AND l_shipdate <  TIMESTAMP '{Q15_END}'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q15 shape: the quarter's top-revenue supplier(s) — an
    aggregate "view", a global MAX over it, and an equality join back
    (ties all surface, exactly as the spec requires; no LIMIT).

    Scale plan: the revenue view is one date-pruned scan + one
    map-combined groupBy (one row per supplier); the MAX is a 1-row
    broadcast onto that same frame (computed off the cached small
    aggregate, not a second fact scan); supplier joins by broadcast.
    The revenue equality is exact because both engines compare the
    identical DECIMAL-quantized sum."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q15_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_END).cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "total_revenue"
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


#: q16 exclusions: one brand, one type, the size shortlist
Q16_EXCL_BRAND = "Brand#5"
Q16_EXCL_TYPE = "PROMO"
Q16_SIZES = (1, 5, 10, 15, 20, 25, 30, 35, 40, 45)


@query(
    "q16_supplier_part_variety",
    oracle=f"""
    WITH bridge AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    )
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM bridge
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> '{Q16_EXCL_BRAND}'
      AND p_type  <> '{Q16_EXCL_TYPE}'
      AND p_size IN {Q16_SIZES}
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16 shape: how many distinct suppliers can deliver each
    (brand, type, size) bucket, excluding black-listed suppliers — a
    DISTINCT bridge, a NOT IN anti join, and a COUNT(DISTINCT)
    rollup. Adaptation: the bridge is lineitem's DISTINCT
    (partkey, suppkey) (standing in for partsupp) and the
    "complaints" comment filter becomes a negative-balance filter —
    same anti-join placement.

    Scale plan: part is brand/type/size-pruned at the scan and
    broadcast onto the bridge; the excluded-supplier list is tiny and
    anti-joins by broadcast (NOT IN on a non-nullable key → safe
    left_anti); COUNT(DISTINCT suppkey) expands to the standard
    two-level partial aggregate, both levels map-combined. Nothing in
    the plan carries strings except the 3 grouping columns."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != Q16_EXCL_BRAND)
            & (F.col("p_type") != Q16_EXCL_TYPE)
            & (F.col("p_size").isin(*Q16_SIZES))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    # semi-join BEFORE the distinct: only surviving parts' pairs enter
    # the dedup shuffle (per-pair dedup is independent of the part set
    # — review finding, same device as q2's bridge)
    bridge = (
        li.select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(p.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .distinct()
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        bridge.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


#: q20: the part-name prefix, the review year, the dominance share,
#: and the supplier nation under review
Q20_NAME_PREFIX = "red"
Q20_YEAR_START = "1997-01-01"
Q20_YEAR_END = "1998-01-01"
Q20_SHARE = 0.3
Q20_NATION = "NATION_3"


@query(
    "q20_dominant_share_suppliers",
    oracle=f"""
    WITH scoped AS (
        SELECT l_partkey, l_suppkey,
               CAST(l_quantity AS DECIMAL(18,2)) AS qty
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '{Q20_NAME_PREFIX}%'
          AND l_shipdate >= TIMESTAMP '{Q20_YEAR_START}'
          AND l_shipdate <  TIMESTAMP '{Q20_YEAR_END}'
    ), pair AS (
        SELECT l_partkey, l_suppkey,
               CAST(SUM(qty) AS DOUBLE) AS pair_qty
        FROM scoped GROUP BY l_partkey, l_suppkey
    ), part_total AS (
        SELECT l_partkey AS pt_key,
               CAST(SUM(qty) AS DOUBLE) AS part_qty
        FROM scoped GROUP BY l_partkey
    )
    SELECT s_suppkey, s_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = '{Q20_NATION}'
      AND s_suppkey IN (
          SELECT l_suppkey FROM pair
          JOIN part_total ON pt_key = l_partkey
          WHERE pair_qty > {Q20_SHARE} * part_qty
      )
    ORDER BY s_suppkey
    """,
)
def q20_dominant_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 shape: suppliers holding a dominant share of a
    product line's yearly volume in one nation — a NESTED aggregate
    (pair volume vs part total over the same scoped scan) whose
    comparison feeds a SEMI join against the supplier dim.
    Adaptation: ``ps_availqty > 0.5 × shipped`` becomes "pair shipped
    > 0.3 × part total shipped" (partsupp is absent); the
    two-granularity-aggregate + semi-join plan is the original's.

    Scale plan: one scoped scan (name-pruned part broadcast, date
    range pushed down) feeds BOTH granularities; the part total joins
    the pair frame on partkey — the key the pair groupBy already
    hashed, so AQE chains the exchanges. The qualifying-supplier set
    collapses to DISTINCT int64 keys before the semi join; the
    nation scoping broadcasts. DECIMAL-quantized sums make the share
    comparison exact cross-engine."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(Q20_YEAR_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q20_YEAR_END).cast("timestamp"))
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like(f"{Q20_NAME_PREFIX}%"))
        .select("p_partkey")
    )
    scoped = li.join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    ).select(
        "l_partkey",
        "l_suppkey",
        F.col("l_quantity").cast("decimal(18,2)").alias("qty"),
    )
    pair = scoped.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("qty").cast("double").alias("pair_qty")
    )
    part_total = scoped.groupBy(F.col("l_partkey").alias("pt_key")).agg(
        F.sum("qty").cast("double").alias("part_qty")
    )
    dominant = (
        pair.join(part_total, F.col("pt_key") == F.col("l_partkey"))
        .filter(F.col("pair_qty") > F.lit(Q20_SHARE) * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name") == Q20_NATION)
        .select("n_nationkey")
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


#: q21: a line is "late" when it ships this long after the order date
Q21_LATE_DAYS = 90


@query(
    "q21_sole_late_suppliers",
    oracle=f"""
    WITH flagged AS (
        SELECT l_orderkey, l_suppkey,
               CASE WHEN l_shipdate >
                         o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
                    THEN l_suppkey END AS late_supp
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F'
    ), per_order AS (
        SELECT l_orderkey,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT late_supp) AS n_late_supp,
               MAX(late_supp) AS sole_late_supp
        FROM flagged GROUP BY l_orderkey
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM per_order
    JOIN supplier ON s_suppkey = sole_late_supp
    WHERE n_supp > 1 AND n_late_supp = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_sole_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 shape: suppliers who were the ONLY late shipper on a
    finished multi-supplier order — the famous double correlated
    EXISTS / NOT EXISTS over the same fact, decorrelated into ONE
    per-order conditional aggregate: n_supp>1 replays the EXISTS
    (another supplier participated), n_late_supp=1 replays the NOT
    EXISTS (no OTHER supplier was late), and MAX(late_supp) recovers
    that sole supplier without a third self-join. Adaptation: late =
    ship > order date + {Q21_LATE_DAYS}d (no commit/receipt dates in
    the testdata); the decorrelation is the point of the shape.

    Scale plan: instead of the naive THREE self-joins of lineitem
    (the correlated plan), one orderkey join + one orderkey groupBy —
    strictly fewer shuffles than the textbook plan, and the groupBy
    reuses the join's hash partitioning under AQE. Supplier names
    broadcast onto the per-order survivors; the final top-100 is
    TakeOrderedAndProject."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {Q21_LATE_DAYS} DAYS"
    )
    per_order = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("late_supp", F.when(late, F.col("l_suppkey")))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("late_supp").alias("n_late_supp"),
            F.max("late_supp").alias("sole_late_supp"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.join(
            F.broadcast(s), F.col("s_suppkey") == F.col("sole_late_supp")
        )
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
