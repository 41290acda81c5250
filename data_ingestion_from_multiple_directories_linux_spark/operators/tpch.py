"""TPC-H-shape analytic queries, second batch (SURVEY.md §2.12a L56).

Round 3 added the q1/q3/q5/q10 join shapes (operators/relational.py);
this module completes the classic scan/join/agg spectrum with five more
shapes, chosen for the *physical-plan* property each one exercises:

* q6  — pure scan-side aggregation: every predicate must reach the
  parquet scan (PushedFilters), zero joins, one partial-agg shuffle of
  exactly one row per partition.
* q14 — two-table join + conditional aggregation: CASE WHEN inside SUM
  computes both branches of a ratio in ONE pass (never two scans).
* q18 — having-filtered aggregate joined back to facts: the group-by
  result is itself the join input, and the top-k is
  TakeOrderedAndProject, never a global sort.
* q19 — disjunctive multi-branch predicate: the OR of three
  (brand, size, quantity) branches, with the hoisted common superset
  predicates applied scan-side so the join input is pruned even though
  the full disjunction can only run post-join.
* q4  — EXISTS with a non-equi residual: a left-semi join whose
  condition mixes the orderkey equi-key with an inequality on columns
  from BOTH sides (ship date vs. order date) — the residual rides the
  semi join, no fact-fact full join is ever materialized.

The reference pipeline has no analytic tier (its queries stop at the
work-queue/audit shapes in reference file_loader.py); this family is
part of the additive analytics surface that makes the engine a complete
warehouse target. All money sums are DECIMAL-quantized (registry.dsum)
so the value hash is byte-stable between Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import dsum, dsum_sql, query

__all__ = [
    "q6_forecast_revenue",
    "q14_promo_effect",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q4_late_shipment_priority",
]


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * l_discount', 4)} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q6 shape: forecast-revenue-change — one filtered scan, one
    global aggregate, no join.

    Scale plan: all three predicates (ship-date range, discount band,
    quantity cap) are simple comparisons on scan columns, so they push
    into the parquet reader (PushedFilters + row-group min/max skipping
    on the date range); the aggregate combines map-side, so the single
    shuffle moves one partial row per input partition regardless of
    data size. This is the cheapest possible shape at 100 TB — I/O
    bound on exactly the row groups the date range admits."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"),
        F.count("*").cast("long").alias("n_lines"),
    )


@query(
    "q14_promo_effect",
    oracle=f"""
    SELECT (100.0 * promo_revenue) / total_revenue AS promo_pct,
           promo_revenue, total_revenue
    FROM (
        SELECT
            {dsum_sql("CASE WHEN p_type = 'PROMO' "
                      "THEN l_extendedprice * (1 - l_discount) "
                      "ELSE 0 END", 4)} AS promo_revenue,
            {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS total_revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate <  TIMESTAMP '1996-10-01'
    )
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q14 shape: share of one month's revenue from PROMO parts.

    The numerator is a CASE WHEN inside the same SUM pass as the
    denominator — one scan, one join, one aggregate, never two plans
    unioned. Scale plan: the ship-date month prunes lineitem scan-side
    BEFORE the join; part is the small side and is explicitly broadcast
    (2M rows at SF100 ≈ tens of MB of (partkey, type)); the final
    division happens on two already-quantized scalars, so the ratio is
    the identical IEEE double in both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    sums = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0), 4).alias(
                "promo_revenue"
            ),
            dsum(rev, 4).alias("total_revenue"),
        )
    )
    return sums.select(
        ((F.lit(100.0) * F.col("promo_revenue")) / F.col("total_revenue")).alias(
            "promo_pct"
        ),
        "promo_revenue",
        "total_revenue",
    )


#: q18 volume threshold — at the synthetic ~4 lines/order with quantity
#: U(1,50), sum > 160 selects the top ~15% of orders
Q18_MIN_QTY = 160


@query(
    "q18_large_volume_customers",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey, {dsum_sql('l_quantity', 2)} AS total_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING {dsum_sql('l_quantity', 2)} > {Q18_MIN_QTY}
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           total_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q18 shape: customers behind the largest-volume orders.

    The HAVING aggregate runs FIRST and becomes the join's build input:
    sum quantity per orderkey (map-side partials, one shuffle), filter
    to the heavy tail, then join orders and customer. Scale plan: the
    post-HAVING set is a small fraction of orders, so the subsequent
    joins move only qualifying keys; the top-50 by total price is
    TakeOrderedAndProject (per-partition heaps), with o_orderkey as the
    deterministic tiebreak."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", 2).alias("total_qty"))
        .filter(F.col("total_qty") > Q18_MIN_QTY)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(50)
    )


#: the three (brand, size-band, quantity-band) branches of q19
Q19_BRANCHES = (
    ("Brand#4", 1, 15, 1, 21),
    ("Brand#2", 10, 30, 10, 30),
    ("Brand#19", 20, 50, 20, 40),
)


def _q19_branch_sql(b: tuple) -> str:
    brand, s_lo, s_hi, q_lo, q_hi = b
    return (
        f"(p_brand = '{brand}' AND p_size BETWEEN {s_lo} AND {s_hi}"
        f" AND l_quantity BETWEEN {q_lo} AND {q_hi})"
    )


@query(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE {' OR '.join(_q19_branch_sql(b) for b in Q19_BRANCHES)}
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q19 shape: revenue under an OR of three (brand, size,
    quantity) branch predicates.

    The full disjunction references columns from both tables, so it can
    only be evaluated post-join — but each branch's single-table parts
    have a finite superset, and that superset is hoisted onto the scans
    explicitly: part is pre-filtered to the three brands (and the size
    hull), lineitem to the quantity hull. At 100 TB this is the
    difference between joining 2M part rows and joining the ~12% that
    can possibly match. The pruned part side is then broadcast; the OR
    itself runs codegen'd on the join output. The hoisted predicates
    are redundant with the disjunction (pure supersets), so the oracle
    states only the disjunction."""
    q_lo = min(b[3] for b in Q19_BRANCHES)
    q_hi = max(b[4] for b in Q19_BRANCHES)
    s_lo = min(b[1] for b in Q19_BRANCHES)
    s_hi = max(b[2] for b in Q19_BRANCHES)
    brands = [b[0] for b in Q19_BRANCHES]
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(q_lo, q_hi)
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin(brands) & F.col("p_size").between(s_lo, s_hi)
    )
    branch = None
    for brand, b_s_lo, b_s_hi, b_q_lo, b_q_hi in Q19_BRANCHES:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(b_s_lo, b_s_hi)
            & F.col("l_quantity").between(b_q_lo, b_q_hi)
        )
        branch = c if branch is None else (branch | c)
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(branch)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


@query(
    "q4_late_shipment_priority",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q4 shape: orders with at least one line shipped >60 days
    after the order date, counted per priority.

    The EXISTS is a LEFT SEMI join whose condition mixes the orderkey
    equi-key with a non-equi residual comparing columns from both sides
    (l_shipdate > o_orderdate + 60 days). Scale plan: the semi join
    hash-partitions both facts on orderkey (the natural co-location
    key), evaluates the residual per matched pair, and emits each order
    AT MOST once — no duplicate-then-distinct, no fact×fact blow-up.
    The five-row result aggregates map-side."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


#: how many top parts each brand reports
TOPK_PER_BRAND = 3


@query(
    "top_parts_per_brand",
    oracle=f"""
    WITH rev AS (
        SELECT p_brand,
               p_partkey,
               {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, p_partkey
    )
    SELECT p_brand, CAST(rnk AS BIGINT) AS rnk, p_partkey, revenue
    FROM (
        SELECT p_brand, p_partkey, revenue,
               row_number() OVER (
                   PARTITION BY p_brand
                   ORDER BY revenue DESC, p_partkey
               ) AS rnk
        FROM rev
    )
    WHERE rnk <= {TOPK_PER_BRAND}
    ORDER BY p_brand, rnk
    """,
)
def top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k: each brand's {TOPK_PER_BRAND} highest-revenue
    parts — the per-group sibling of top_k_orders (a global top-k can
    use TakeOrderedAndProject; a per-GROUP one cannot, and the naive
    move of sorting everything is the scale bug this shape avoids).

    Plan: revenue per (brand, part) with map-side partial aggregation
    (one shuffle on the composite key), then a rank window PARTITIONED
    BY BRAND — groups rank in parallel, each inside its own partition,
    no global order anywhere. The aggregation shrinks the window input
    to one row per part before any sorting happens; at 100 TB the
    window sorts |parts| rows, never |lineitem|. (p_partkey tiebreak
    keeps equal-revenue ranks deterministic across engines.)"""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("revenue"), "p_partkey")
    return (
        rev.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TOPK_PER_BRAND)
        .select("p_brand", "rnk", "p_partkey", "revenue")
        .orderBy("p_brand", "rnk")
    )


#: the two trading nations of the q7 volume matrix
Q7_NATIONS = ("NATION_3", "NATION_7")


@query(
    "q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           {dsum_sql('l_extendedprice * (1 - l_discount)', 4)} AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = '{Q7_NATIONS[0]}' AND n2.n_name = '{Q7_NATIONS[1]}')
        OR (n1.n_name = '{Q7_NATIONS[1]}' AND n2.n_name = '{Q7_NATIONS[0]}'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q7 shape: bilateral trade volume — revenue between two
    specific (supplier nation, customer nation) pairs per ship year.

    The disjunctive nation-pair predicate references BOTH dimension
    joins, so it runs after them — but each nation dim is pre-pruned
    to the two named nations (a superset of the disjunction) and
    BROADCAST-JOINED INTO ITS FACT-DIM SIDE FIRST: supplier⋈n1 and
    customer⋈n2 shrink to the two nations' rows (~2/25 of each)
    BEFORE any fact shuffle, so the expensive lineitem/orders joins
    never carry out-of-scope suppliers or customers (Catalyst does
    not reorder joins — CBO off — so the pruning order is stated
    explicitly; review finding). The ship-date range prunes lineitem
    at the scan. Four result rows per year pair; partial aggs
    everywhere."""
    n1_names = list(Q7_NATIONS)
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(n1_names)
    )
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == Q7_NATIONS[0])
        & (F.col("cust_nation") == Q7_NATIONS[1])
    ) | (
        (F.col("supp_nation") == Q7_NATIONS[1])
        & (F.col("cust_nation") == Q7_NATIONS[0])
    )
    s2 = s.join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")
    ).select("s_suppkey", "supp_nation")
    c2 = c.join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")
    ).select("c_custkey", "cust_nation")
    return (
        s2.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c2, F.col("c_custkey") == F.col("o_custkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


#: q8: market share of this nation's suppliers within this region's
#: customers, for this part type
Q8_NATION = "NATION_2"
Q8_REGION = "ASIA"
Q8_TYPE = "PROMO"


@query(
    "q8_market_share",
    oracle=f"""
    WITH volume AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount) AS vol,
               n2.n_name AS supp_nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = '{Q8_REGION}' AND p_type = '{Q8_TYPE}'
    )
    SELECT o_year,
           {dsum_sql(f"CASE WHEN supp_nation = '{Q8_NATION}' "
                     "THEN vol ELSE 0 END", 4)} AS nation_volume,
           {dsum_sql('vol', 4)} AS total_volume,
           {dsum_sql(f"CASE WHEN supp_nation = '{Q8_NATION}' "
                     "THEN vol ELSE 0 END", 4)}
               / {dsum_sql('vol', 4)} AS mkt_share
    FROM volume
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q8 shape: one nation's market share inside one region's
    market for one part type, per order year — the CASE-WHEN-ratio
    aggregate over a deep (8-table) join tree.

    Scale plan: part is pre-filtered to the type and BROADCAST (it
    prunes the fact stream hardest, so it joins first); region/nation
    prune CUSTOMER membership via a broadcast join BEFORE customer
    enters the orders shuffle (Catalyst doesn't reorder joins, so the
    region pruning is placed explicitly where it shrinks the fact
    chain — review finding); the supplier-side nation (unselective, a
    label) broadcasts after. Numerator and denominator compute in the
    SAME aggregate pass (conditional sum), and the share divides two
    decimal-quantized doubles — one pass, no union of two plans,
    deterministic IEEE ratio."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == Q8_TYPE
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == Q8_REGION
    )
    n1 = n.join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cust_nkey"))
    n2 = n.select(
        F.col("n_nationkey").alias("supp_nkey"),
        F.col("n_name").alias("supp_nation"),
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_vol = F.when(F.col("supp_nation") == Q8_NATION, vol).otherwise(0)
    c2 = c.join(
        F.broadcast(n1), F.col("c_nationkey") == F.col("cust_nkey")
    ).select("c_custkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c2, F.col("c_custkey") == F.col("o_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("supp_nkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            dsum(nation_vol, 4).alias("nation_volume"),
            dsum(vol, 4).alias("total_volume"),
        )
        .select(
            "o_year",
            "nation_volume",
            "total_volume",
            (F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


#: q17: revenue sitting in small-quantity lines of one brand's parts
Q17_BRAND = "Brand#4"
Q17_QTY_FACTOR = 0.2


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH avgq AS (
        SELECT l_partkey AS ap_key,
               {Q17_QTY_FACTOR} * (
                   {dsum_sql('l_quantity', 2)} / CAST(COUNT(*) AS DOUBLE)
               ) AS qty_threshold
        FROM lineitem GROUP BY l_partkey
    )
    SELECT {dsum_sql('l_extendedprice', 4)} AS total_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN avgq ON ap_key = l_partkey
    WHERE p_brand = '{Q17_BRAND}'
      AND l_quantity < qty_threshold
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q17 shape: revenue in lines whose quantity is below 20% of
    their part's average — the CORRELATED AGGREGATE SUBQUERY, written
    decorrelated: the per-part average computes ONCE as a groupBy and
    joins back, instead of re-running per outer row (the classic
    optimizer rewrite, stated explicitly so the plan is the scalable
    one by construction on any engine).

    Scale plan: the per-part threshold frame aggregates ONLY the
    brand's parts — a broadcast SEMI join against the pruned part dim
    restricts lineitem before the groupBy, so ~96% of the per-part
    aggregation work and broadcast payload that the final brand join
    would discard is never computed (each part's average uses exactly
    its own rows, so pre-restricting the part set changes nothing —
    review finding). The average is decimal-quantized-sum / exact
    count, then scaled by {Q17_QTY_FACTOR} — the same IEEE sequence in
    both engines, so the threshold COMPARISON is exact cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == Q17_BRAND
    ).select("p_partkey")
    avgq = (
        li.join(
            F.broadcast(p),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy(F.col("l_partkey").alias("ap_key"))
        .agg(
            (
                F.lit(Q17_QTY_FACTOR)
                * (dsum("l_quantity", 2) / F.count("*").cast("double"))
            ).alias("qty_threshold")
        )
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(avgq), F.col("ap_key") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            dsum("l_extendedprice", 4).alias("total_revenue"),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


@query(
    "q22_idle_customers",
    oracle=f"""
    WITH thresh AS (
        SELECT {dsum_sql('c_acctbal', 2)} / CAST(COUNT(*) AS DOUBLE)
                   AS avg_bal
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           {dsum_sql('c_acctbal', 2)} AS total_acctbal
    FROM customer, thresh
    WHERE c_acctbal > thresh.avg_bal
      AND NOT EXISTS (
          SELECT 1 FROM orders WHERE o_custkey = c_custkey
      )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q22 shape: well-funded customers who never ordered —
    a global scalar threshold (average positive balance) feeding a
    NOT EXISTS anti join, grouped by segment.

    Scale plan: the threshold is a 1-row aggregate broadcast onto the
    customer scan (scalar-subquery decorrelation, the same device as
    tf_idf's corpus size); the NOT EXISTS is a LEFT ANTI hash join on
    custkey against just the orders key column (pruned scan). Both
    wide inputs shuffle once on custkey; the segment rollup is a
    five-row aggregate. The quantized-sum/COUNT average makes the
    threshold comparison identical in both engines."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    thresh = c.filter(F.col("c_acctbal") > 0).agg(
        (dsum("c_acctbal", 2) / F.count("*").cast("double")).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            dsum("c_acctbal", 2).alias("total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )
