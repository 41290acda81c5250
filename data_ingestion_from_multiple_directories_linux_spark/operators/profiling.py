"""Data-profiling operators: key-skew profiling + exact stratified
sampling (SURVEY.md §2.12a L61/L62).

Skew is the recurring villain of every shuffle in this engine (the
dedup family's df_cap/bucket_cap guards, the salted aggregation in
operators/relational.py) — this module adds the operator that *finds*
it: a per-key distribution profile a planner (or operator parameter
tuner) reads before choosing salting factors and broadcast thresholds.
The stratified sampler is its corpus-side sibling: per-stratum
deterministic sampling that preserves group proportions exactly — the
shape used for eval-split carve-outs and per-language corpus audits.

Both follow the module-wide determinism rules: md5-derived ordering for
"randomness", integer-DIV permille ratios instead of floats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

# the cross-engine 60-bit hash convention is defined ONCE in
# operators/sketches.py — imported so the two files cannot drift
# (review finding: two copies of a determinism-critical definition)
from .sketches import HASH_SCALE as _H60_SCALE
from .sketches import _SQL_H60 as _SQL_H60_U
from .sketches import _h60

__all__ = ["key_skew_profile", "stratified_sample_docs"]

#: how many of the heaviest keys the profile reports
SKEW_TOP_K = 100


@query(
    "key_skew_profile",
    oracle=f"""
    WITH base AS (
        SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL
    ),
    per_key AS (
        SELECT o_custkey AS key, COUNT(*) AS n_rows
        FROM base GROUP BY o_custkey
    ),
    tot AS (
        SELECT COUNT(*) AS n_total, COUNT(DISTINCT o_custkey) AS n_keys
        FROM base
    ),
    top AS (
        SELECT key, n_rows FROM per_key
        ORDER BY n_rows DESC, key LIMIT {SKEW_TOP_K}
    )
    SELECT CAST(row_number() OVER w AS BIGINT) AS rank,
           key,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST((1000 * n_rows) // n_total AS BIGINT) AS share_permille,
           CAST((1000 * SUM(n_rows) OVER (
               ORDER BY n_rows DESC, key
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           )) // n_total AS BIGINT) AS cum_share_permille,
           CAST(n_keys AS BIGINT) AS n_keys,
           CAST(n_total AS BIGINT) AS n_total
    FROM top, tot
    WINDOW w AS (ORDER BY n_rows DESC, key)
    ORDER BY rank
    """,
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew profile of orders.o_custkey: the top-{SKEW_TOP_K}
    heaviest keys with each key's share and the cumulative share of the
    head — the numbers that decide whether a downstream join needs
    salting (head keys carry a disproportionate share) or a broadcast
    (n_keys small).

    Plan: one map-side-combined groupBy on the key, then
    TakeOrderedAndProject for the top-k — per-partition heaps of k,
    never a global sort of the key histogram. The rank/cumulative
    window runs AFTER the LIMIT, over exactly {SKEW_TOP_K} rows on one
    partition — bounded by the constant k, the same deliberately-tiny
    single-partition tail as top_k_orders (a window over the full
    histogram would be the scale bug). Totals join in as a 1-row
    broadcast scalar. Ratios are integer permille (1000·n DIV total).

    NULL keys are excluded consistently (adversarial-corpus finding):
    a NULL join key never matches, so it cannot cause JOIN skew, and
    COUNT(DISTINCT) was already excluding it from n_keys while the
    per-key histogram and n_total counted it — besides the internal
    inconsistency, the NULL group's position under the engines'
    opposite NULL sort orders flipped the top-k tie-break."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull()
    )
    per_key = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count("*").alias("n_rows")
    )
    top = per_key.orderBy(F.desc("n_rows"), "key").limit(SKEW_TOP_K)
    tot = o.agg(
        F.count("*").alias("n_total"),
        F.countDistinct("o_custkey").alias("n_keys"),
    )
    w = Window.orderBy(F.desc("n_rows"), "key")
    return (
        top.crossJoin(F.broadcast(tot))
        .select(
            F.row_number().over(w).cast("long").alias("rank"),
            "key",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.expr("(1000 * n_rows) DIV n_total").cast("long").alias(
                "share_permille"
            ),
            F.sum("n_rows")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("cum_rows"),
            F.col("n_keys").cast("long").alias("n_keys"),
            F.col("n_total").cast("long").alias("n_total"),
        )
        .select(
            "rank",
            "key",
            "n_rows",
            "share_permille",
            F.expr("(1000 * cum_rows) DIV n_total").cast("long").alias(
                "cum_share_permille"
            ),
            "n_keys",
            "n_total",
        )
        .orderBy("rank")
    )


#: sampling rate as a rational: keep ceil(n · NUM/DEN) rows per stratum
SAMPLE_NUM = 1
SAMPLE_DEN = 5


@query(
    "stratified_sample_docs",
    oracle=f"""
    WITH counts AS (
        SELECT lang, COUNT(*) AS n_stratum FROM documents GROUP BY lang
    ),
    ranked AS (
        SELECT doc_id, lang, source, n_chars,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    )
    SELECT r.doc_id, r.lang, r.source, r.n_chars,
           CAST(c.n_stratum AS BIGINT) AS n_stratum
    FROM ranked r JOIN counts c ON r.lang = c.lang
    WHERE r.rn <= (c.n_stratum * {SAMPLE_NUM} + {SAMPLE_DEN} - 1)
                  // {SAMPLE_DEN}
    ORDER BY r.lang, r.doc_id
    """,
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact stratified sample of documents: ceil(20%) of every language
    stratum, deterministically.

    Proportional allocation is EXACT (ceil(n·1/5) per stratum, integer
    arithmetic), not expected-value like Bernoulli df.sample() — small
    strata are never accidentally emptied, and reruns are identical.
    "Random" order within a stratum is the md5 of the doc id (the
    fixed-hash uniform device shared with dataset_split_assign): rows
    are ranked per-stratum by hash and the top ceil-quota kept. Plan:
    per-stratum counts (tiny, broadcast back), one hash exchange on
    lang for the rank window — strata process in parallel; no global
    order. At 100 TB with a skewed stratum the window key gains the
    same salt-prefix treatment as salted_skew_counts, trading exact
    rank for per-salt quotas."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("n_stratum"))
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id"
    )
    ranked = d.select("doc_id", "lang", "source", "n_chars").withColumn(
        "rn", F.row_number().over(w)
    )
    quota = F.expr(
        f"(n_stratum * {SAMPLE_NUM} + {SAMPLE_DEN} - 1) DIV {SAMPLE_DEN}"
    )
    return (
        ranked.join(F.broadcast(counts), "lang")
        .filter(F.col("rn") <= quota)
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            F.col("n_stratum").cast("long").alias("n_stratum"),
        )
        .orderBy("lang", "doc_id")
    )


#: count-min geometry: 2 independent hash rows × 64 buckets
CM_DEPTH = 2
CM_WIDTH = 64
#: how many of the heaviest true keys to audit against the sketch
CM_TOP_K = 10

_SQL_CM_H = (
    "CAST('0x' || substr(md5('cm{j}:' || CAST({c} AS VARCHAR)), 1, 15)"
    f" AS BIGINT) % {CM_WIDTH}"
)


def _cm_hash(j: int, col) -> F.Column:
    """Bucket of the j-th count-min hash row — 60-bit md5 prefix mod
    width, identical in Spark (conv base-16) and DuckDB ('0x' cast)."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(f"cm{j}:"), col.cast("string")).cast(
                        "binary"
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % CM_WIDTH
    )


@query(
    "count_min_heavy_hitters",
    oracle=f"""
    WITH cells AS (
        SELECT j, bucket, COUNT(*) AS cell_n
        FROM (
            SELECT 0 AS j, {_SQL_CM_H.format(j=0, c='user_id')} AS bucket
            FROM events
            UNION ALL
            SELECT 1 AS j, {_SQL_CM_H.format(j=1, c='user_id')} AS bucket
            FROM events
        )
        GROUP BY j, bucket
    ),
    top AS (
        SELECT user_id, COUNT(*) AS true_n
        FROM events GROUP BY user_id
        ORDER BY true_n DESC, user_id LIMIT {CM_TOP_K}
    )
    SELECT t.user_id,
           CAST(t.true_n AS BIGINT) AS true_n,
           CAST(LEAST(c0.cell_n, c1.cell_n) AS BIGINT) AS cm_estimate,
           CAST(LEAST(c0.cell_n, c1.cell_n) - t.true_n AS BIGINT)
               AS overestimate
    FROM top t
    JOIN cells c0 ON c0.j = 0
       AND c0.bucket = {_SQL_CM_H.format(j=0, c='t.user_id')}
    JOIN cells c1 ON c1.j = 1
       AND c1.bucket = {_SQL_CM_H.format(j=1, c='t.user_id')}
    ORDER BY true_n DESC, t.user_id
    """,
)
def count_min_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch audit: the {CM_TOP_K} heaviest event keys with
    their true counts next to the sketch's estimate (always ≥ true —
    the one-sided count-min error), over a {CM_DEPTH}×{CM_WIDTH} table.

    Like the KMV sketch (operators/sketches.py), an "approximate"
    structure made exactly reproducible by fixing the hash family
    (md5-derived), so the estimate is a VALUE the oracle replicates
    bit-for-bit, not a distribution. Why it matters at 100 TB: the
    sketch is {CM_DEPTH}·{CM_WIDTH} integers REGARDLESS of key
    cardinality, its cells are pure partial counts (map-side combine;
    cells from different days/sources merge by addition), and the
    frequency of ANY key is answerable later without re-scanning. Plan:
    one explode(×{CM_DEPTH}) + groupBy for the cells, one groupBy +
    top-k for the audit keys, then two broadcast hash joins of the
    128-cell table onto the {CM_TOP_K}-row audit frame.

    NULL-key contract (shared by both engines, pinned by the hashlib
    fuzz test): a heavy NULL key occupies one of the {CM_TOP_K} audit
    slots (it outranks real keys in the count ordering) and is then
    dropped by the cell joins (a NULL bucket matches nothing), so the
    audit reports {CM_TOP_K}-1 rows on NULL-heavy data — NULL keys are
    an upstream cleansing concern, not a frequency-sketch member."""
    e = load_table(spark, sf_dir, "events")
    u = F.col("user_id")
    cells = (
        e.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            _cm_hash(j, u).alias("bucket"),
                        )
                        for j in range(CM_DEPTH)
                    ]
                )
            ).alias("cell")
        )
        .select("cell.j", "cell.bucket")
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("cell_n"))
    )
    top = (
        e.groupBy("user_id")
        .agg(F.count("*").alias("true_n"))
        .orderBy(F.desc("true_n"), "user_id")
        .limit(CM_TOP_K)
    )
    c0 = cells.filter(F.col("j") == 0).select(
        F.col("bucket").alias("b0"), F.col("cell_n").alias("n0")
    )
    c1 = cells.filter(F.col("j") == 1).select(
        F.col("bucket").alias("b1"), F.col("cell_n").alias("n1")
    )
    est = F.least(F.col("n0"), F.col("n1"))
    return (
        top.join(F.broadcast(c0), _cm_hash(0, F.col("user_id")) == F.col("b0"))
        .join(F.broadcast(c1), _cm_hash(1, F.col("user_id")) == F.col("b1"))
        .select(
            "user_id",
            F.col("true_n").cast("long").alias("true_n"),
            est.cast("long").alias("cm_estimate"),
            (est - F.col("true_n")).cast("long").alias("overestimate"),
        )
        .orderBy(F.desc("true_n"), "user_id")
    )


#: columns profiled by table_profile_orders, in output order
PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


#: double-typed profile columns — their stringified statistics (min/
#: max rendering, distinct-count input, sketch hash input) go through
#: the canonical form below so dirty floats profile identically in
#: both engines.
_PROFILE_DOUBLE_COLS = frozenset({"o_totalprice"})


def _canon_dbl_sql(e: str) -> str:
    """DuckDB canonical string form of a double expression: NaN/±Inf
    pinned to Spark's spellings ('NaN'/'Infinity'/'-Infinity' vs
    DuckDB's native 'nan'/'inf'), ±0.0 merged to '0.0' (the engines
    also disagree on whether MIN may surface -0.0 — DuckDB's total
    order splits the zeros, Spark normalizes them). Finite nonzero
    values keep the engine's shortest-roundtrip decimal rendering,
    identical across engines in the plain-notation regime (|v| <
    1e7-ish, where Spark switches to scientific notation and DuckDB
    doesn't); o_totalprice is bounded well inside it. For a wider
    domain the swap is rendering through a fixed-scale DECIMAL."""
    return (
        f"CASE WHEN isnan({e}) THEN 'NaN'"
        f" WHEN {e} = 'Infinity'::DOUBLE THEN 'Infinity'"
        f" WHEN {e} = '-Infinity'::DOUBLE THEN '-Infinity'"
        f" WHEN {e} = 0 THEN '0.0'"
        f" ELSE CAST({e} AS VARCHAR) END"
    )


def _canon_dbl(col: Column) -> Column:
    """Spark twin of :func:`_canon_dbl_sql` (NaN first — Spark's
    ``=`` treats NaN as equal to NaN, so the isnan guard must win)."""
    return (
        F.when(F.isnan(col), F.lit("NaN"))
        .when(col == F.lit(float("inf")), F.lit("Infinity"))
        .when(col == F.lit(float("-inf")), F.lit("-Infinity"))
        .when(col == F.lit(0.0), F.lit("0.0"))
        .otherwise(col.cast("string"))
    )


def _sql_stat_exprs(c: str) -> tuple[str, str, str]:
    """(distinct-input, min-render, max-render) per oracle column."""
    if c in _PROFILE_DOUBLE_COLS:
        return (
            _canon_dbl_sql(c),
            _canon_dbl_sql(f"MIN({c})"),
            _canon_dbl_sql(f"MAX({c})"),
        )
    return c, f"CAST(MIN({c}) AS VARCHAR)", f"CAST(MAX({c}) AS VARCHAR)"


@query(
    "table_profile_orders",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT({c}) AS BIGINT) AS n_nonnull,
           CAST(COUNT(DISTINCT {_sql_stat_exprs(c)[0]}) AS BIGINT)
               AS n_distinct,
           {_sql_stat_exprs(c)[1]} AS min_value,
           {_sql_stat_exprs(c)[2]} AS max_value
    FROM orders
    """
        for c in PROFILE_COLS
    ),
)
def table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile of orders — the ANALYZE/data-quality
    report: per column, row count, non-null count, exact distinct
    count, and min/max (stringified to a uniform schema).

    Everything computes in a SINGLE aggregate pass over one scan — 6
    columns × 4 statistics as 24 aggregate expressions, partial
    map-side states, one shuffle of one row per partition — then the
    1×24 result unpivots to 6 rows with stack(). The exact distincts
    make the pass multi-shuffle under the hood (Spark expands distinct
    aggregates), but never a per-column scan. This is the profile a
    migration (table_fingerprint's use case) or an ingest contract
    check reads first; at 100 TB the exact distincts would swap for the
    KMV sketch (operators/sketches.py) column-by-column."""
    o = load_table(spark, sf_dir, "orders", spread=True)
    aggs = [F.count("*").alias("n_rows")]
    for c in PROFILE_COLS:
        if c in _PROFILE_DOUBLE_COLS:
            aggs += [
                F.count(c).alias(f"nn_{c}"),
                F.countDistinct(_canon_dbl(F.col(c))).alias(f"nd_{c}"),
                _canon_dbl(F.min(F.col(c))).alias(f"mn_{c}"),
                _canon_dbl(F.max(F.col(c))).alias(f"mx_{c}"),
            ]
        else:
            aggs += [
                F.count(c).alias(f"nn_{c}"),
                F.countDistinct(c).alias(f"nd_{c}"),
                F.min(F.col(c)).cast("string").alias(f"mn_{c}"),
                F.max(F.col(c)).cast("string").alias(f"mx_{c}"),
            ]
    wide = o.agg(*aggs)
    rows = ", ".join(
        f"'{c}', cast(n_rows as bigint), cast(nn_{c} as bigint),"
        f" cast(nd_{c} as bigint), mn_{c}, mx_{c}"
        for c in PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(PROFILE_COLS)}, {rows}) as"
            " (column_name, n_rows, n_nonnull, n_distinct,"
            " min_value, max_value)"
        )
    )


#: independent min-hash variates per profiled column — error ~1/sqrt(K)
PROFILE_SKETCH_K = 16
#: 2^60, the hash range, as an exact integer (for modular arithmetic)
_H60_MOD = 1 << 60
#: K fixed odd multipliers < 2^17: (a·h) mod 2^60 with odd a is a
#: bijection of the hash range, so each derived variate stays uniform;
#: the product stays under 2^77 and is computed EXACTLY as DECIMAL.
_SKETCH_A = (
    1, 99991, 75979, 31337, 65537, 20011, 104729, 49999,
    86243, 39119, 122497, 57331, 91193, 27803, 119489, 44621,
)
assert len(_SKETCH_A) == PROFILE_SKETCH_K and all(a % 2 == 1 for a in _SKETCH_A)


def _profile_sketch_oracle() -> str:
    cols = []
    for c in PROFILE_COLS:
        base = _SQL_H60_U.format(c=_sql_stat_exprs(c)[0])
        hi, lo = f"(({base}) // {1 << 30})", f"(({base}) % {1 << 30})"
        mins = ", ".join(
            f"MIN(((({a} * {hi}) % {1 << 30}) * {1 << 30}"
            f" + {a} * {lo}) % {_H60_MOD})"
            for a in _SKETCH_A
        )
        est = (
            f"floor(({PROFILE_SKETCH_K} * {_H60_SCALE!r} / CAST(("
            "  SELECT "
            + " + ".join(
                f"CAST(m{i} AS DECIMAL(20,0))"
                for i in range(PROFILE_SKETCH_K)
            )
            + f"  FROM (SELECT {mins} FROM orders)"
            + f" t({', '.join(f'm{i}' for i in range(PROFILE_SKETCH_K))})"
            + ") AS DOUBLE) - 1) * 1e6 + 0.5) / 1e6"
        )
        cols.append(
            f"""
    SELECT '{c}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT({c}) AS BIGINT) AS n_nonnull,
           {est} AS estimate_distinct,
           {_sql_stat_exprs(c)[1]} AS min_value,
           {_sql_stat_exprs(c)[2]} AS max_value
    FROM orders
    """
        )
    return "\nUNION ALL\n".join(cols)


@query("table_profile_orders_sketch", oracle=_profile_sketch_oracle())
def table_profile_orders_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB shape of ``table_profile_orders``: same report, but
    distinct counts come from a K-independent-minimums sketch instead
    of exact COUNT(DISTINCT) — the swap that query's docstring names,
    implemented.

    Estimator (Cohen's size-estimation framework): per column, K
    uniform hash variates; keep MIN over all rows of each; a min over
    n distinct uniform values on [0, 2^60) has expectation 2^60/(n+1),
    so n_hat = K·2^60/Σᵢminᵢ − 1 (relative error ~1/√K ≈ 25% at K=16 —
    the profile's job is order-of-magnitude column cardinality, not an
    exact census; measured 0.62–1.50× of exact across the six columns
    spanning n=3 to n=150k at sf0.1 — derived variates are correlated
    through the shared base hash, so the band is a little wider than
    K independent hashes would give).

    Hashing cost is ONE md5 per column per row: the K variates derive
    from the single 60-bit base hash by (aᵢ·h) mod 2^60 with fixed odd
    multipliers — each an exact bijection of the range, so every
    variate is uniform over distinct values. The modular product runs
    in pure BIGINT via a 30-bit split ((a·hi mod 2^30)·2^30 + a·lo,
    then mod 2^60 — every intermediate < 2^63): plain long arithmetic.
    Two slower drafts bracketed this design: K independent md5 chains
    per row (96/row) ran 4× slower than the exact twin, and the same
    derivation in DECIMAL arithmetic 3× slower — the bigint form runs
    AT PARITY with the exact twin at sf0.1 (~2.5-3 s, both CPU-bound
    on this box) while removing the expand legs that dominate at
    cluster scale. (Both profiles aggregate via an empty-key
    SortAggregate — the string min/max buffers are immutable, which
    rules out HashAggregate; with no grouping key that is a plain
    streaming fold, no Sort node — plan-tested.)

    Why this beats the exact twin at scale: COUNT(DISTINCT c) makes
    Spark EXPAND the input (one replicated row-stream per distinct agg,
    re-shuffled on each column's values — 6 extra row-scale shuffle
    legs), while a MIN is an ordinary partial aggregate: this whole
    profile is ONE narrow pass, 96 numbers of aggregation state per
    partition, one single-row shuffle — same plan family as q6.
    MIN skips NULL hashes, so only non-null values participate (the
    COUNT(DISTINCT) convention); an all-NULL column estimates NULL.
    Determinism: modular products and the min-sum are exact DECIMAL
    integers, and the single double division + 1e-6 quantization is
    bit-identical cross-engine, so the ORACLE CHECKS THE ESTIMATES
    EXACTLY."""
    o = load_table(spark, sf_dir, "orders", spread=True)
    # one md5-derived base hash per column, computed once per row;
    # double columns hash their canonical string form so NaN/±Inf/±0
    # hash identically in both engines (_canon_dbl)
    o = o.select(
        "*",
        *[
            _h60(
                _canon_dbl(F.col(c))
                if c in _PROFILE_DOUBLE_COLS
                else F.col(c)
            ).alias(f"h_{c}")
            for c in PROFILE_COLS
        ],
    ).select(
        "*",
        *[
            F.expr(f"h_{c} DIV {1 << 30}").alias(f"hh_{c}")
            for c in PROFILE_COLS
        ],
        *[
            F.expr(f"h_{c} % {1 << 30}").alias(f"hl_{c}")
            for c in PROFILE_COLS
        ],
    )
    aggs = [F.count("*").alias("n_rows")]
    for c in PROFILE_COLS:
        if c in _PROFILE_DOUBLE_COLS:
            aggs += [
                F.count(c).alias(f"nn_{c}"),
                _canon_dbl(F.min(F.col(c))).alias(f"mn_{c}"),
                _canon_dbl(F.max(F.col(c))).alias(f"mx_{c}"),
            ]
        else:
            aggs += [
                F.count(c).alias(f"nn_{c}"),
                F.min(F.col(c)).cast("string").alias(f"mn_{c}"),
                F.max(F.col(c)).cast("string").alias(f"mx_{c}"),
            ]
        for i, a in enumerate(_SKETCH_A):
            variate = F.expr(
                f"((({a} * hh_{c}) % {1 << 30}) * {1 << 30}"
                f" + {a} * hl_{c}) % {_H60_MOD}"
            )
            aggs.append(F.min(variate).alias(f"m_{c}_{i}"))
    wide = o.agg(*aggs)
    ests = []
    for c in PROFILE_COLS:
        tot = " + ".join(
            f"cast(m_{c}_{i} as decimal(20,0))"
            for i in range(PROFILE_SKETCH_K)
        )
        ests.append(
            f"floor((cast({PROFILE_SKETCH_K} as double) * {_H60_SCALE!r} /"
            f" cast(({tot}) as double) - 1) * 1e6 + 0.5) / 1e6"
            f" as est_{c}"
        )
    wide = wide.selectExpr("*", *ests)
    rows = ", ".join(
        f"'{c}', cast(n_rows as bigint), cast(nn_{c} as bigint),"
        f" est_{c}, mn_{c}, mx_{c}"
        for c in PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(PROFILE_COLS)}, {rows}) as"
            " (column_name, n_rows, n_nonnull, estimate_distinct,"
            " min_value, max_value)"
        )
    )


@query(
    "join_cardinality_estimate",
    oracle="""
    WITH ca AS (
        SELECT o_orderkey AS key, COUNT(*) AS na FROM orders GROUP BY 1
    ),
    cb AS (
        SELECT l_orderkey AS key, COUNT(*) AS nb FROM lineitem GROUP BY 1
    ),
    prod AS (
        SELECT ca.key, ca.na * cb.nb AS pairs
        FROM ca JOIN cb ON ca.key = cb.key
    ),
    est AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_matching_keys,
               CAST(SUM(pairs) AS BIGINT) AS predicted_rows,
               CAST(MAX(pairs) AS BIGINT) AS max_key_pairs
        FROM prod
    ),
    act AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS actual_rows
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    )
    SELECT n_matching_keys, predicted_rows, max_key_pairs, actual_rows
    FROM est, act
    """,
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact join-size prediction WITHOUT running the join wide: the
    orders⋈lineitem output size from per-key count frames —
    sum over matching keys of na·nb — next to the true join count.

    Why this is the 100 TB planning primitive: the count frames are one
    map-combined groupBy per side (output = one row per DISTINCT key,
    not per row), their join is key-frame×key-frame — orders of
    magnitude smaller than fact×fact — and max_key_pairs exposes the
    single worst key (the salting decision in one number: compare it to
    predicted_rows/shuffle-partitions). The actual join runs here too
    only to certify the estimate is exact (predicted == actual, by
    definition for an inner equi-join); a planner would run only the
    cheap half. The two 1-row frames meet in a broadcast scalar
    join."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ca = o.groupBy(F.col("o_orderkey").alias("key")).agg(
        F.count("*").alias("na")
    )
    cb = li.groupBy(F.col("l_orderkey").alias("key")).agg(
        F.count("*").alias("nb")
    )
    prod = ca.join(cb, "key").select(
        "key", (F.col("na") * F.col("nb")).alias("pairs")
    )
    est = prod.agg(
        F.count("*").cast("long").alias("n_matching_keys"),
        F.sum("pairs").cast("long").alias("predicted_rows"),
        F.max("pairs").cast("long").alias("max_key_pairs"),
    )
    act = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .agg(F.count("*").cast("long").alias("actual_rows"))
    )
    return est.crossJoin(F.broadcast(act))


#: per-group KMV size (smaller than the global sketch's 64: daily
#: groups here hold ~150 distinct keys, so k=32 keeps the estimate
#: path exercised rather than degenerating to exact-on-all-groups)
KMV_GROUP_K = 32



@query(
    "kmv_distinct_by_day",
    oracle=f"""
    WITH ud AS (
        SELECT DISTINCT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
               user_id
        FROM events WHERE user_id IS NOT NULL
    ),
    h AS (
        SELECT day,
               CAST({_SQL_H60_U.format(c='user_id')} AS DOUBLE)
                   / {_H60_SCALE!r} AS hv
        FROM ud
    ),
    ranked AS (
        SELECT day, hv,
               row_number() OVER (PARTITION BY day ORDER BY hv) AS rn
        FROM h
    ),
    sk AS (
        SELECT day, MAX(hv) AS kth_hash, COUNT(*) AS k_used
        FROM ranked WHERE rn <= {KMV_GROUP_K}
        GROUP BY day
    ),
    ex AS (SELECT day, COUNT(*) AS exact_distinct FROM ud GROUP BY day)
    SELECT sk.day,
           CAST(k_used AS BIGINT) AS k_used,
           CASE WHEN k_used < {KMV_GROUP_K}
                THEN CAST(k_used AS DOUBLE)
                ELSE CAST(k_used - 1 AS DOUBLE) / kth_hash
           END AS estimate_distinct,
           CAST(exact_distinct AS BIGINT) AS exact_distinct
    FROM sk JOIN ex ON sk.day = ex.day
    ORDER BY sk.day
    """,
)
def kmv_distinct_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped KMV: distinct users PER DAY estimated from per-group
    k-minimum-values sketches, next to the exact counts — the grouped
    form of kmv_distinct_users (operators/sketches.py) and the shape a
    daily-uniques dashboard runs at 100 TB.

    Plan: distinct (day, user) reduction, fixed-md5 uniform hash, then
    the k smallest PER GROUP via a day-partitioned rank window — groups
    rank in parallel (WindowGroupLimit caps state at k per group),
    never a global sort. A group holding fewer than k distinct keys has
    its whole set in the sketch, so the estimate switches to the exact
    k_used (the standard KMV small-set rule). The fixed hash makes
    every per-group estimate a reproducible VALUE the oracle replicates
    bit-for-bit. NULL user_ids are excluded up front — COUNT(DISTINCT)
    semantics, and the NULL hash would otherwise sort NULLS-FIRST into
    Spark's per-day k-set but NULLS-LAST out of DuckDB's (the same
    contract as the global kmv_distinct_users sketch;
    adversarial-corpus finding)."""
    e = load_table(spark, sf_dir, "events")
    ud = (
        e.filter(F.col("user_id").isNotNull())
        .select(
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias(
                "day"
            ),
            "user_id",
        )
        .distinct()
    )
    h = ud.select(
        "day",
        (_h60(F.col("user_id")).cast("double") / F.lit(_H60_SCALE)).alias("hv"),
    )
    w = Window.partitionBy("day").orderBy("hv")
    sk = (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_GROUP_K)
        .groupBy("day")
        .agg(
            F.max("hv").alias("kth_hash"),
            F.count("*").alias("k_used"),
        )
    )
    ex = ud.groupBy("day").agg(F.count("*").alias("exact_distinct"))
    return (
        sk.join(ex, "day")
        .select(
            "day",
            F.col("k_used").cast("long").alias("k_used"),
            F.when(
                F.col("k_used") < KMV_GROUP_K,
                F.col("k_used").cast("double"),
            )
            .otherwise(
                (F.col("k_used") - 1).cast("double") / F.col("kth_hash")
            )
            .alias("estimate_distinct"),
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
        )
        .orderBy("day")
    )
