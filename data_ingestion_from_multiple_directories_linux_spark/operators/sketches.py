"""Deterministic sketch & validation operators.

Two ops that are normally "approximate" made exactly reproducible — the
trick is a fixed md5-derived uniform hash, so Spark and DuckDB compute
bit-identical results and the correctness gate can hash-compare them
(the same determinism device the IVF seeding and dataset-split ops use):

* **KMV distinct-count sketch** — the k-minimum-values estimator
  (Bar-Yossef et al.): keep the k smallest hash values of the distinct
  keys; estimate = (k-1)/u_k where u_k is the k-th smallest normalized
  hash. Unlike HLL (whose register layout is engine-specific), KMV over
  a fixed hash is a pure dataflow: distinct → k-smallest (a top-k, so
  TakeOrderedAndProject — per-partition heaps, no global sort) → one
  aggregate. At 100 TB the distinct pre-shuffle is the only wide stage,
  and the sketch itself is k numbers.
* **Table fingerprint** — order-independent per-group content checksum:
  sum over rows of a 60-bit md5 prefix of the canonical row string.
  Integer sums commute, so the fingerprint is partitioning- and
  order-independent — the cross-engine migration-validation primitive
  (this repo's own correctness driver is the use case: "does the Spark
  copy of a warehouse table equal the source?").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

#: 15 hex chars = 60 bits — fits BIGINT in both engines
HASH_SCALE = float(1 << 60)
KMV_K = 64


def _h60(col) -> F.Column:
    """60-bit integer from the md5 of a value's decimal-string form —
    identical in Spark (conv base-16) and DuckDB ('0x' cast)."""
    return F.conv(
        F.substring(F.md5(col.cast("string").cast("binary")), 1, 15), 16, 10
    ).cast("long")


_SQL_H60 = "CAST('0x' || substr(md5(CAST({c} AS VARCHAR)), 1, 15) AS BIGINT)"


def canon_row(cols) -> F.Column:
    """NULL-safe canonical row encoding shared by ``table_fingerprint``
    and ``snapshot_diff`` — the two operators must agree on what
    "changed" means, so the encoding lives in exactly one place (review
    finding). Each field is COALESCE'd to a chr(1) sentinel and fields
    join on the chr(31) unit separator; see ``table_fingerprint`` for
    why concat_ws and '|' were rejected."""
    sep, nul = F.lit("\x1f"), F.lit("\x01")
    parts: list = []
    for c in cols:
        col = F.col(c) if isinstance(c, str) else c
        parts.extend([F.coalesce(col.cast("string"), nul), sep])
    return F.concat(*parts[:-1])


@query(
    "kmv_distinct_users",
    oracle=f"""
    WITH u AS (
        SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL
    ),
    h AS (
        SELECT CAST({_SQL_H60.format(c='user_id')} AS DOUBLE)
               / {HASH_SCALE!r} AS hv
        FROM u
    ),
    kth AS (
        SELECT MAX(hv) AS kth_hash, COUNT(*) AS k
        FROM (SELECT hv FROM h ORDER BY hv LIMIT {KMV_K})
    ),
    ex AS (SELECT COUNT(*) AS exact_distinct FROM u)
    SELECT CAST(kth.k AS BIGINT) AS k,
           kth.kth_hash AS kth_hash,
           CAST(kth.k - 1 AS DOUBLE) / kth.kth_hash AS estimate_distinct,
           CAST(ex.exact_distinct AS BIGINT) AS exact_distinct
    FROM kth, ex
    """,
)
def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-user estimate over events, next to the exact count.

    Plan: distinct user_ids (one partial-agg shuffle) → md5-uniform
    hash projection → k-smallest via orderBy+limit (plans as
    TakeOrderedAndProject: per-partition heaps of size k, driver merges
    k rows) → single-row aggregate; the exact count joins in as a 1-row
    broadcast (deliberate BNLJ of a scalar, the same pattern as
    tf_idf's corpus size). Expected relative error ~1/sqrt(k-1) ≈ 13%
    at k=64 — and because the hash is fixed, the estimate is a VALUE
    the oracle reproduces exactly, not a distribution.

    NULL contract (review finding, confirmed by run): NULL user_ids
    are excluded up front — COUNT(DISTINCT x) semantics never count
    NULL, and leaving it in diverges the engines mechanically anyway
    (the NULL hash sorts NULLS-FIRST into Spark's k-set but NULLS-LAST
    out of DuckDB's, shifting the k-th hash and the estimate)."""
    u = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
    )
    h = u.select(
        (_h60(F.col("user_id")).cast("double") / F.lit(HASH_SCALE)).alias("hv")
    )
    kth = (
        h.orderBy("hv")
        .limit(KMV_K)
        .agg(F.max("hv").alias("kth_hash"), F.count("*").alias("k"))
    )
    ex = u.agg(F.count("*").alias("exact_distinct"))
    return kth.crossJoin(F.broadcast(ex)).select(
        F.col("k").cast("long").alias("k"),
        "kth_hash",
        ((F.col("k") - 1).cast("double") / F.col("kth_hash")).alias(
            "estimate_distinct"
        ),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
    )


#: canonical row encoding: NULL → chr(1) sentinel, fields joined by the
#: chr(31) unit separator — unambiguous for values containing ordinary
#: text (a value containing chr(31) itself would need escaping upstream)
_SQL_CANON = (
    "COALESCE(CAST(o_orderkey AS VARCHAR), chr(1)) || chr(31) || "
    "COALESCE(CAST(o_custkey AS VARCHAR), chr(1)) || chr(31) || "
    "COALESCE(o_orderpriority, chr(1))"
)


@query(
    "table_fingerprint",
    oracle=f"""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(CAST(SUM(CAST({_SQL_H60.format(c=_SQL_CANON)}
                              AS DECIMAL(38,0))) AS DECIMAL(38,0))
                AS VARCHAR) AS content_hash
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent per-group content checksum of orders.

    Canonical row string (keys + a payload column) → 60-bit md5 prefix
    → integer SUM per group (commutative: any partitioning, any row
    order, same fingerprint), widened to DECIMAL(38,0) so the sum is
    exact at any cardinality, surfaced as its DIGIT STRING — not a
    DOUBLE: decimal→double rounding differs between engines in the last
    ulp for some 22-digit sums (observed on this very table), and a
    fingerprint must be exact by definition. The canonical form is
    NULL-safe and unambiguous: each field is COALESCE'd to a chr(1)
    sentinel and fields join on the chr(31) unit separator — concat_ws
    was rejected (it SKIPS nulls, so ('a', NULL) and ('a',) collide,
    and DuckDB's || would instead null the whole row out of the SUM),
    and '|' was rejected as a separator that real payloads contain.
    Map-side partial sums reduce the shuffle to one row per
    (partition, group). This is the anti-entropy primitive for
    validating a migrated or replicated table without moving data: ship
    the per-group fingerprints, not the rows."""
    o = load_table(spark, sf_dir, "orders")
    row_str = canon_row(["o_orderkey", "o_custkey", "o_orderpriority"])
    return (
        o.select(F.col("o_orderstatus").alias("status"), _h60(row_str).alias("h"))
        .groupBy("status")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.col("h").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("content_hash"),
        )
    )


# ---------------------------------------------------------------------------
# Snapshot diff — row-level complement to table_fingerprint
# ---------------------------------------------------------------------------


def snapshot_diff(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Row-level delta between two snapshots of the same-schema table:
    one row per differing key with ``change ∈ {added, removed,
    changed}`` (``added`` = in right only). Identical rows produce NO
    output — on a 100 TB pair the result is proportional to the DRIFT,
    not the table.

    :func:`table_fingerprint` answers "are these snapshots equal?" with
    one hash per group; this answers "WHICH rows differ?" when they are
    not. Shape: one full-outer hash join on the keys; equality of the
    non-key payload compares a NULL-safe canonical concat (same
    chr(31)/chr(1) encoding as the fingerprint via the shared
    :func:`canon_row`, so the two operators agree on what "changed"
    means by construction). The join shuffles each side once;
    no collect, no per-row Python."""
    val_cols = [c for c in left.columns if c not in keys]

    def canon(df: DataFrame, alias: str) -> DataFrame:
        return df.select(
            *[F.col(k).alias(f"{alias}_{k}") for k in keys],
            canon_row(val_cols).alias(f"{alias}_payload"),
        )

    l, r = canon(left, "l"), canon(right, "r")
    cond = None
    for k in keys:
        c = F.col(f"l_{k}").eqNullSafe(F.col(f"r_{k}"))
        cond = c if cond is None else (cond & c)
    j = l.join(r, cond, "full_outer")
    change = (
        F.when(F.col("l_payload").isNull(), F.lit("added"))
        .when(F.col("r_payload").isNull(), F.lit("removed"))
        .when(F.col("l_payload") != F.col("r_payload"), F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"l_{k}"), F.col(f"r_{k}")).alias(k)
                for k in keys
            ],
            "change",
        )
    )
