"""Warehouse-modeling operators: SCD2 interval build + cohort retention
(SURVEY.md §2.12a L57/L58).

The reference pipeline lands mutable snapshots and overwrites state in
place (reference file_loader.py's staged-table update path); a warehouse
consumer usually wants the *history* instead. These two operators are the
standard history shapes:

* **SCD2 dimension build** — turn an event stream of state observations
  into slowly-changing-dimension type-2 validity intervals
  [effective_from, effective_to) per key, collapsing consecutive
  duplicates so an interval spans the whole run of an unchanged state.
* **Cohort retention** — the canonical product-analytics matrix: users
  bucketed by first-seen week × activity offset week.

Both are pure window/aggregate dataflows partitioned by user_id — the
one shuffle key the whole module needs, so Spark reuses a single
Exchange across the chained windows.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

__all__ = ["scd2_user_state_intervals", "cohort_retention", "merge_upsert", "MergeReport", "src_col"]


@query(
    "scd2_user_state_intervals",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_state
        FROM events WHERE ts IS NOT NULL
    ),
    changes AS (
        SELECT user_id, ts, event_id, event_type
        FROM ordered
        WHERE prev_state IS NULL OR prev_state <> event_type
    )
    SELECT user_id,
           event_type AS state,
           ts AS effective_from,
           lead(ts) OVER w AS effective_to,
           CAST(row_number() OVER w AS BIGINT) AS version,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def scd2_user_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 type-2 dimension build from the events stream: per-user
    validity intervals of the observed state (event_type), consecutive
    duplicates collapsed.

    Two chained windows over the SAME (user_id) partitioning — lag to
    detect state changes, then lead/row_number over the change rows for
    the interval close and version number — so the physical plan pays
    ONE hash exchange on user_id and sorts locally twice. The open
    interval (effective_to IS NULL, is_current) is the live dimension
    row. Scale: per-user history fits a partition by construction
    (users are the partition key); no global order anywhere.
    (ts, event_id) is the deterministic tiebreak for same-timestamp
    events. NULL-ts events are excluded on both sides — no time, no
    interval, and the engines disagree where NULL sorts
    (adversarial-corpus finding)."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    ).select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.withColumn("prev_state", F.lag("event_type").over(w))
        .filter(
            F.col("prev_state").isNull()
            | (F.col("prev_state") != F.col("event_type"))
        )
        .drop("prev_state")
    )
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("effective_from"),
        F.lead("ts").over(w).alias("effective_to"),
        F.row_number().over(w).cast("long").alias("version"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


#: fixed epoch for week bucketing — integer day arithmetic from a pinned
#: date is identical in both engines (calendar week truncation is not:
#: ISO-vs-locale week starts differ across engine settings)
COHORT_EPOCH = "2024-01-01"


@query(
    "cohort_retention",
    oracle=f"""
    WITH firsts AS (
        SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
    )
    SELECT
        datediff('day', DATE '{COHORT_EPOCH}', CAST(f.first_ts AS DATE)) // 7
            AS cohort_week,
        datediff('day', CAST(f.first_ts AS DATE), CAST(e.ts AS DATE)) // 7
            AS week_offset,
        CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
        CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events e
    JOIN firsts f ON e.user_id = f.user_id
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen week
    (cohort) × how many weeks after their first event they were active.

    Two aggregations over the same user_id key: MIN(ts) per user, then
    the events⋈firsts join — co-partitioned on user_id, so at scale the
    join reuses the aggregation's hash partitioning instead of adding a
    shuffle (locally the tiny firsts side broadcasts). Week buckets are
    integer day-diffs DIV 7 from a pinned epoch, not calendar
    date_trunc — truncation week-start conventions differ between
    engines, integer arithmetic doesn't. COUNT(DISTINCT user_id) per
    (cohort, offset) cell is Spark's two-phase distinct aggregate —
    partial distinct map-side, exact, no sketch."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = e.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    joined = e.join(firsts, "user_id")
    return (
        joined.select(
            F.expr(
                f"datediff(CAST(first_ts AS DATE), DATE '{COHORT_EPOCH}') DIV 7"
            ).alias("cohort_week"),
            F.expr(
                "datediff(CAST(ts AS DATE), CAST(first_ts AS DATE)) DIV 7"
            ).alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.count("*").cast("long").alias("n_events"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# MERGE INTO (upsert) — the warehouse mutation primitive
# ---------------------------------------------------------------------------


@dataclass
class MergeReport:
    """Row-level outcome counts of one merge, computed in the SAME pass
    that builds the result (no second scan)."""

    inserted: int = 0
    updated: int = 0
    deleted: int = 0
    unchanged: int = 0


def src_col(name: str) -> F.Column:
    """Reference a SOURCE column inside ``merge_upsert``'s
    ``delete_condition`` (source columns are prefixed in the joined
    frame to avoid capture by same-named target columns)."""
    return F.col(f"_sv_{name}")


def merge_upsert(
    store,
    target: str,
    source: DataFrame,
    keys: list[str],
    update_cols: list[str] | None = None,
    delete_condition: F.Column | None = None,
    carry_cols: list[str] | None = None,
) -> MergeReport:
    """ANSI ``MERGE INTO`` semantics over a TableStore table:

    * matched + ``delete_condition`` (a Column over :func:`src_col`
      source references) → row removed;
    * matched otherwise → ``update_cols`` take the source values (all
      non-key source columns when None);
    * source-only → inserted;
    * target-only → kept as-is.

    ``carry_cols`` exposes extra source columns to ``delete_condition``
    (via :func:`src_col`) WITHOUT writing them to the target — e.g. a
    CDC ``op`` flag that decides deletion but is not table data.

    ≙ the reference's UPDATE-then-INSERT staging reconciliation
    (reference file_loader.py's re-upload path: purge matching rows,
    append replacements) generalized to one declarative operator.

    Spark-first shape: ONE full-outer hash join on the key columns —
    never a per-row lookup loop — with each output column a
    ``CASE WHEN matched`` coalesce, so the whole merge is a single
    shuffle of each side plus a map-side projection; the
    inserted/updated/deleted tally aggregates the same joined frame
    (Spark shares the join across both actions via the persisted
    frame). The rewrite lands through the store's atomic
    write-temp-swap (M7), so readers see pre- or post-merge, never a
    torn mix. At warehouse scale the same plan runs against a bucketed
    target (:func:`..sources.bucketed.write_bucketed`) with the join exchange
    pre-paid at write time."""
    # explicit [] means "update nothing" (insert/delete-only merge) —
    # a falsy-or fallback would silently write ALL non-key source
    # columns, e.g. CDC bookkeeping op/seq, into the target
    upd = (
        update_cols
        if update_cols is not None
        else [c for c in source.columns if c not in keys]
    )
    carry = [c for c in (carry_cols or []) if c not in upd]
    # ANSI MERGE raises when several source rows match one target row
    # (SQLSTATE 21000); silently duplicating the dimension row is worse
    # than the probe's one extra aggregate over the (small) source side
    dup = (
        source.groupBy(*keys)
        .agg(F.count("*").alias("__mu_n"))
        .filter(F.col("__mu_n") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError(
            "merge_upsert: source has multiple rows per key — ANSI MERGE "
            "semantics forbid it (dedupe first, e.g. last-writer-wins by "
            "a sequence column as the CDC apply does)"
        )
    if store.exists(target):
        tgt = store.read(target)
    else:
        # bootstrap: a MERGE into a not-yet-created table is pure
        # inserts (minus condition-true deletes), exactly as if the
        # target existed empty — the first CDC batch of a fresh
        # pipeline must create the table, not crash the stream
        tgt = source.select(*keys, *upd).filter(F.lit(False))
    src = source.select(
        *[F.col(k).alias(f"_sk_{k}") for k in keys],
        *[F.col(c).alias(f"_sv_{c}") for c in upd + carry],
        F.lit(True).alias("_src"),
    )
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"_sk_{k}"))
        cond = c if cond is None else (cond & c)
    joined = tgt.withColumn("_tgt", F.lit(True)).join(src, cond, "full_outer")
    matched = F.col("_tgt").isNotNull() & F.col("_src").isNotNull()
    # a condition-true source row never lands: matched → the target row
    # is removed; source-only (e.g. a CDC delete for an absent key) → a
    # no-op, NOT an insert. NULL-safe: target-only rows have NULL source
    # columns, so the condition coalesces to false for them.
    drop = (
        (F.col("_src").isNotNull() & F.coalesce(delete_condition, F.lit(False)))
        if delete_condition is not None
        else F.lit(False)
    )
    delete = matched & drop
    out_cols = []
    for c in tgt.columns:
        if c == "_tgt":
            continue
        if c in keys:
            out_cols.append(F.coalesce(F.col(c), F.col(f"_sk_{c}")).alias(c))
        elif c in upd:
            out_cols.append(
                F.when(F.col("_src").isNotNull(), F.col(f"_sv_{c}"))
                .otherwise(F.col(c))
                .alias(c)
            )
        else:
            out_cols.append(F.col(c))
    # one aggregate over the SAME joined frame for the report
    tally = joined.persist()
    try:
        row = tally.agg(
            F.sum(
                (F.col("_tgt").isNull() & F.col("_src").isNotNull() & ~drop)
                .cast("long")
            ).alias("ins"),
            F.sum((matched & ~delete).cast("long")).alias("upd"),
            F.sum(delete.cast("long")).alias("del"),
            F.sum(
                (F.col("_tgt").isNotNull() & F.col("_src").isNull()).cast(
                    "long"
                )
            ).alias("keep"),
        ).collect()[0]
        store.overwrite(target, tally.filter(~drop).select(*out_cols))
    finally:
        tally.unpersist()
    return MergeReport(
        inserted=int(row["ins"] or 0),
        updated=int(row["upd"] or 0),
        deleted=int(row["del"] or 0),
        unchanged=int(row["keep"] or 0),
    )
