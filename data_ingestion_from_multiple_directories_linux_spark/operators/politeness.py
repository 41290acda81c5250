"""Politeness dispatch: per-tick per-host fetch budgets with banked carry.

The crawl-frontier maintainer (streaming/frontier.py, SURVEY.md §2.12a
L160) schedules fetches a tick at a time: the tick's budget is
apportioned across hosts proportional to host mass (the exact
largest-remainder arithmetic of crawl_budget_apportionment, L147), a
host may additionally spend allowance it banked in earlier ticks, and
the oldest pending URLs per host dispatch first. This module holds that
per-tick arithmetic as a BATCH function — :func:`politeness_tick` — so
the streaming maintainer and the oracle-checked batch twin
(:func:`frontier_dispatch_tick`) run literally the same code, the
``click_attribution_batch`` precedent for giving a streaming lifecycle
a driver-checked correctness row.

Dispatch rules (each engine-portable — integer arithmetic only):

* **allowance** = this tick's largest-remainder ``alloc`` + banked
  ``carry`` from the newest strictly-older tick (full-outer join: a
  host may have carry but no mass row, or vice versa);
* **unknown hosts** — hosts with pending URLs but absent from BOTH the
  mass table and the carry state — get ``unknown_host_allowance``
  (default 1) per tick instead of silently starving forever: the mass
  table is pinned when a crawl starts, so hosts discovered mid-crawl
  would otherwise never drain (they earn no carry either — the floor
  allowance is their whole budget until the mass table is retrained).
  The AGGREGATE unknown-host spend is capped at ``unknown_host_cap``
  hosts per tick (round-11 verdict: a crawl discovering 10k new hosts
  in one tick must not dispatch 10k fetches over the tick budget) —
  the served subset rotates deterministically by md5(host ‖ ':' ‖ tick)
  so a capped backlog drains fairly across ticks instead of starving
  lexicographically-late hosts; ``unknown_host_cap=None`` restores the
  uncapped floor;
* **dispatch** the per-host oldest ``allow`` pending rows
  (deterministic total order supplied by the caller);
* **carry** = min(allow − dispatched, max(alloc, 1) × cap_ticks).
  The ``max(alloc, 1)`` floor keeps the bank meaningful for low-mass
  hosts: a host whose apportionment is 0 on a tick (small mass, no
  remainder unit) still banks up to ``cap_ticks`` units rather than
  having its entire banked allowance zeroed by a 0×cap cap.

Reference parity: none (the reference has no crawl surface); additive
§2.12a (L164). Scale: every frame here is host-count- or
dispatch-sized — the mass table is an aggregate, the carry table holds
one row per (tick, host), and the per-host ranking window runs over
that host's pending backlog only, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from .linkgraph import largest_remainder
from .registry import query

#: per-tick allowance for hosts absent from the mass/carry state (see
#: module docstring — prevents mid-crawl-discovered hosts starving).
UNKNOWN_HOST_ALLOWANCE = 1
#: max unknown hosts served per tick — bounds the aggregate over-budget
#: spend at cap × allowance; the served subset rotates by
#: md5(host:tick). None = uncapped.
UNKNOWN_HOST_CAP = 16
#: unused allowance a host may bank, in multiples of max(alloc, 1).
CARRY_CAP_TICKS = 2
#: batch-twin knobs: fetches per tick, host-bucket modulus, how many
#: buckets carry mass (buckets 8,9 exercise the unknown-host path), and
#: a deliberately tight unknown cap so the oracle replays the rotation.
DISPATCH_BUDGET = 40
HOST_MOD = 10
KNOWN_HOSTS = 8
UNKNOWN_TWIN_CAP = 1


def politeness_tick(
    pending: DataFrame,
    alloc: DataFrame,
    carry_prev: DataFrame,
    order_cols: list[str],
    carry_cap_ticks: int = CARRY_CAP_TICKS,
    unknown_host_allowance: int = UNKNOWN_HOST_ALLOWANCE,
    unknown_host_cap: int | None = UNKNOWN_HOST_CAP,
    tick: int = 0,
    materialize=None,
) -> tuple[DataFrame, DataFrame]:
    """One politeness tick over ``pending(host, *payload)``.

    ``alloc(host, alloc)`` is the tick's apportionment,
    ``carry_prev(host, carry)`` the banked allowance from the newest
    strictly-older tick. Returns ``(dispatched, carry)``: the dispatched
    subset of ``pending`` (exactly the caller's columns, per-host
    oldest-first by ``order_cols`` — internal working columns use the
    reserved ``__pt_`` prefix, so any other payload name is safe) and
    the new per-host carry state for every host the allowance table
    knows (unknown hosts never bank — their floor allowance is per-tick
    only, served to at most ``unknown_host_cap`` hosts rotated by
    md5(host:``tick``); pass the tick/batch id so the rotation
    advances).

    ``materialize`` (e.g. ``lambda df: df.localCheckpoint(eager=True)``)
    is applied to the dispatched frame BEFORE the carry derivation
    consumes it: the carry needs per-host dispatch counts, so an
    unmaterialized dispatch would be computed twice — and a caller whose
    dispatch plan reads mutable state (the streaming maintainer's
    dispatch-log table, which the same tick then overwrites) MUST pin it
    here. Both frames are host/dispatch-sized, never corpus-sized (the
    one global rotation window runs over the DISTINCT unknown-host
    frame — host-count rows, the documented bounded-frame allowance)."""
    allowance = (
        alloc.join(carry_prev, "host", "full_outer")
        .select(
            "host",
            F.coalesce("alloc", F.lit(0)).cast("long").alias("__pt_alloc"),
            F.coalesce("carry", F.lit(0)).cast("long").alias("__pt_carry_in"),
        )
        .withColumn("__pt_allow", F.col("__pt_alloc") + F.col("__pt_carry_in"))
    )
    # unknown hosts: pending but absent from the mass/carry universe —
    # the floor allowance, capped in aggregate and rotated across ticks
    unknown = (
        pending.select("host")
        .distinct()
        .join(allowance.select("host"), "host", "left_anti")
    )
    if unknown_host_cap is not None:
        urn = F.row_number().over(
            W.orderBy(
                F.md5(
                    F.concat(
                        F.col("host"), F.lit(f":{int(tick)}")
                    ).cast("binary")
                ),
                "host",
            )
        )
        unknown = (
            unknown.withColumn("__pt_urn", urn)
            .filter(F.col("__pt_urn") <= unknown_host_cap)
            .drop("__pt_urn")
        )
    dispatch_allow = allowance.select("host", "__pt_allow").unionByName(
        unknown.select(
            "host",
            F.lit(unknown_host_allowance).cast("long").alias("__pt_allow"),
        )
    )
    ranked = pending.withColumn(
        "__pt_rn",
        F.row_number().over(W.partitionBy("host").orderBy(*order_cols)),
    )
    dispatched = (
        ranked.join(F.broadcast(dispatch_allow), "host", "left")
        .filter(F.col("__pt_rn") <= F.coalesce("__pt_allow", F.lit(0)))
        .select(*pending.columns)
    )
    if materialize is not None:
        dispatched = materialize(dispatched)
    n_disp = dispatched.groupBy("host").agg(
        F.count("*").cast("long").alias("__pt_n_disp")
    )
    carry = allowance.join(n_disp, "host", "left").select(
        "host",
        F.least(
            F.col("__pt_allow") - F.coalesce("__pt_n_disp", F.lit(0)),
            F.greatest(F.col("__pt_alloc"), F.lit(1))
            * F.lit(carry_cap_ticks),
        )
        .cast("long")
        .alias("carry"),
    )
    return dispatched, carry


def _host_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents as a synthetic frontier: host = 'h' || (doc_id %
    HOST_MOD), discovery order = doc_id. NULL doc_ids are filtered —
    they cannot carry a deterministic per-host rank (NULL ordering
    diverges between engines)."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull())
        .select(
            "doc_id",
            F.concat(
                F.lit("h"), (F.col("doc_id") % HOST_MOD).cast("string")
            ).alias("host"),
            "n_chars",
        )
    )


@query(
    "frontier_dispatch_tick",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, 'h' || CAST(doc_id % {HOST_MOD} AS VARCHAR) AS host,
               n_chars
        FROM documents WHERE doc_id IS NOT NULL
    ),
    m AS (
        SELECT host, CAST(SUM(n_chars) AS BIGINT) AS mass
        FROM d WHERE doc_id % {HOST_MOD} < {KNOWN_HOSTS}
        GROUP BY host HAVING CAST(SUM(n_chars) AS BIGINT) > 0
    ),
    total AS (SELECT CAST(SUM(mass) AS BIGINT) AS total_mass FROM m),
    quota AS (
        SELECT host, ({DISPATCH_BUDGET} * mass) // t.total_mass AS base,
               ({DISPATCH_BUDGET} * mass) % t.total_mass AS rem
        FROM m, total t
    ),
    bs AS (SELECT CAST(SUM(base) AS BIGINT) AS base_sum FROM quota),
    alloc AS (
        SELECT host,
               CAST(base + CASE WHEN rn <= {DISPATCH_BUDGET} - b.base_sum
                                THEN 1 ELSE 0 END AS BIGINT) AS alloc
        FROM (SELECT *, row_number() OVER (ORDER BY rem DESC, host) AS rn
              FROM quota), bs b
    ),
    p0 AS (SELECT host, doc_id FROM d WHERE doc_id % 2 = 0),
    r0 AS (SELECT host, doc_id,
                  row_number() OVER (PARTITION BY host ORDER BY doc_id) AS rn
           FROM p0),
    aw0 AS (SELECT host, alloc, alloc AS allow FROM alloc),
    unk0 AS (
        SELECT host FROM (
            SELECT host,
                   row_number() OVER (ORDER BY md5(host || ':0'), host)
                       AS urn
            FROM (SELECT DISTINCT host FROM p0
                  WHERE host NOT IN (SELECT host FROM aw0)) u0)
        WHERE urn <= {UNKNOWN_TWIN_CAP}
    ),
    disp0 AS (
        SELECT r0.host, r0.doc_id
        FROM r0 LEFT JOIN aw0 ON r0.host = aw0.host
        WHERE r0.rn <= COALESCE(aw0.allow,
            CASE WHEN r0.host IN (SELECT host FROM unk0)
                 THEN {UNKNOWN_HOST_ALLOWANCE} ELSE 0 END)
    ),
    n0 AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS n_disp
           FROM disp0 GROUP BY host),
    carry0 AS (
        SELECT a.host,
               CAST(LEAST(a.allow - COALESCE(n.n_disp, 0),
                          GREATEST(a.alloc, 1) * {CARRY_CAP_TICKS})
                    AS BIGINT) AS carry
        FROM aw0 a LEFT JOIN n0 n ON a.host = n.host
    ),
    p1 AS (
        SELECT host, doc_id, 0 AS disc FROM p0
        WHERE doc_id NOT IN (SELECT doc_id FROM disp0)
        UNION ALL
        SELECT host, doc_id, 1 AS disc FROM d WHERE doc_id % 2 = 1
    ),
    r1 AS (SELECT host, doc_id,
                  row_number() OVER (PARTITION BY host
                                     ORDER BY disc, doc_id) AS rn
           FROM p1),
    aw1 AS (
        SELECT COALESCE(a.host, c.host) AS host,
               CAST(COALESCE(a.alloc, 0) AS BIGINT) AS alloc,
               CAST(COALESCE(a.alloc, 0) + COALESCE(c.carry, 0)
                    AS BIGINT) AS allow
        FROM alloc a FULL OUTER JOIN carry0 c ON a.host = c.host
    ),
    unk1 AS (
        SELECT host FROM (
            SELECT host,
                   row_number() OVER (ORDER BY md5(host || ':1'), host)
                       AS urn
            FROM (SELECT DISTINCT host FROM p1
                  WHERE host NOT IN (SELECT host FROM aw1)) u1)
        WHERE urn <= {UNKNOWN_TWIN_CAP}
    ),
    disp1 AS (
        SELECT r1.host, r1.doc_id
        FROM r1 LEFT JOIN aw1 ON r1.host = aw1.host
        WHERE r1.rn <= COALESCE(aw1.allow,
            CASE WHEN r1.host IN (SELECT host FROM unk1)
                 THEN {UNKNOWN_HOST_ALLOWANCE} ELSE 0 END)
    ),
    n1 AS (SELECT host, CAST(COUNT(*) AS BIGINT) AS n_disp
           FROM disp1 GROUP BY host),
    carry1 AS (
        SELECT a.host,
               CAST(LEAST(a.allow - COALESCE(n.n_disp, 0),
                          GREATEST(a.alloc, 1) * {CARRY_CAP_TICKS})
                    AS BIGINT) AS carry
        FROM aw1 a LEFT JOIN n1 n ON a.host = n.host
    )
    SELECT 'dispatch' AS kind, CAST(0 AS BIGINT) AS tick, host,
           CAST(doc_id AS BIGINT) AS val
    FROM disp0
    UNION ALL
    SELECT 'dispatch' AS kind, CAST(1 AS BIGINT) AS tick, host,
           CAST(doc_id AS BIGINT) AS val
    FROM disp1
    UNION ALL
    SELECT 'carry' AS kind, CAST(0 AS BIGINT) AS tick, host, carry AS val
    FROM carry0
    UNION ALL
    SELECT 'carry' AS kind, CAST(1 AS BIGINT) AS tick, host, carry AS val
    FROM carry1
    """,
)
def frontier_dispatch_tick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(kind, tick, host, val) — two politeness-dispatch ticks over a
    synthetic frontier derived from the documents table, run through
    the SAME :func:`politeness_tick` the streaming crawl frontier
    (streaming/frontier.py L160) executes per micro-batch.

    Setup: every document is a pending URL on host ``'h' || (doc_id %
    {HOST_MOD})``; hosts 0..{KNOWN_HOSTS}-1 carry mass (Σ n_chars — the
    stand-in for the pinned host_pagerank mass table), buckets 8,9 are
    mid-crawl-discovered hosts absent from the mass table and drain on
    the unknown-host floor allowance — deliberately capped at
    UNKNOWN_TWIN_CAP=1 host per tick here, so the oracle replays the
    aggregate-spend cap AND its md5(host:tick) rotation (a different
    unknown host may be served each tick). Tick 0 sees the even
    doc_ids, tick 1 the backlog plus the odd ones — so the oracle
    replays, end to end: the largest-remainder apportionment,
    oldest-pending-first dispatch, the banked-carry spend at tick 1,
    the carry cap's max(alloc, 1) floor, and the capped/rotated
    unknown-host path. ``kind`` distinguishes dispatched URLs (val =
    doc_id) from per-host carry state (val = banked allowance), so
    both outputs hash-check."""
    d = _host_docs(spark, sf_dir)
    masses = (
        d.filter(F.col("doc_id") % HOST_MOD < KNOWN_HOSTS)
        .groupBy("host")
        .agg(F.sum("n_chars").cast("long").alias("mass"))
        .filter(F.col("mass") > 0)
    )
    # host-count-sized multi-consumer frames (alloc feeds both ticks'
    # allowances; tick-0 outputs feed tick 1 AND the result union) are
    # pinned once — the cross-tick state a real crawler persists anyway.
    # Round-13 audit: a lazy persist() variant was measured (this batch
    # twin reads only immutable parquet, so eager pinning is not needed
    # for mutable-state isolation) and REJECTED — without the per-tick
    # lineage truncation the final plan carries both ticks' window/join
    # chains and runs 1.7× slower (2.5 s → 4.3 s warm, profile in
    # OPTIMIZATION_r13.md). The eager checkpoint chain IS the fast form.
    ckpt = lambda df: df.localCheckpoint(eager=True)  # noqa: E731
    alloc = ckpt(
        largest_remainder(masses, DISPATCH_BUDGET).select("host", "alloc")
    )

    p0 = d.filter(F.col("doc_id") % 2 == 0).select("host", "doc_id")
    no_carry = spark.createDataFrame([], "host string, carry bigint")
    disp0, carry0 = politeness_tick(
        p0,
        alloc,
        no_carry,
        ["doc_id"],
        unknown_host_cap=UNKNOWN_TWIN_CAP,
        tick=0,
        materialize=ckpt,
    )
    carry0 = ckpt(carry0)

    # tick-1 backlog ranks BEFORE the newly discovered odd ids — the
    # streaming maintainer's (discovery tick, doc_id) dispatch order
    p1 = (
        p0.join(disp0.select("doc_id"), "doc_id", "left_anti")
        .withColumn("disc", F.lit(0))
        .unionByName(
            d.filter(F.col("doc_id") % 2 == 1)
            .select("host", "doc_id")
            .withColumn("disc", F.lit(1))
        )
    )
    disp1, carry1 = politeness_tick(
        p1,
        alloc,
        carry0,
        ["disc", "doc_id"],
        unknown_host_cap=UNKNOWN_TWIN_CAP,
        tick=1,
        materialize=ckpt,
    )

    def rows(df: DataFrame, kind: str, tick: int, val) -> DataFrame:
        return df.select(
            F.lit(kind).alias("kind"),
            F.lit(tick).cast("long").alias("tick"),
            "host",
            F.col(val).cast("long").alias("val"),
        )

    return (
        rows(disp0, "dispatch", 0, "doc_id")
        .unionByName(rows(disp1, "dispatch", 1, "doc_id"))
        .unionByName(rows(carry0, "carry", 0, "carry"))
        .unionByName(rows(carry1, "carry", 1, "carry"))
    )
