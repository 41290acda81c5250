"""Weighted host-graph PageRank — crawl-prioritization importance.

A 100 TB crawl pipeline ranks HOSTS (not pages) to budget fetches and
to weight corpus sources; PageRank over the host link graph is the
canonical importance measure. This module runs a fixed-iteration,
integer-exact PageRank as pure DataFrame ops: the edge list is the only
large table, each iteration is one broadcast join (ranks are
host-count-sized — tiny next to edges) plus one aggregation keyed by
destination host, and the oracle unrolls the identical K iterations as
chained CTEs (the quality_gate_training trajectory-replay device).

Graph synthesis (both engines build it identically from `documents`):
host(doc) = doc_id % N_HOSTS; every document emits one outlink per
(multiplier, offset) rule in LINK_RULES — dst_doc = (doc_id·m + o) mod
n_docs — and the host-level edge weight is the number of page links
between the host pair. Self-edges are KEPT: intra-host links dominate
real webgraphs, and they guarantee every host has out-degree > 0, so
there is no dangling-mass case to special-case (the classic PageRank
implementation wart) — mass conservation up to floor truncation is
pytest-pinned instead.

Integer fixed point: ranks live in micros (10^6 = total mass). One
iteration:

    share(edge)  = (rank(src) · w) div out_w(src)      -- exact BIGINT
    inflow(dst)  = Σ shares                            -- exact BIGINT
    rank'(host)  = (85·inflow) div 100                 -- damping 0.85
                 + (15·10^6) div (100·n_hosts)         -- teleport

Every operation is BIGINT multiply/divide on non-negative values, so
Spark's truncating `div` equals DuckDB's flooring `//` and partial
aggregation cannot drift — the driver hash-compares the full
trajectory's endpoint bit-for-bit.

At scale: edges are hash-partitioned by src once and reused across all
K iterations; the rank table broadcasts (hosts ≪ edges); the per-
iteration shuffle is the inflow aggregation keyed by dst — exactly the
Pregel/GraphX communication pattern, expressed declaratively so AQE
handles skewed hubs. K is fixed (no convergence probe), which is what
makes the computation replayable by the oracle and idempotent across
retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

#: host fold: host(doc) = doc_id % N_HOSTS.
N_HOSTS = 24
#: per-document outlink rules: dst_doc = (doc_id * m + o) mod n_docs.
LINK_RULES: tuple[tuple[int, int], ...] = ((7, 1), (13, 2), (31, 3))
#: damping factor 0.85 as an exact integer pair.
DAMP_NUM = 85
DAMP_DEN = 100
#: rank mass scale (micros).
MASS = 1_000_000
#: fixed iteration count — deterministic, oracle-unrollable.
PR_ITERS = 6


def host_edges(docs: DataFrame) -> DataFrame:
    """(src, dst, w, out_w) host-level weighted edges from `docs(doc_id)`.

    The n_docs modulus arrives as a 1-row broadcast (no driver collect);
    link generation is a map-only explode; the only shuffle is the
    (src, dst) weight aggregation."""
    nd = docs.select(F.count("*").cast("long").alias("n_docs"))
    rules = F.array(
        *[
            F.struct(F.lit(m).alias("m"), F.lit(o).alias("o"))
            for m, o in LINK_RULES
        ]
    )
    links = (
        docs.crossJoin(F.broadcast(nd))
        .select(
            (F.col("doc_id") % N_HOSTS).alias("src"),
            F.explode(rules).alias("r"),
            "doc_id",
            "n_docs",
        )
        .select(
            "src",
            (
                ((F.col("doc_id") * F.col("r.m")) + F.col("r.o"))
                % F.col("n_docs")
                % N_HOSTS
            ).alias("dst"),
        )
    )
    edges = links.groupBy("src", "dst").agg(F.count("*").cast("long").alias("w"))
    outw = edges.groupBy("src").agg(F.sum("w").cast("long").alias("out_w"))
    return edges.join(outw, "src")


def pagerank(
    edges_w: DataFrame, iters: int = PR_ITERS, checkpoint: bool = True
) -> DataFrame:
    """(host, rank_micro) after `iters` integer PageRank iterations over
    (src, dst, w, out_w) edges. Ranks broadcast per iteration; edges are
    scanned once per iteration with no re-shuffle of the edge table.

    The edge list is localCheckpoint'ed ONCE before iterating (the
    duplicate_clusters convention): without it, iteration K's lazy plan
    would re-derive the edge aggregation — and behind it the full
    corpus scan — K more times, which is the difference between one
    pass and N passes at 100 TB. Blocks stay live for the query's
    lifetime (they are the working set of the final plan). Callers that
    already hold a checkpointed/materialized edge frame pass
    ``checkpoint=False``."""
    if checkpoint:
        edges_w = edges_w.localCheckpoint(eager=True)
    nodes = edges_w.select(F.col("src").alias("host")).distinct()
    nh = nodes.select(F.count("*").cast("long").alias("n_hosts"))
    ranks = nodes.crossJoin(F.broadcast(nh)).select(
        "host", F.expr(f"{MASS} div n_hosts").cast("long").alias("r")
    )
    for _ in range(iters):
        inflow = (
            edges_w.join(
                F.broadcast(ranks.withColumnRenamed("host", "src")), "src"
            )
            .select(
                F.col("dst").alias("host"),
                F.expr("(r * w) div out_w").cast("long").alias("share"),
            )
            .groupBy("host")
            .agg(F.sum("share").cast("long").alias("inflow"))
        )
        ranks = (
            nodes.join(inflow, "host", "left")
            .crossJoin(F.broadcast(nh))
            .select(
                "host",
                (
                    F.expr(
                        f"({DAMP_NUM} * coalesce(inflow, 0)) div {DAMP_DEN}"
                    )
                    + F.expr(
                        f"({DAMP_DEN - DAMP_NUM} * {MASS})"
                        f" div ({DAMP_DEN} * n_hosts)"
                    )
                )
                .cast("long")
                .alias("r"),
            )
        )
    return ranks.select("host", F.col("r").alias("rank_micro"))


def _links_sql() -> str:
    parts = [
        f"""SELECT (doc_id % {N_HOSTS}) AS src,
                   (((doc_id * {m}) + {o}) % nd.n_docs) % {N_HOSTS} AS dst
            FROM documents, nd"""
        for m, o in LINK_RULES
    ]
    return " UNION ALL ".join(parts)


def _pagerank_ctes() -> str:
    """Shared oracle CTE body up to the final rank table r{PR_ITERS} —
    consumed verbatim by host_pagerank AND crawl_budget_apportionment,
    so the two surfaces cannot disagree about the trajectory."""
    teleport = f"({DAMP_DEN - DAMP_NUM} * {MASS}) // ({DAMP_DEN} * nh.n_hosts)"
    ctes = [
        f"nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)",
        f"links AS ({_links_sql()})",
        "edges AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w"
        " FROM links GROUP BY src, dst)",
        "outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS out_w"
        " FROM edges GROUP BY src)",
        "ew AS (SELECT e.src, e.dst, e.w, o.out_w"
        " FROM edges e JOIN outw o USING (src))",
        "nodes AS (SELECT DISTINCT src AS host FROM edges)",
        "nh AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hosts FROM nodes)",
        f"r0 AS (SELECT host, {MASS} // nh.n_hosts AS r FROM nodes, nh)",
    ]
    for t in range(1, PR_ITERS + 1):
        ctes.append(
            f"""i{t} AS (
                SELECT e.dst AS host,
                       CAST(SUM((r.r * e.w) // e.out_w) AS BIGINT) AS inflow
                FROM ew e JOIN r{t - 1} r ON r.host = e.src
                GROUP BY e.dst
            )"""
        )
        ctes.append(
            f"""r{t} AS (
                SELECT n.host,
                       ({DAMP_NUM} * COALESCE(i.inflow, 0)) // {DAMP_DEN}
                       + {teleport} AS r
                FROM nodes n LEFT JOIN i{t} i USING (host), nh
            )"""
        )
    return ",\n    ".join(ctes)


def _pagerank_oracle_sql() -> str:
    return f"""
    WITH {_pagerank_ctes()},
    instats AS (
        SELECT dst AS host, CAST(COUNT(*) AS BIGINT) AS n_in_hosts,
               CAST(SUM(w) AS BIGINT) AS in_weight
        FROM edges GROUP BY dst
    )
    SELECT r.host, CAST(r.r AS BIGINT) AS rank_micro,
           CAST(COALESCE(i.n_in_hosts, 0) AS BIGINT) AS n_in_hosts,
           CAST(COALESCE(i.in_weight, 0) AS BIGINT) AS in_weight,
           CAST(o.out_w AS BIGINT) AS out_weight
    FROM r{PR_ITERS} r
    LEFT JOIN instats i USING (host)
    JOIN outw o ON o.src = r.host
    """


@query("host_pagerank", oracle=_pagerank_oracle_sql())
def host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the synthesized host link graph: (host, rank_micro
    after PR_ITERS exact integer iterations, inbound-host count, inbound
    link weight, outbound link weight). The oracle unrolls the identical
    trajectory, so a hash match certifies every iteration."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # one checkpoint shared by the rank loop AND the in/out bookkeeping
    # below — the corpus is scanned exactly once for the whole query.
    ew = host_edges(docs).localCheckpoint(eager=True)
    ranks = pagerank(ew, PR_ITERS, checkpoint=False)
    instats = ew.groupBy("dst").agg(
        F.count("*").cast("long").alias("n_in_hosts"),
        F.sum("w").cast("long").alias("in_weight"),
    )
    outw = ew.select("src", "out_w").distinct()
    return (
        ranks.join(
            instats.withColumnRenamed("dst", "host"), "host", "left"
        )
        .join(outw.withColumnRenamed("src", "host"), "host")
        .select(
            "host",
            "rank_micro",
            F.coalesce("n_in_hosts", F.lit(0)).cast("long").alias("n_in_hosts"),
            F.coalesce("in_weight", F.lit(0)).cast("long").alias("in_weight"),
            F.col("out_w").cast("long").alias("out_weight"),
        )
    )


# ---------------------------------------------------------------------------
# Crawl-budget apportionment (largest-remainder / Hamilton method)
# ---------------------------------------------------------------------------

#: fetches to apportion across hosts per crawl cycle.
BUDGET = 1_000_000


def largest_remainder(masses: DataFrame, budget: int = BUDGET) -> DataFrame:
    """(host, mass, base_alloc, extra, alloc) — apportion `budget`
    integer units across ``masses(host, mass)`` proportionally, exactly:
    base = (budget·mass) div total, and the budget − Σbase leftover
    units go to the largest remainders ((budget·mass) mod total,
    host-id tiebreak). Σalloc == budget ALWAYS — the property float
    rounding cannot give. Window state is host-count-sized (the mass
    table is an aggregate, never the corpus), so the single-partition
    sort is bounded — the documented bounded-frame pattern."""
    total = masses.select(F.sum("mass").cast("long").alias("total_mass"))
    q = masses.crossJoin(F.broadcast(total)).select(
        "host",
        "mass",
        F.expr(f"({budget} * mass) div total_mass").cast("long").alias("base"),
        F.expr(f"({budget} * mass) % total_mass").cast("long").alias("rem"),
    )
    bs = q.select(F.sum("base").cast("long").alias("base_sum"))
    rn = F.row_number().over(W.orderBy(F.desc("rem"), F.asc("host")))
    return (
        q.withColumn("rn", rn)
        .crossJoin(F.broadcast(bs))
        .select(
            "host",
            "mass",
            F.col("base").alias("base_alloc"),
            F.when(F.col("rn") <= F.lit(budget) - F.col("base_sum"), 1)
            .otherwise(0)
            .cast("long")
            .alias("extra"),
        )
        .withColumn("alloc", (F.col("base_alloc") + F.col("extra")).cast("long"))
    )


@query(
    "crawl_budget_apportionment",
    oracle=f"""
    WITH {{ctes}},
    total AS (SELECT CAST(SUM(r) AS BIGINT) AS total_mass FROM r{PR_ITERS}),
    quota AS (
        SELECT host, CAST(r AS BIGINT) AS mass,
               ({BUDGET} * r) // t.total_mass AS base,
               ({BUDGET} * r) % t.total_mass AS rem
        FROM r{PR_ITERS}, total t
    ),
    bs AS (SELECT CAST(SUM(base) AS BIGINT) AS base_sum FROM quota),
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY rem DESC, host) AS rn FROM quota
    )
    SELECT host, mass, CAST(base AS BIGINT) AS base_alloc,
           CAST(CASE WHEN rn <= {BUDGET} - bs.base_sum THEN 1 ELSE 0 END
                AS BIGINT) AS extra,
           CAST(base + CASE WHEN rn <= {BUDGET} - bs.base_sum THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM ranked, bs
    """.format(ctes=_pagerank_ctes()),
)
def crawl_budget_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apportion the per-cycle crawl budget across hosts proportional to
    their PageRank mass — importance-weighted fetch scheduling, the step
    that CONSUMES host_pagerank. Largest-remainder apportionment is
    exact integer arithmetic end to end (Σalloc == BUDGET pytest-
    pinned); the oracle replays the full PageRank trajectory (shared
    CTE body) plus the apportionment, so one hash match certifies the
    whole rank→budget dataflow."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    ew = host_edges(docs).localCheckpoint(eager=True)
    # the mass table feeds three consumers in largest_remainder (total,
    # base_sum, the ranked output) — checkpoint the host-count-sized
    # frame so the K-iteration rank chain is not re-derived per consumer
    # (the corpus itself is already bounded to one scan by the edge
    # checkpoint above).
    masses = (
        pagerank(ew, PR_ITERS, checkpoint=False)
        .select("host", F.col("rank_micro").alias("mass"))
        .localCheckpoint(eager=True)
    )
    return largest_remainder(masses, BUDGET)
