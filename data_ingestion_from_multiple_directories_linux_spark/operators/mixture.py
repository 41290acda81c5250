"""Temperature-scaled training-mixture allocation (the data-mixing knob).

Multilingual / multi-source training corpora are never consumed at
their natural proportions: sampling p_s ∝ n_s^α with a temperature
α ∈ (0, 1) upweights low-resource sources (α=1 is natural sampling,
α→0 is uniform) — the standard mixing rule of mT5/XLM-R-style
pipelines. This operator computes the α=1/2 mixture over the corpus's
own per-source token counts and then apportions a fixed per-epoch token
budget across sources EXACTLY, with the same largest-remainder integer
arithmetic the crawl scheduler uses (operators/linkgraph.py — imported,
one implementation): Σalloc == budget always, the property float
shares cannot give.

Determinism: mass_s = floor(sqrt(n_tokens_s) · 1000) — sqrt is IEEE
correctly-rounded in both engines, the multiply is one correctly-
rounded op, floor lands on BIGINT (the fixed-shape-projection
convention); everything after is exact integer arithmetic. A source
with zero tokens is excluded before apportionment (it gets no budget,
and the guard keeps total_mass > 0 so the integer division is always
defined — ANSI div-by-zero parity hazard on adversarial corpora).

Scale shape: one groupBy over the corpus (source-count-sized result),
then all apportionment windows run on the tiny per-source table — the
bounded-frame pattern of crawl_budget_apportionment.

Reference parity: the reference has no mixing surface; SURVEY §2.12a
additive (L162).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import tokens
from .linkgraph import largest_remainder
from .registry import query
from .text_analysis import TOK_SQL

#: per-epoch token budget to apportion across sources.
MIX_BUDGET = 1_000_000
#: milli-scale of the α=1/2 mass projection.
MASS_SCALE = 1000


@query(
    "temperature_mixture_alloc",
    oracle=f"""
    WITH per AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len({TOK_SQL.format(c="coalesce(text, '')")}))
                    AS BIGINT) AS n_tokens
        FROM documents WHERE source IS NOT NULL GROUP BY source
    ),
    m AS (
        SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * {MASS_SCALE}.0)
                       AS BIGINT) AS mass
        FROM per WHERE n_tokens > 0
    ),
    total AS (SELECT CAST(SUM(mass) AS BIGINT) AS total_mass FROM m),
    quota AS (
        SELECT source, n_docs, n_tokens, mass,
               ({MIX_BUDGET} * mass) // t.total_mass AS base,
               ({MIX_BUDGET} * mass) % t.total_mass AS rem
        FROM m, total t
    ),
    bs AS (SELECT CAST(SUM(base) AS BIGINT) AS base_sum FROM quota),
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rn
        FROM quota
    )
    SELECT source, n_docs, n_tokens, mass,
           CAST(base AS BIGINT) AS base_alloc,
           CAST(CASE WHEN rn <= {MIX_BUDGET} - bs.base_sum THEN 1 ELSE 0 END
                AS BIGINT) AS extra,
           CAST(base + CASE WHEN rn <= {MIX_BUDGET} - bs.base_sum
                            THEN 1 ELSE 0 END AS BIGINT) AS alloc
    FROM ranked, bs
    """,
)
def temperature_mixture_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_tokens, mass, base_alloc, extra, alloc) — the
    α=1/2 temperature mixture apportioned over MIX_BUDGET tokens.
    Low-resource sources get a SUPER-proportional share (sqrt flattens),
    Σalloc == MIX_BUDGET exactly (pytest-pinned), and the whole
    dataflow — token census, mass projection, apportionment — replays
    bit-for-bit in the oracle."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull()
    )
    per = d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(tokens(F.coalesce(F.col("text"), F.lit("")))))
        .cast("long")
        .alias("n_tokens"),
    )
    m = per.filter(F.col("n_tokens") > 0).select(
        "source",
        "n_docs",
        "n_tokens",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * F.lit(float(MASS_SCALE)))
        .cast("long")
        .alias("mass"),
    )
    alloc = largest_remainder(
        m.select(F.col("source").alias("host"), "mass"), MIX_BUDGET
    ).select(
        F.col("host").alias("source"),
        "base_alloc",
        "extra",
        "alloc",
    )
    return m.join(F.broadcast(alloc), "source").select(
        "source",
        "n_docs",
        "n_tokens",
        "mass",
        "base_alloc",
        "extra",
        "alloc",
    )
