"""Stratified sampling with EXACT per-stratum quotas.

A training-data pipeline that subsamples a corpus usually needs the
sample to preserve a stratification (language, source, domain) EXACTLY:
"give me 200 documents whose language mix matches the corpus" — not a
Bernoulli sample whose stratum counts wobble. Float-proportional
rounding cannot guarantee the quota sum; the largest-remainder
apportionment (operators/linkgraph.py, the L147 arithmetic — imported,
third consumer after crawl budgets and mixture allocation) can:
Σ quota == SAMPLE_TOTAL always, each stratum within 1 of its exact
proportional share.

Within a stratum, rows are ranked by md5(doc_id) hex — a deterministic
pseudo-random order both engines compute identically (the
dataset_split_assign device) — so the sample is reproducible and
unbiased with respect to any corpus ordering.

Scale shape: one scan computes stratum counts (stratum-count-sized
aggregate), the quota table broadcasts back, and the per-stratum
ranking window partitions by stratum — never a global sort. A stratum
smaller than its quota contributes all its rows (Σ sampled < budget
then; the apportionment is over counts, so this only happens when the
corpus itself is smaller than the sample).

Relationship to ``stratified_sample_docs`` (L62, operators/profiling.py):
that sampler is RATE-exact — keep ceil(20%) of every stratum, so the
output size floats with the corpus; this one is BUDGET-exact — the
output is a fixed SAMPLE_TOTAL rows and the quotas are what the
largest-remainder law says they must be. A pipeline uses both: rate
sampling for profiling slices, budget sampling when the downstream
consumer (an eval set, an annotation batch, a distillation pool) has a
fixed size.

Reference parity: none (the reference has no sampling surface);
SURVEY §2.12a additive (L165).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from .linkgraph import largest_remainder
from .registry import query

#: documents the stratified sample keeps (exactly, when the corpus has
#: at least this many rows).
SAMPLE_TOTAL = 200


@query(
    "stratified_sample_exact",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, COALESCE(lang, '') AS stratum
        FROM documents WHERE doc_id IS NOT NULL
    ),
    m AS (
        SELECT stratum AS host, CAST(COUNT(*) AS BIGINT) AS mass
        FROM d GROUP BY stratum
    ),
    total AS (SELECT CAST(SUM(mass) AS BIGINT) AS total_mass FROM m),
    quota AS (
        SELECT host, mass, ({SAMPLE_TOTAL} * mass) // t.total_mass AS base,
               ({SAMPLE_TOTAL} * mass) % t.total_mass AS rem
        FROM m, total t
    ),
    bs AS (SELECT CAST(SUM(base) AS BIGINT) AS base_sum FROM quota),
    alloc AS (
        SELECT host AS stratum,
               CAST(base + CASE WHEN rn <= {SAMPLE_TOTAL} - b.base_sum
                                THEN 1 ELSE 0 END AS BIGINT) AS quota
        FROM (SELECT *, row_number() OVER (ORDER BY rem DESC, host) AS rn
              FROM quota), bs b
    ),
    ranked AS (
        SELECT stratum, doc_id,
               row_number() OVER (
                   PARTITION BY stratum
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM d
    )
    SELECT r.stratum, CAST(r.doc_id AS BIGINT) AS doc_id,
           CAST(r.rn AS BIGINT) AS rank_in_stratum,
           a.quota
    FROM ranked r JOIN alloc a ON r.stratum = a.stratum
    WHERE r.rn <= a.quota
    """,
)
def stratified_sample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(stratum, doc_id, rank_in_stratum, quota) — a {SAMPLE_TOTAL}-row
    sample of the documents table whose per-language counts are the
    EXACT largest-remainder apportionment of the sample size over the
    corpus's language counts (Σ quota == {SAMPLE_TOTAL} always; each
    stratum within 1 of proportional). Rows within a stratum are chosen
    by md5-hex order — deterministic, corpus-order-independent. NULL
    langs group under '' (a NULL stratum key orders differently across
    engines); NULL doc_ids are filtered (no deterministic rank)."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id", F.coalesce("lang", F.lit("")).alias("stratum"))
    )
    # the apportionment consumes the count frame three times (total,
    # base-sum, ranking) — pin the stratum-count-sized aggregate once or
    # each internal consumer re-scans the corpus
    counts = (
        d.groupBy("stratum")
        .agg(F.count("*").cast("long").alias("mass"))
        .localCheckpoint(eager=True)
    )
    quota = largest_remainder(
        counts.select(F.col("stratum").alias("host"), "mass"), SAMPLE_TOTAL
    ).select(F.col("host").alias("stratum"), F.col("alloc").alias("quota"))

    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    ranked = d.withColumn(
        "rank_in_stratum",
        F.row_number()
        .over(W.partitionBy("stratum").orderBy(h, F.asc("doc_id")))
        .cast("long"),
    )
    return (
        ranked.join(F.broadcast(quota), "stratum")
        .filter(F.col("rank_in_stratum") <= F.col("quota"))
        .select("stratum", "doc_id", "rank_in_stratum", "quota")
    )
