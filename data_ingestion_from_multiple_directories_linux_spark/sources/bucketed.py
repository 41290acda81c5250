"""Bucketed catalog tables — shuffle-free co-located joins.

The TableStore's path-based parquet dirs cover the mutable ingestion
state; for big fact-to-fact equi-joins repeated across jobs, the engine
supports Spark's bucketed tables: ``bucketBy(N, key) + sortBy(key) +
saveAsTable`` writes each table pre-hash-partitioned into N buckets, and
a join of two tables bucketed the same way on the join key needs NO
exchange — the single biggest shuffle eliminator for recurring joins.

At 100 TB: pick N so a bucket of the bigger table fits an executor core
(N ≈ table_size / 128 MB, rounded to a power of two shared by both
sides); both sides must use the same N and key. On a real cluster the
same calls target the Hive/Glue metastore — locally they use Spark's
in-session catalog + ``spark.sql.warehouse.dir``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str | list[str],
    n_buckets: int,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed+sorted catalog table on ``key``."""
    keys = [key] if isinstance(key, str) else list(key)
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
        .saveAsTable(name)
    )


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog —
    a plain path read would lose it)."""
    return spark.table(name)


def drop_bucketed(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {name}")
