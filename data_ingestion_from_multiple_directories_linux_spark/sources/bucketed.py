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

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class BucketReport:
    """Evidence a table landed hash-bucketed: the spec plus the
    physical file count (repartition-aligned writes emit exactly
    ``n_buckets`` files)."""

    table: str
    keys: list[str]
    n_buckets: int
    n_files: int


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str | list[str],
    n_buckets: int,
    mode: str = "overwrite",
    path: str | None = None,
) -> BucketReport:
    """Persist ``df`` as a bucketed+sorted catalog table on ``key``.

    The frame is ``repartition(n_buckets, keys)``-ed first: Spark's
    bucket hash and shuffle hash are both Murmur3 mod n, so each write
    task then holds exactly one bucket's rows and emits ONE file per
    bucket — without the alignment every task writes a sliver of every
    bucket (tasks × buckets small files), which at 100 TB turns the
    bucketed table itself into a small-file problem. ``path`` keeps the
    data external to ``spark.sql.warehouse.dir``."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = (
        df.repartition(n_buckets, *[F.col(k) for k in keys])
        .write.mode(mode)
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(name)
    spark = df.sparkSession
    if path is not None:
        root = path
    else:
        # ask the CATALOG for the location instead of deriving
        # <warehouse>/<name>: identifiers are lowercased and
        # db-qualified names nest under <db>.db/, so the naive join
        # walks a nonexistent dir and silently reports n_files=0
        # (review finding)
        loc = next(
            r["data_type"]
            for r in spark.sql(f"DESCRIBE FORMATTED {name}").collect()
            if r["col_name"] == "Location"
        )
        root = loc.removeprefix("file:")
    n_files = sum(
        1
        for _dir, _sub, files in os.walk(root)
        for f in files
        if f.endswith(".parquet")
    )
    return BucketReport(
        table=name, keys=keys, n_buckets=n_buckets, n_files=n_files
    )


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog —
    a plain path read would lose it)."""
    return spark.table(name)


def drop_bucketed(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {name}")
