"""Test-table catalog.

The driver-generated TPC-H-ish tables (TESTDATA.md) are the engine's standing
test corpus. ``load_table``/``register_views`` read them as parquet and expose
them as temp views so operators can be written against either the DataFrame
or SQL API.

The reference's analogue is its target-schema introspection of
``information_schema.columns`` (reference file_loader.py:45-58); here the
catalog IS Spark's catalog — ``spark.table(name).schema`` replaces the
round-trip to PostgreSQL.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table. Parquet scan → Catalyst gets pushdown + pruning.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; ``get_spark`` sets
    ``spark.sql.legacy.parquet.nanosAsLong`` session-wide, so it arrives as
    long nanos and is truncated here to microsecond timestamps (identical
    to DuckDB's ns→µs conversion, so the oracle sees the same values).
    Integer ``div`` — double math would lose precision at ~1.7e18 ns.
    """
    if name not in TABLES:
        raise KeyError(f"unknown test table {name!r}; known: {TABLES}")
    if name == "events":
        # get_spark sets this session-wide; guard for foreign sessions
        # (e.g. the correctness driver builds its own SparkSession).
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif ts_type == "timestamp_ntz":
            # Spark 4.1 ignores a RUNTIME nanosAsLong set (builder-time
            # works) and reads TIMESTAMP(NANOS) as µs-truncated NTZ.
            # Rebuild the same LTZ instant DuckDB sees (naive ≙ UTC)
            # without going through the session timezone: µs since the
            # NTZ epoch → timestamp_micros. A plain cast(ntz AS
            # timestamp) would shift by the session tz offset.
            df = df.withColumn(
                "ts",
                F.timestamp_micros(
                    F.expr(
                        "timestampdiff(MICROSECOND,"
                        " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                    )
                ),
            )
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every test table as a temp view; returns name → DataFrame."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
