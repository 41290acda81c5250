"""JDBC table source (SURVEY.md §2 S3).

The reference extracts warehouse tables over a live PostgreSQL
connection (staging_records_extraction/automate_table_extraction.py:64-65
``pd.read_sql_query(f"SELECT * FROM {schema}.{table}", engine)`` — a
single-threaded, whole-table pull through one socket). The Spark-native
mapping is ``spark.read.format("jdbc")`` with *partitioned* reads: N
executors each open their own cursor over a key range or predicate slice,
so extraction parallelism scales with the cluster instead of one Python
process.

Exercised end-to-end against embedded Apache Derby (the jars Spark
ships for its Hive metastore): tests/test_jdbc_derby.py round-trips
rows through ``format("jdbc")`` in both slicing modes and asserts the
partition counts. Pointing it at a production warehouse is a config
change (URL + driver jar via ``spark.jars.packages``), not new code;
construction-level tests cover the option/URL/predicate mapping.

At 100 TB: prefer ``partition_column`` on an indexed monotonic key
(primary key, ingest timestamp) — the database executes N range scans.
``predicates`` is the escape hatch for non-numeric slicing (e.g. one
predicate per facility/tenant). ``fetchsize`` keeps the driver-side
cursor streaming instead of buffering whole results (Postgres defaults
to buffering everything without it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: dialect → JDBC driver class (the common warehouse engines)
DRIVERS = {
    "postgresql": "org.postgresql.Driver",
    "mysql": "com.mysql.cj.jdbc.Driver",
    "sqlserver": "com.microsoft.sqlserver.jdbc.SQLServerDriver",
    "oracle": "oracle.jdbc.OracleDriver",
}

DEFAULT_FETCHSIZE = 10_000


def jdbc_url(dialect: str, host: str, port: int, database: str) -> str:
    """``jdbc:postgresql://host:5432/db``-style URL for a known dialect."""
    if dialect not in DRIVERS:
        raise ValueError(f"unknown JDBC dialect {dialect!r} (know {sorted(DRIVERS)})")
    if dialect == "sqlserver":
        return f"jdbc:sqlserver://{host}:{port};databaseName={database}"
    return f"jdbc:{dialect}://{host}:{port}/{database}"


def build_jdbc_options(
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = DEFAULT_FETCHSIZE,
    driver: str | None = None,
) -> dict[str, str]:
    """The option dict a partitioned JDBC read needs — split out from
    :func:`read_jdbc` so construction is unit-testable without an
    endpoint. ``table`` may be a table name or a pushdown subquery
    (``(SELECT ... ) AS t``)."""
    opts: dict[str, str] = {
        "url": url,
        "dbtable": table,
        "fetchsize": str(fetchsize),
    }
    if driver is None:
        dialect = url.split(":", 2)[1] if url.startswith("jdbc:") else ""
        driver = DRIVERS.get(dialect)
    if driver:
        opts["driver"] = driver
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or not num_partitions:
            raise ValueError(
                "partition_column needs lower_bound, upper_bound and num_partitions"
            )
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    predicates: list[str] | None = None,
    **options,
) -> DataFrame:
    """Partitioned JDBC read.

    Two slicing modes (mutually exclusive):

    * ``partition_column``/``lower_bound``/``upper_bound``/
      ``num_partitions`` (via ``options``) — Spark generates N range
      predicates on a numeric/temporal key; each executor reads one.
    * ``predicates`` — explicit WHERE fragments, one partition each
      (``["facility_id = 'FAC001'", ...]``); routed through
      ``DataFrameReader.jdbc`` which maps each predicate to a partition.

    With neither, the read is a single partition — correct but serial,
    exactly the reference's shape; callers should slice anything big.
    """
    if predicates:
        if "partition_column" in options:
            raise ValueError("pass either predicates or partition_column, not both")
        opts = build_jdbc_options(url, table, **options)
        props = {
            k: opts[k] for k in ("user", "password", "driver", "fetchsize") if k in opts
        }
        return spark.read.jdbc(
            url=url, table=table, predicates=list(predicates), properties=props
        )
    opts = build_jdbc_options(url, table, **options)
    return spark.read.format("jdbc").options(**opts).load()
