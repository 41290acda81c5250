"""Query/oracle registry.

Every implemented operator from SURVEY.md §2 registers here as a named query
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) an ANSI-SQL
oracle string DuckDB runs on the same parquet views. Column names are aliased
identically on both sides — the correctness driver sorts columns by name and
hash-compares values.

Determinism rules applied throughout (so the value hash is byte-stable
between Spark and DuckDB):

* Double aggregation is quantized: values are cast to DECIMAL before SUM so
  the result does not depend on floating-point accumulation order, then cast
  back to DOUBLE (identical IEEE value in both engines).
* Integer SUM/COUNT results are cast to BIGINT (DuckDB widens SUM(int) to
  HUGEINT; Spark stays BIGINT).
* Every LIMIT/row_number is preceded by a total order (unique tiebreak key).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def dsum(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent double sum: quantize to DECIMAL, sum, back to DOUBLE.

    Input contract: FINITE doubles inside the DECIMAL(precision,scale)
    domain. The quantization cast fails differently per engine outside
    it (Spark NULLs NaN/±Inf silently but aborts on finite overflow;
    DuckDB aborts on both — nonfinite-float-sweep finding), so
    nonfinite floats must be cleansed to NULL at ingest
    (fn/cleansing.null_nonfinite, the float analogue of the
    NULL-on-bad-date rule); tests/test_oracle_parity.py proves the
    sanitized corpus restores exact parity for every dsum consumer."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def dsum_sql(expr: str, scale: int = 2, precision: int = 18) -> str:
    """DuckDB twin of :func:`dsum` (same finite-input contract)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"
