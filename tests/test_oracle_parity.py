"""Local twin of the driver's correctness gate: every registered query with
an oracle must match DuckDB exactly (row count + order-insensitive values)
on the small test scale. Exact equality — floats included — because the
driver hash-compares values; any nondeterminism must be fixed in the query,
not tolerated in the test."""

from __future__ import annotations

import decimal
import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

from tests.conftest import SF_SMALL


def _duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if v is pd.NaT:
        return None
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    return v


def canonical_rows(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = [
        tuple(_norm(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    sdf = QUERIES[name](spark, SF_SMALL).toPandas()
    con = _duck_con(SF_SMALL)
    ddf = con.execute(ORACLES[name]).df()
    con.close()
    assert len(sdf) == len(ddf), f"{name}: row count {len(sdf)} != oracle {len(ddf)}"
    assert sorted(sdf.columns) == sorted(ddf.columns), (
        f"{name}: columns {sorted(sdf.columns)} != oracle {sorted(ddf.columns)}"
    )
    srows, drows = canonical_rows(sdf), canonical_rows(ddf)
    mism = [i for i, (a, b) in enumerate(zip(srows, drows)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows; first: "
        f"spark={srows[mism[0]]} oracle={drows[mism[0]]}"
    )


def test_every_query_runs_and_entry_smokes(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    for name, fn in QUERIES.items():
        out = fn(spark, SF_SMALL)
        assert out.columns, f"{name} returned no columns"
