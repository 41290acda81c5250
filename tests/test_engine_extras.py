"""Tests for round-2 engine additions: requeue purge hygiene, the G7
single-instance lock, the K4 summary report, and the pandas-UDF escape
hatch (G2 custom transforms)."""

from __future__ import annotations

import os

import pytest

from data_ingestion_from_multiple_directories_linux_spark.functions.udfs import (
    column_transform,
    normalize_whitespace,
)
from data_ingestion_from_multiple_directories_linux_spark.ingest.engine import (
    INGESTION_LOG,
    PROCESS_SUMMARY,
    ConcurrentRunError,
    IngestionEngine,
)
from tests.test_ingest_engine import patient, write_json


@pytest.fixture()
def engine(spark, tmp_path):
    return IngestionEngine(spark, str(tmp_path / "wh"), max_files_per_run=None)


@pytest.fixture()
def uploads(tmp_path) -> str:
    d = tmp_path / "uploads"
    d.mkdir()
    return str(d)


def test_requeued_file_purges_prior_rows(engine, uploads):
    """A bulk-requeued file (valid rows already appended on the failed
    first pass) must not duplicate staging rows when re-ingested."""
    fn = "patient_person_0_20250103141949.json"
    write_json(uploads, "FAC001", fn,
               [patient(0), patient(1), patient(2, dob="broken")])
    engine.run(uploads)
    assert engine.store.read("stg_patient_person").count() == 2

    assert engine.requeue_failed() == 1
    write_json(uploads, "FAC001", fn, [patient(i) for i in range(3)])
    engine.run(uploads)
    stg = engine.store.read("stg_patient_person")
    assert stg.count() == 3  # purged the 2 partial rows first
    assert stg.select("id").distinct().count() == 3


def test_single_instance_lock(engine, uploads):
    write_json(uploads, "FAC001", "patient_person_0_20250103141949.json",
               [patient(0)])
    lock = engine.store.path(".run.lock")
    with open(lock, "w") as f:
        f.write("999999")
    with pytest.raises(ConcurrentRunError):
        engine.run(uploads)
    os.remove(lock)
    rep = engine.run(uploads)  # lock released → runs
    assert rep.files_ingested == 1
    assert not os.path.exists(lock)  # released after the run


def test_summary_report_materialization(engine, uploads):
    write_json(uploads, "FAC001", "patient_person_0_20250103141949.json",
               [patient(0), patient(1)])
    write_json(uploads, "FAC001", "patient_person_1_20250103142000.json", [])
    engine.run(uploads)
    out = engine.write_summary_report()
    row = out.collect()[0]
    assert row["total_files"] == 2
    assert row["n_success"] == 1
    assert row["n_failed"] == 1
    assert row["records_ingested"] == 2
    assert row["report_time"] is not None
    # append-only report table: second materialization adds a row
    engine.write_summary_report()
    assert engine.store.read(PROCESS_SUMMARY).count() == 2


def test_pandas_udf_custom_transform(engine, uploads):
    """G2 escape hatch: an Arrow-batched pandas UDF registered in the
    per-table dispatch runs inside the ingest pipeline."""
    engine.transforms["notes"] = [
        column_transform("body", normalize_whitespace)
    ]
    recs = [{"id": 1, "body": "  hello   world \n"},
            {"id": 2, "body": "ok"}]
    write_json(uploads, "FAC001", "notes_0_20250103141949.json", recs)
    rep = engine.run(uploads)
    assert rep.files_ingested == 1
    vals = {r["id"]: r["body"]
            for r in engine.store.read("stg_notes").select("id", "body").collect()}
    assert vals == {1: "hello world", 2: "ok"}


def test_column_transform_tolerates_missing_column(spark):
    df = spark.createDataFrame([(1,)], "id long")
    out = column_transform("nope", normalize_whitespace)(df)
    assert out.columns == ["id"]


def test_jdbc_option_construction():
    """S3 adapter: option construction for partitioned JDBC reads —
    no endpoint exists in the sandbox, so construction is the contract."""
    import pytest

    from data_ingestion_from_multiple_directories_linux_spark.sources.jdbc import (
        build_jdbc_options,
        jdbc_url,
    )

    url = jdbc_url("postgresql", "warehouse.local", 5432, "hms")
    assert url == "jdbc:postgresql://warehouse.local:5432/hms"

    opts = build_jdbc_options(
        url,
        "public.sync_file",
        user="etl",
        password="secret",
        partition_column="id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=64,
    )
    assert opts["driver"] == "org.postgresql.Driver"
    assert opts["dbtable"] == "public.sync_file"
    assert (opts["partitionColumn"], opts["lowerBound"], opts["upperBound"],
            opts["numPartitions"]) == ("id", "0", "1000000", "64")
    assert opts["fetchsize"] == "10000"

    # partial partition spec is an error, not a silent serial read
    with pytest.raises(ValueError):
        build_jdbc_options(url, "t", partition_column="id")
    with pytest.raises(ValueError):
        jdbc_url("nosuchdb", "h", 1, "d")

    # sqlserver URL shape differs
    assert jdbc_url("sqlserver", "h", 1433, "d") == "jdbc:sqlserver://h:1433;databaseName=d"


def test_jdbc_predicate_mode_rejects_mixed_slicing(spark):
    from data_ingestion_from_multiple_directories_linux_spark.sources.jdbc import read_jdbc

    import pytest

    with pytest.raises(ValueError):
        read_jdbc(
            spark,
            "jdbc:postgresql://h:5432/d",
            "t",
            predicates=["a = 1"],
            partition_column="id",
        )


def test_schema_drift_report_detects_all_kinds(spark):
    """Contract check: a clean observed schema reports nothing; drift
    reports missing/extra/type_mismatch per column; lineage columns are
    expected extras; unknown tables raise."""
    import pytest
    from pyspark.sql import types as T

    from data_ingestion_from_multiple_directories_linux_spark.sources.schemas import (
        schema_drift_report,
        schema_for_table,
    )

    target = schema_for_table("patient_person")
    assert schema_drift_report(target, "patient_person") == []
    # add THE ACTUAL lineage columns the engine appends
    # (finalize_lineage): still clean — the expected-extras set must
    # name the real columns (stg_load_time, not a stale stg_created_at;
    # review finding: every engine-written table used to report a false
    # 'extra' for stg_load_time)
    with_lineage = T.StructType(
        list(target.fields)
        + [
            T.StructField("stg_batch_id", T.StringType(), True),
            T.StructField("stg_load_time", T.TimestampType(), True),
            T.StructField("stg_file_name", T.StringType(), True),
            T.StructField("stg_datim_id", T.StringType(), True),
        ]
    )
    assert schema_drift_report(with_lineage, "patient_person") == []
    # drift: drop one target column, add a stranger, flip a type
    fields = [f for f in target.fields if f.name != target.fields[0].name]
    flipped = T.StructType(
        [
            T.StructField(f.name, T.DoubleType(), True)
            if f.name == fields[0].name
            else f
            for f in fields
        ]
        + [T.StructField("surprise_col", T.StringType(), True)]
    )
    findings = schema_drift_report(flipped, "patient_person")
    kinds = {(f["kind"], f["column"]) for f in findings}
    assert ("missing", target.fields[0].name) in kinds
    assert ("extra", "surprise_col") in kinds
    assert any(k == "type_mismatch" for k, _ in kinds)
    with pytest.raises(ValueError):
        schema_drift_report(target, "no_such_table")


def test_schema_drift_report_reconstructs_any_mutation(spark):
    """Property: for ANY observed schema built by dropping / retyping /
    adding columns, the drift report exactly characterizes the
    mutation (findings are a faithful diff, no false positives)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import types as T

    from data_ingestion_from_multiple_directories_linux_spark.sources.schemas import (
        schema_drift_report,
        schema_for_table,
    )

    target = schema_for_table("patient_person")
    names = [f.name for f in target.fields]

    @settings(max_examples=50, deadline=None)
    @given(
        dropped=st.sets(st.sampled_from(names), max_size=3),
        retyped=st.sets(st.sampled_from(names), max_size=3),
        extra=st.sets(
            st.text("abcxyz", min_size=1, max_size=6).filter(
                lambda s: s not in names
            ),
            max_size=2,
        ),
    )
    def check(dropped, retyped, extra):
        retyped = retyped - dropped
        fields = []
        for f in target.fields:
            if f.name in dropped:
                continue
            if f.name in retyped and not isinstance(f.dataType, T.BinaryType):
                fields.append(T.StructField(f.name, T.BinaryType(), True))
            else:
                fields.append(f)
        for name in sorted(extra):
            fields.append(T.StructField(name, T.StringType(), True))
        findings = schema_drift_report(T.StructType(fields), "patient_person")
        got = {(f["kind"], f["column"]) for f in findings}
        want = (
            {("missing", c) for c in dropped}
            | {("type_mismatch", c) for c in retyped}
            | {("extra", c) for c in extra}
        )
        assert got == want, (got, want)

    check()
