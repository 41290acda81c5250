"""Custom Python DataSource (upload_json) — registration, per-file
partitioning, lineage, filter pushdown pruning, malformed-file rows."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from data_ingestion_from_multiple_directories_linux_spark.sources.py_datasource import (
    UploadDataSource,
)
from tests.test_ingest_engine import write_json


@pytest.fixture(scope="module", autouse=True)
def register(spark):
    spark.dataSource.register(UploadDataSource)
    # a reader implementing pushFilters() requires the opt-in conf
    prev = spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    yield
    spark.conf.set("spark.sql.python.filterPushdown.enabled", prev)


def _tree(tmp_path):
    root = str(tmp_path / "uploads")
    os.makedirs(root, exist_ok=True)
    write_json(root, "FAC001", "patient_person_0_20250103141949.json",
               [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}])
    write_json(root, "FAC001", "visits_0_20250103141950.json",
               [{"id": 9}])
    write_json(root, "FAC002", "patient_person_0_20250104000000.json",
               [{"id": 3, "v": "c"}])
    return root


def test_reads_tree_with_lineage(spark, tmp_path):
    root = _tree(tmp_path)
    df = spark.read.format("upload_json").option("path", root).load()
    rows = df.collect()
    assert len(rows) == 4
    by_fac = {(r["facility_id"], r["table_name"]) for r in rows}
    assert by_fac == {
        ("FAC001", "patient_person"),
        ("FAC001", "visits"),
        ("FAC002", "patient_person"),
    }
    rec = json.loads(
        [r for r in rows if r["facility_id"] == "FAC002"][0]["record"]
    )
    assert rec == {"id": 3, "v": "c"}


def test_one_partition_per_file(spark, tmp_path):
    root = _tree(tmp_path)
    df = spark.read.format("upload_json").option("path", root).load()
    assert df.rdd.getNumPartitions() == 3


def test_filter_pushdown_prunes_files(spark, tmp_path):
    """An equality filter on a lineage column reaches pushFilters and
    prunes the FILE list: the scan plans one task per surviving file,
    not per file in the tree."""
    root = _tree(tmp_path)
    df = (
        spark.read.format("upload_json").option("path", root).load()
        .filter(F.col("facility_id") == "FAC002")
    )
    assert df.count() == 1
    # 1 file survives pruning → 1 scan partition (3 without pushdown)
    assert df.rdd.getNumPartitions() == 1


def test_filter_pushdown_conjunction_intersects(spark, tmp_path):
    """Review finding, pinned: the pushed filter list is an AND
    conjunction, so IN('FAC001','FAC002') AND ='FAC002' on the same
    column must prune to the INTERSECTION — a union would return
    facility-FAC001 rows Spark never re-filters (accepted filters are
    not re-applied)."""
    root = _tree(tmp_path)
    df = (
        spark.read.format("upload_json").option("path", root).load()
        .filter(
            F.col("facility_id").isin("FAC001", "FAC002")
            & (F.col("facility_id") == "FAC002")
        )
    )
    rows = df.collect()
    assert {r["facility_id"] for r in rows} == {"FAC002"}
    assert len(rows) == 1


def test_writer_skips_null_record_rows_round_trip(spark, tmp_path):
    """Review finding, pinned: reader output for a malformed source file
    (record=NULL quarantine row) must round-trip through the writer as
    a SKIP, not a TypeError that kills the job."""
    root = str(tmp_path / "nulltrip")
    write_json(root, "FAC001", "patient_person_0_20250101000000.json",
               [{"id": 1}])
    write_json(root, "FAC002", "patient_person_0_20250101000001.json",
               "{not json")
    back = spark.read.format("upload_json").option("path", root).load()
    assert back.filter(F.col("record").isNull()).count() == 1
    out = str(tmp_path / "nulltrip_out")
    back.coalesce(1).write.format("upload_json").mode("append").option(
        "path", out
    ).save()
    rt = spark.read.format("upload_json").option("path", out).load().collect()
    # the well-formed record survives; the quarantine row is not emitted
    assert len(rt) == 1 and rt[0]["facility_id"] == "FAC001"


def test_malformed_file_yields_null_record(spark, tmp_path):
    root = str(tmp_path / "uploads")
    write_json(root, "FAC009", "patient_person_0_20250101000000.json",
               "{this is not json")
    df = spark.read.format("upload_json").option("path", root).load()
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["record"] is None
    assert rows[0]["facility_id"] == "FAC009"


def test_writer_round_trips_upload_tree(spark, tmp_path):
    """The writer emits the reference upload layout (facility dirs,
    <table>_*.json array files) through the two-phase commit, and the
    upload_json READER recovers exactly the written rows — a full
    format round-trip through the custom source."""
    out = str(tmp_path / "emitted")
    rows = [
        ("FAC001", "patient_person", json.dumps({"id": i, "v": f"x{i}"}))
        for i in range(4)
    ] + [("FAC002", "visits", json.dumps({"id": 99}))]
    df = spark.createDataFrame(
        rows, "facility_id string, table_name string, record string"
    ).repartition(2)
    (
        df.write.format("upload_json")
        .mode("append")
        .option("path", out)
        .option("suffix", "20250101000000")
        .save()
    )
    # layout: facility dirs, table-prefixed array files, no temp residue
    facs = sorted(os.listdir(out))
    assert facs == ["FAC001", "FAC002"]
    for fac in facs:
        names = os.listdir(os.path.join(out, fac))
        assert names and all(not n.startswith(".tmp-") for n in names)
        assert all(n.endswith(".json") for n in names)
    back = (
        spark.read.format("upload_json").option("path", out).load().collect()
    )
    got = sorted(
        (r["facility_id"], r["table_name"], r["record"]) for r in back
    )
    assert got == sorted(rows)
    # every emitted file is a well-formed JSON array (reference parser)
    for fac in facs:
        for n in os.listdir(os.path.join(out, fac)):
            with open(os.path.join(out, fac, n)) as f:
                assert isinstance(json.load(f), list)


def test_writer_abort_leaves_no_staged_files(spark, tmp_path):
    """The abort path: staged .tmp files are removed, nothing final
    appears (driven directly — Spark only calls abort on task
    failure)."""
    from data_ingestion_from_multiple_directories_linux_spark.sources.py_datasource import (
        UploadWriter,
    )

    out = str(tmp_path / "aborted")
    os.makedirs(out)
    w = UploadWriter({"path": out}, overwrite=False)
    import uuid

    d = os.path.join(out, "FAC001")
    os.makedirs(d)
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        f.write("[]")

    class Msg:
        renames = [(tmp, os.path.join(d, "t_0_00000000000000.json"))]

    w.abort([Msg(), None])
    assert os.listdir(d) == []


def test_writer_refuses_to_clobber_prior_append(spark, tmp_path):
    """Two append jobs sharing the (default) suffix must NOT silently
    overwrite each other's files in the arrival log: the second commit
    fails whole, the first job's data survives intact, and an explicit
    if_exists=overwrite restores the clobbering behavior."""
    out = str(tmp_path / "noclobber")
    df = spark.createDataFrame(
        [("FAC001", "t", json.dumps({"id": 1}))],
        "facility_id string, table_name string, record string",
    ).coalesce(1)
    write = lambda d, **opts: (  # noqa: E731
        d.write.format("upload_json").mode("append").option("path", out)
        .options(**opts).save()
    )
    write(df)
    first = os.path.join(out, "FAC001", "t_0_00000000000000.json")
    with open(first) as f:
        assert json.load(f) == [{"id": 1}]
    df2 = spark.createDataFrame(
        [("FAC001", "t", json.dumps({"id": 2}))],
        "facility_id string, table_name string, record string",
    ).coalesce(1)
    with pytest.raises(Exception, match="overwrite existing upload"):
        write(df2)
    with open(first) as f:  # loser's data untouched
        assert json.load(f) == [{"id": 1}]
    # no staged residue from the failed commit
    assert not [n for n in os.listdir(os.path.join(out, "FAC001"))
                if n.startswith(".tmp-")]
    write(df2, if_exists="overwrite")
    with open(first) as f:
        assert json.load(f) == [{"id": 2}]
    # distinct suffixes coexist — the supported append pattern
    write(df, suffix="20250101000000")
    assert len(os.listdir(os.path.join(out, "FAC001"))) == 2


def test_writer_commit_sweeps_stale_tmp_files(spark, tmp_path):
    """A stale .tmp-* file (failed/speculative task attempt from an
    earlier job) is swept by the next successful commit in that
    directory, while a FRESH .tmp-* (concurrent in-flight job) is
    preserved by the TTL guard."""
    out = str(tmp_path / "sweep")
    d = os.path.join(out, "FAC001")
    os.makedirs(d)
    stale = os.path.join(d, ".tmp-deadbeef")
    fresh = os.path.join(d, ".tmp-cafebabe")
    for p in (stale, fresh):
        with open(p, "w") as f:
            f.write("[]")
    old = os.path.getmtime(stale) - 7200
    os.utime(stale, (old, old))
    df = spark.createDataFrame(
        [("FAC001", "t", json.dumps({"id": 1}))],
        "facility_id string, table_name string, record string",
    ).coalesce(1)
    (
        df.write.format("upload_json").mode("append")
        .option("path", out).save()
    )
    names = set(os.listdir(d))
    assert ".tmp-deadbeef" not in names  # stale: swept
    assert ".tmp-cafebabe" in names      # fresh: concurrent-safe
    assert "t_0_00000000000000.json" in names


def test_writer_rejects_overwrite_and_malformed_records(spark, tmp_path):
    out = str(tmp_path / "rejects")
    df = spark.createDataFrame(
        [("F", "t", "{not json")],
        "facility_id string, table_name string, record string",
    )
    with pytest.raises(Exception):
        df.write.format("upload_json").mode("overwrite").option(
            "path", out
        ).save()
    with pytest.raises(Exception):
        df.write.format("upload_json").mode("append").option(
            "path", out
        ).save()
