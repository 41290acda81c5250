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


def test_malformed_file_yields_null_record(spark, tmp_path):
    root = str(tmp_path / "uploads")
    write_json(root, "FAC009", "patient_person_0_20250101000000.json",
               "{this is not json")
    df = spark.read.format("upload_json").option("path", root).load()
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["record"] is None
    assert rows[0]["facility_id"] == "FAC009"
