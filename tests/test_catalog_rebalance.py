"""The scan-rebalance layout probe must be O(cores), not O(files).

VERDICT r12 item 8: ``_rebalance_scan`` walked the WHOLE table dir
before its min-bytes check, so a huge local table paid a driver-side
stat of every file just to decide "no-op". The walk now short-circuits
at the decision thresholds (``cores`` files / enough bytes for
``cores`` byte-range splits); these tests pin that behavior and the
unchanged no-op decisions around it.
"""

from __future__ import annotations

import os

from data_ingestion_from_multiple_directories_linux_spark.catalog import (
    _path_layout,
    _rebalance_scan,
)


def _make_files(d, n, size=128):
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        with open(os.path.join(d, f"part-{i:05d}.parquet"), "wb") as f:
            f.write(b"x" * size)


def test_path_layout_stops_at_max_files(tmp_path):
    d = str(tmp_path / "many")
    _make_files(d, 500)
    total, files = _path_layout(d, max_files=8)
    assert len(files) == 8  # stopped, did not stat all 500
    assert total == 8 * 128


def test_path_layout_stops_at_max_bytes(tmp_path):
    d = str(tmp_path / "big")
    _make_files(d, 50, size=1024)
    total, files = _path_layout(d, max_bytes=4096)
    assert total >= 4096
    assert len(files) <= 4  # 4 KiB / 1 KiB files


def test_path_layout_full_walk_without_caps(tmp_path):
    d = str(tmp_path / "all")
    _make_files(d, 20)
    total, files = _path_layout(d)
    assert len(files) == 20
    assert total == 20 * 128


def test_rebalance_noop_on_many_file_dir(spark, tmp_path):
    # a Spark-written many-file table has natural parallelism >= cores:
    # the probe must leave the scan alone (file-count decision, reached
    # after at most `cores` stats)
    d = str(tmp_path / "t.parquet")
    spark.range(1000).repartition(8).write.parquet(d)
    df = spark.read.parquet(d)
    out = _rebalance_scan(spark, df, d)
    assert out is df  # same object: no Repartition appended


def test_rebalance_noop_on_tiny_table(spark, tmp_path):
    d = str(tmp_path / "tiny.parquet")
    spark.range(10).coalesce(1).write.parquet(d)
    df = spark.read.parquet(d)
    assert _rebalance_scan(spark, df, d) is df  # under min-bytes


def test_rebalance_noop_on_missing_path(spark, tmp_path):
    df = spark.range(5)
    assert _rebalance_scan(spark, df, str(tmp_path / "nope")) is df
