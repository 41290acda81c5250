"""Batch ingestion engine (SURVEY.md §3 lifecycle, §2.11 control operators).

Reproduces the observable semantics of the reference pipeline
(file_ingestion_process.py → file_loader.py) Spark-first:

* one distributed JSON read per target table instead of a pandas loop per
  file (G5: facility parallelism comes from the scheduler, not threads);
* idempotency as a left-anti join of the discovered-file catalog against
  the success log (G1, file_loader.py:312-369) — previously failed files
  retry automatically on the next run (file_loader.py:413-420
  ``is_loaded_failed → 'attempting to reload'``), after their prior
  partial rows are purged from staging so the retry cannot duplicate;
* per-table transform dispatch (G2, file_loader.py:597-621): PII masking,
  column exclusion, struct masking;
* cleansing: null-sentinel normalization (F7), drop all-null rows (F6),
  date validation with quarantine split (G3, file_loader.py:624-653):
  valid rows land in ``stg_<table>``, bad-date rows in
  ``stg_<table>_bad_dates``, and the file is logged failed with detail;
* empty/malformed file handling (G4/G8, file_loader.py:591-595, :371-384);
* lineage columns stg_batch_id/stg_load_time/stg_file_name/stg_datim_id
  (§1.4, file_loader.py:630-633);
* audit tables ingestion_log / stg_monitoring / pipeline_log (G6,
  file_loader.py:83-90, :648-651; file_ingestion_process.py:24-37).

Scale notes: staging tables are written partitioned by facility
(``stg_datim_id``) so per-facility reads prune partitions; audit writes are
append-only; the only driver-side collect is file-level *metadata* (the
same information Spark's own FileIndex holds), never row data.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.cleansing import (
    any_bad_date,
    discover_date_columns,
    normalize_nulls,
    try_parse_timestamp,
)
from ..functions.masking import mask_columns, mask_struct_value_staged
from ..sources.json_dir import (
    CORRUPT_COL,
    FileMeta,
    catalog_df,
    discover_files,
    read_table_files,
)
from ..functions.naming import TS_RE
from ..sources.table_store import TableStore

INGESTION_LOG = "ingestion_log"
STG_MONITORING = "stg_monitoring"
PIPELINE_LOG = "pipeline_log"
PARTNER_MAPPING = "central_partner_mapping"
PROCESS_SUMMARY = "process_summary_report"


class ConcurrentRunError(RuntimeError):
    """Another ingestion run holds the single-instance lock (G7)."""

INGESTION_LOG_DDL = (
    "file_name string, facility_id string, table_name string, batch_id string, "
    "status string, json_rec_count bigint, bad_rec_count bigint, "
    "error_message string, load_start_time timestamp, load_end_time timestamp"
)
STG_MONITORING_DDL = (
    "datim_id string, batch_id string, file_name string, table_name string, "
    "load_time timestamp, json_rec_count bigint, processed string, error_message string"
)
PIPELINE_LOG_DDL = (
    "log_id string, start_time timestamp, end_time timestamp, status string, "
    "process_type string, error_message string, records_processed bigint"
)

#: Error-message storage cap (reference file_loader.py:189).
ERROR_MSG_CAP = 10_000

_INTERNAL_COLS = ("_src_file", "_src_facility", CORRUPT_COL)


def local_df(spark: SparkSession, rows: list[tuple], ddl: str) -> DataFrame:
    """Single-partition DataFrame from driver-local rows (audit frames).

    ``createDataFrame(rows)`` slices into defaultParallelism partitions —
    one tiny output file per slice on append, and ``coalesce(1)`` on such
    a local relation measures ~10× slower than building the single
    partition up front (it funnels every python slice through one task).
    Audit frames are bounded by the per-run file cap, so one partition —
    and therefore exactly one parquet file per run — is the right shape.
    """
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), ddl)


def cleanse_and_split(
    table: str, df: DataFrame, transforms: dict[str, list]
) -> tuple[DataFrame, DataFrame, list[str], DataFrame]:
    """The shared per-table cleansing pipeline (G2 + F6/F7 + G3):
    transform dispatch → null-sentinel normalization → all-null drop →
    date-validation quarantine split. ``df`` is the raw PERMISSIVE read —
    corrupt rows included — carrying the _src_file/_src_facility lineage
    columns. Returns (valid, bad, date_cols, flagged) where ``flagged``
    retains EVERY input row with the verdict flags ``_is_corrupt`` /
    ``_all_null`` / ``_bad_date`` (mutually exclusive, in that priority),
    so callers derive raw/corrupt/valid/bad counts per file in ONE
    aggregation pass — one scan of the data instead of two.
    Used by both the batch engine and the streaming foreachBatch path —
    identical semantics by construction."""
    corrupt = F.col(CORRUPT_COL).isNotNull()
    for t in transforms.get(table, []):
        df = t(df)
    data_cols = [c for c in df.columns if c not in _INTERNAL_COLS]
    df = normalize_nulls(df, data_cols)
    # na.drop(how='all') as a flag: every data column null (F6)
    all_null = F.lit(True)
    for c in data_cols:
        all_null = all_null & F.col(c).isNull()
    str_cols = {
        f.name for f in df.schema.fields if f.dataType.simpleString() == "string"
    }
    date_cols = [c for c in discover_date_columns(data_cols) if c in str_cols]
    flagged = (
        df.withColumn("_is_corrupt", corrupt)
        .withColumn("_all_null", ~corrupt & all_null)
        .withColumn("_bad_date", ~corrupt & ~all_null & any_bad_date(date_cols))
    )
    live = flagged.filter(
        ~F.col("_is_corrupt") & ~F.col("_all_null")
    ).drop("_is_corrupt", "_all_null", CORRUPT_COL)
    valid = live.filter(~F.col("_bad_date")).drop("_bad_date")
    bad = live.filter(F.col("_bad_date")).drop("_bad_date")
    return valid, bad, date_cols, flagged


def finalize_lineage(
    d: DataFrame, date_cols: list[str], cast_dates: bool
) -> DataFrame:
    """Append the four lineage columns (§1.4, file_loader.py:630-633) and
    cast validated date columns to timestamp (quarantine keeps raw)."""
    from ..functions.naming import batch_of

    cols: list[Column] = []
    for c in [c for c in d.columns if c not in _INTERNAL_COLS]:
        if cast_dates and c in date_cols:
            cols.append(try_parse_timestamp(c).alias(c))
        else:
            cols.append(F.col(c))
    return d.select(
        *cols,
        batch_of(F.col("_src_file")).alias("stg_batch_id"),
        F.current_timestamp().alias("stg_load_time"),
        F.col("_src_file").alias("stg_file_name"),
        F.col("_src_facility").alias("stg_datim_id"),
    )


def _default_transforms() -> dict[str, list]:
    """Per-table transform dispatch table (G2, file_loader.py:597-621).

    Values are callables ``DataFrame -> DataFrame`` applied before
    cleansing. ``None``-keyed default applies to unlisted tables (no-op —
    the stg_mhpss_confirmation branch)."""
    return {
        # file_loader.py:600-603 — biometric match columns excluded
        "biometric": [
            lambda df: df.drop("match_type", "match_person_uuid", "match_biometric_id")
        ],
        # file_loader.py:608-613 — constant '******' overwrite
        "hts_index_elicitation": [
            lambda df: mask_columns(
                df,
                ["last_name", "first_name", "middle_name", "phone_number", "alt_phone_number"],
            )
        ],
        # file_loader.py:615-621
        "patient_person": [
            lambda df: mask_columns(
                df,
                ["surname", "first_name", "other_name", "full_name", "hospital_number", "nin_number"],
            )
        ],
        # file_loader.py:606 — mask inside extra.value JSON payload
        # (staged form: the heavy stage-1 regexp runs once per row
        # behind a projection boundary — the r8 masking rewrite)
        "hts_client": [
            lambda df: mask_struct_value_staged(df, "extra")
            if "extra" in df.columns
            else df
        ],
    }


@dataclass
class IngestReport:
    run_id: str
    files_seen: int = 0
    files_skipped: int = 0
    files_ingested: int = 0
    files_failed: int = 0
    records_ingested: int = 0
    records_quarantined: int = 0
    tables: dict[str, int] = field(default_factory=dict)
    #: "<facility_id>/<file_name>" -> error message
    errors: dict[str, str] = field(default_factory=dict)


class IngestionEngine:
    """One engine instance per warehouse (≙ one staging database)."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        partition_by_facility: bool = True,
        max_files_per_run: int | None = 50_000,
        submit_workers: int | None = None,
    ) -> None:
        self.spark = spark
        self.store = TableStore(spark, warehouse)
        # staging partition layout: facility = the natural partition unit
        # (§1.1; directories keyed by facility → partition pruning on read)
        self.partition_cols = ("stg_datim_id",) if partition_by_facility else ()
        # batch-size throttle (O2: LIMIT 50000, file_loader.py:255)
        self.max_files_per_run = max_files_per_run
        # G5 fan-out width: per-table jobs submit from this many threads
        # (None → min(8, n_tables)); 1 forces a serial driver loop —
        # the baseline the concurrency bench compares against
        self.submit_workers = submit_workers
        self.transforms = _default_transforms()

    # ------------------------------------------------------------------
    # work selection (G1 idempotency + O1/O2 queue fairness/throttle)
    # ------------------------------------------------------------------

    def _select_work(
        self, metas: list[FileMeta]
    ) -> tuple[list[FileMeta], int, set[tuple[str, str]]]:
        """Join discovered files against the latest log status per file.

        Reference state machine (file_loader.py:247-278): the dequeue
        selects only pending files; failure sets processed=-2, which is
        TERMINAL until an analyst requeue resets it — a permanently-bad
        file is not re-attempted every run. This engine keeps that
        semantics with one bounded relaxation: a failed file whose mtime
        is NEWER than the failing attempt (i.e. it was re-uploaded or
        fixed in place) re-enters the queue automatically — the retry is
        bounded by file modification, so malformed files fail exactly
        once per upload instead of forever. ``requeue_failed`` (M2) is
        the manual reopening mechanism, matching the reference's
        ``UPDATE … SET processed=0`` requeue SQL.

        Decision per (file_name, facility_id) — keyed exactly as
        file_loader.py:328-336 — based on the LATEST log row:
        no row → select (new); 'requeued' → select; 'success' → skip;
        'failed' → select only if mtime > that attempt's load_START_time
        (start, not end: a file re-uploaded while the failing attempt was
        mid-flight has mtime between start and end — comparing against
        end would terminally skip content the attempt never read). Queue
        fairness
        orders by the filename's 14-digit timestamp then name (O1,
        file_loader.py:254), capped per run (O2, LIMIT 50000).

        Returns (selected, n_skipped, retry_pairs) where retry_pairs is
        the subset of selected pairs with a prior 'failed'/'requeued'
        row — their partial staging rows must be purged before re-append
        (a G3 quarantine run ingests the valid rows and still logs the
        file failed; blind re-append would duplicate them).
        """
        if not metas:
            return [], 0, set()

        def order_key(m: FileMeta) -> tuple[str, str, str]:
            import re

            ts = re.search(TS_RE, m.file_name)
            return (ts.group(1) if ts else "", m.file_name, m.facility_id)

        if not self.store.exists(INGESTION_LOG):
            # first run: no log to join against — pure driver-side
            # ordering over file METADATA (profiled: ~8s of Spark job
            # overhead saved per cold run; identical semantics)
            ordered = sorted(metas, key=order_key)
            selected = ordered[: self.max_files_per_run]
            return selected, len(metas) - len(selected), set()

        cat = catalog_df(self.spark, metas)
        prior = self.store.read(INGESTION_LOG)
        # latest status per work item decides; one window over the
        # (bounded, file-level) log — never row data
        latest = (
            prior.withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("file_name", "facility_id").orderBy(
                        F.desc("load_end_time"), F.desc("status")
                    )
                ),
            )
            .filter(F.col("_rn") == 1)
            .select(
                "file_name",
                "facility_id",
                F.col("status").alias("_status"),
                F.col("load_start_time").alias("_attempt_ts"),
            )
        )
        joined = cat.join(latest, ["file_name", "facility_id"], "left")
        selectable = (
            F.col("_status").isNull()
            | (F.col("_status") == "requeued")
            | (
                # 2s slack: filesystem mtimes are often whole-second
                # truncated, so a file re-uploaded moments after the
                # failing attempt started could land just below the
                # attempt timestamp and be terminally skipped. An
                # occasional extra retry is idempotent (purge-before-
                # re-append), a terminal skip is data loss.
                (F.col("_status") == "failed")
                & (F.col("mtime") > F.col("_attempt_ts").cast("double") - F.lit(2.0))
            )
        )
        # retry hygiene applies to files failed OR bulk-requeued: either
        # way prior partial rows may exist in staging and must be purged
        # before the re-append (blind re-append would duplicate them)
        todo = (
            joined.filter(selectable)
            .withColumn("_retry", F.col("_status").isin("failed", "requeued"))
            .orderBy(
                F.regexp_extract("file_name", TS_RE, 1), "file_name", "facility_id"
            )
            .select("path", "file_name", "facility_id", "_retry")
        )
        if self.max_files_per_run is not None:
            todo = todo.limit(self.max_files_per_run)
        # ONE collect of file-level metadata (bounded by the 50k run
        # cap), never row data; the retry flag rides along
        rows = todo.collect()
        keep = {r.path for r in rows}
        retry_pairs = {(r.file_name, r.facility_id) for r in rows if r._retry}
        selected = [m for m in metas if m.path in keep]
        return selected, len(metas) - len(selected), retry_pairs

    def requeue_failed(self, like_pattern: str | None = None) -> int:
        """Bulk status rewrite (M2): ``UPDATE sync_file SET processed=0
        WHERE file_name ILIKE … AND processed != 0``
        (file_ingestion_summary_report.sql:63-67;
        stg_monitoring_summary.sql:21-23 ``SET processed='N' WHERE
        processed='F'``) as a read-rewrite-overwrite of the log: failed →
        'requeued'. This is the manual reopening mechanism for failed
        files: ``_select_work`` treats an UNCHANGED failed file as
        terminal (only a file modified after its failing attempt
        auto-retries), so permanently-bad files re-enter the queue only
        through this requeue. Returns the number of rows requeued."""
        if not self.store.exists(INGESTION_LOG):
            return 0
        log = self.store.read(INGESTION_LOG)
        hit = F.col("status") == "failed"
        if like_pattern:
            hit = hit & F.lower(F.col("file_name")).like(like_pattern.lower())
        n = log.filter(hit).count()
        if n:
            self.store.overwrite(
                INGESTION_LOG,
                log.withColumn(
                    "status", F.when(hit, F.lit("requeued")).otherwise(F.col("status"))
                ),
            )
        return n

    # ------------------------------------------------------------------
    # per-table ingest (S1 + G2 + F6/F7/F8 + G3 + P3 + K1)
    # ------------------------------------------------------------------

    def _ingest_table(
        self,
        table: str,
        group: list[FileMeta],
        now: datetime,
        retry_pairs: set[tuple[str, str]] = frozenset(),
    ) -> list[dict]:
        """Ingest every file destined for one staging table.

        Any failure inside the table body (read, transform, write) is
        contained: all of the table's files are audit-logged failed and
        the run continues with the other tables — the reference logs
        per-file failure and moves on (file_loader.py:426-439).
        """
        by_file: dict[tuple[str, str], dict] = {
            (m.file_name, m.facility_id): {
                "meta": m,
                "raw": 0,
                "valid": 0,
                "bad": 0,
                "corrupt": 0,
                "error": None,
            }
            for m in group
        }
        try:
            self._ingest_table_body(table, group, by_file, retry_pairs)
        except Exception as e:  # G8 error classification, per-table isolation
            msg = f"{type(e).__name__}: {str(e)[:ERROR_MSG_CAP]}"
            for st in by_file.values():
                if st["error"] is None:
                    st["error"] = msg
        return self._audit_rows(table, by_file, now)

    def _ingest_table_body(
        self,
        table: str,
        group: list[FileMeta],
        by_file: dict[tuple[str, str], dict],
        retry_pairs: set[tuple[str, str]],
    ) -> None:
        paths = [m.path for m in group]
        pair_key = ("_src_file", "_src_facility")
        df = read_table_files(self.spark, table, paths)
        # Persist BEFORE any query touching the corrupt column: Spark
        # forbids queries whose JSON-scan schema is only _corrupt_record
        # (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) unless the
        # frame is cached; _src_file/_src_facility derive from
        # input_file_name(), not data columns, so the raw/corrupt stats
        # below would hit exactly that rule.
        df = df.persist()
        try:
            # G2 + F6/F7 + G3 shared cleansing pipeline (row-preserving)
            valid, bad, date_cols, flagged = cleanse_and_split(
                table, df, self.transforms
            )

            # ONE aggregation pass over the flagged frame for ALL per-file
            # counts (raw/corrupt/valid/bad) — one scan of the cached
            # data, one job, instead of separate stats + counts passes
            valid_counts: dict[tuple[str, str], int] = {}
            bad_counts: dict[tuple[str, str], int] = {}
            is_live = ~F.col("_is_corrupt") & ~F.col("_all_null")
            for r in (
                flagged.groupBy(*pair_key)
                .agg(
                    F.count("*").alias("n_raw"),
                    F.count(F.when(F.col("_is_corrupt"), 1)).alias("n_corrupt"),
                    F.count(
                        F.when(is_live & ~F.col("_bad_date"), 1)
                    ).alias("n_valid"),
                    F.count(F.when(F.col("_bad_date"), 1)).alias("n_bad"),
                )
                .collect()
            ):
                key = (r["_src_file"], r["_src_facility"])
                st = by_file.get(key)
                if st is not None:
                    st["raw"] = int(r["n_raw"])
                    st["corrupt"] = int(r["n_corrupt"])
                if r["n_valid"]:
                    valid_counts[key] = int(r["n_valid"])
                if r["n_bad"]:
                    bad_counts[key] = int(r["n_bad"])

            # retry hygiene: purge any prior partial rows of re-attempted
            # files before appending, so a retry is exactly-once overall
            table_retries = retry_pairs & set(by_file)
            if table_retries:
                self._purge_file_rows(f"stg_{table}", table_retries)
                self._purge_file_rows(f"stg_{table}_bad_dates", table_retries)

            if valid_counts:
                self.store.append(
                    f"stg_{table}",
                    finalize_lineage(valid, date_cols, cast_dates=True),
                    self.partition_cols,
                )
            if bad_counts:
                # quarantine keeps raw (uncast) values for review
                self.store.append(
                    f"stg_{table}_bad_dates",
                    finalize_lineage(bad, date_cols, cast_dates=False),
                    self.partition_cols,
                )
        finally:
            df.unpersist()

        for key, st in by_file.items():
            st["valid"] = int(valid_counts.get(key, 0))
            st["bad"] = int(bad_counts.get(key, 0))

    def _purge_file_rows(self, store_table: str, pairs: set[tuple[str, str]]) -> None:
        """Remove a retried file's previously-appended rows (keyed on the
        lineage pair stg_file_name/stg_datim_id) via read-filter-overwrite.

        The pair list joins as a broadcast frame, NOT an OR-chain
        predicate: a 50k-pair requeue (max_files_per_run) would
        otherwise fold into a 50k-term binary expression tree that
        Catalyst re-analyzes per table — driver minutes / StackOverflow
        territory (the same pathology _purge_batch_rows documents on
        the streaming side). The anti-join is linear and the probe
        stays a hash lookup per row."""
        if not pairs or not self.store.exists(store_table):
            return
        cur = self.store.read(store_table)
        pdf = local_df(
            self.spark, sorted(pairs), "file_name string, facility_id string"
        )
        on = (cur["stg_file_name"] == pdf["file_name"]) & (
            cur["stg_datim_id"] == pdf["facility_id"]
        )
        if cur.join(F.broadcast(pdf), on, "left_semi").limit(1).count() == 0:
            return
        remaining = cur.join(F.broadcast(pdf), on, "left_anti")
        if remaining.limit(1).count() == 0:
            # an empty parquet dir is unreadable (no footer) — drop instead
            self.store.drop(store_table)
        else:
            self.store.overwrite(store_table, remaining, self.partition_cols)

    # ------------------------------------------------------------------
    # audit (G4/G6/G8)
    # ------------------------------------------------------------------

    def _audit_rows(
        self, table: str, by_file: dict[tuple[str, str], dict], now: datetime
    ) -> list[dict]:
        rows = []
        for (fn, _fac), st in by_file.items():
            m: FileMeta = st["meta"]
            if st["error"]:
                status, err = "failed", st["error"]
            elif st["corrupt"]:
                status, err = "failed", "malformed JSON"
            elif st["raw"] == 0:
                # G4 (file_loader.py:591-595) — zero parsed rows
                status, err = "failed", "JSON file is empty"
            elif st["valid"] + st["bad"] == 0:
                # non-empty file whose every row was dropped by cleansing
                # (F6 all-null drop) — distinct message for triage
                status, err = "failed", "all rows null after cleansing"
            elif st["bad"]:
                # G3: valid rows ingested, file still logged failed with
                # detail (file_loader.py:637-653)
                status = "failed"
                err = f"{st['bad']} record(s) failed date validation (quarantined)"
            else:
                status, err = "success", None
            rows.append(
                {
                    "file_name": fn,
                    "facility_id": m.facility_id,
                    "table_name": f"stg_{table}",
                    "batch_id": m.batch_id,
                    "status": status,
                    "json_rec_count": st["valid"],
                    "bad_rec_count": st["bad"],
                    "error_message": err and err[:ERROR_MSG_CAP],
                    "load_start_time": now,
                    "load_end_time": datetime.now(),
                }
            )
        return rows

    # ------------------------------------------------------------------
    # run (§3.1 lifecycle)
    # ------------------------------------------------------------------

    def run(self, root: str, process_type: str = "file_ingestion") -> IngestReport:
        """Single-instance-locked run (G7: the reference's
        ``pgrep -f $SCRIPT`` skip-if-running,
        orchestrate_file_ingestion.sh:16-26 — here an O_EXCL lock file in
        the warehouse; streaming mode gets this for free from the
        checkpoint). Raises :class:`ConcurrentRunError` if locked."""
        import os

        lock_path = self.store.path(".run.lock")
        try:
            fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise ConcurrentRunError(
                f"ingestion already running (lock {lock_path}); remove the "
                "lock file if the prior run died"
            ) from None
        try:
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            return self._run_locked(root, process_type)
        finally:
            try:
                os.remove(lock_path)
            except OSError:
                pass

    def _run_locked(self, root: str, process_type: str) -> IngestReport:
        start = datetime.now()
        run_id = f"IPID_{start:%Y%m%d_%H_%M_%S}"  # C6, file_ingestion_process.py:52
        report = IngestReport(run_id=run_id)

        metas = discover_files(root)
        report.files_seen = len(metas)
        selected, skipped, retry_pairs = self._select_work(metas)
        report.files_skipped = skipped

        groups: dict[str, list[FileMeta]] = {}
        for m in selected:
            groups.setdefault(m.table_name, []).append(m)

        # Per-table jobs submit from a thread pool: tables are independent
        # (disjoint staging paths, audit rows merged after), and a serial
        # driver loop would leave the cluster idle between small tables —
        # the reference fans out the same way (G5, ThreadPoolExecutor over
        # facilities / 10-table batches). Threads only SUBMIT jobs; Spark's
        # scheduler does the actual parallelism. Results merge in sorted
        # table order, so audit output is deterministic.
        audit: list[dict] = []
        items = sorted(groups.items())
        workers = self.submit_workers
        if workers is None:
            workers = min(8, max(1, len(items)))
        if len(items) > 1 and workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(workers, len(items))) as pool:
                futs = [
                    pool.submit(
                        self._ingest_table, table, group, start, retry_pairs
                    )
                    for table, group in items
                ]
                for f in futs:
                    audit.extend(f.result())
        else:
            for table, group in items:
                audit.extend(
                    self._ingest_table(table, group, start, retry_pairs)
                )

        for row in audit:
            if row["status"] == "success":
                report.files_ingested += 1
            else:
                report.files_failed += 1
                # key includes the facility: same-named files from two
                # facilities must not overwrite each other's entries
                report.errors[f"{row['facility_id']}/{row['file_name']}"] = row[
                    "error_message"
                ]
            report.records_ingested += row["json_rec_count"]
            report.records_quarantined += row["bad_rec_count"]
            t = row["table_name"]
            report.tables[t] = report.tables.get(t, 0) + row["json_rec_count"]

        if audit:
            log_df = local_df(
                self.spark,
                [tuple(r[k] for k in (
                    "file_name", "facility_id", "table_name", "batch_id", "status",
                    "json_rec_count", "bad_rec_count", "error_message",
                    "load_start_time", "load_end_time",
                )) for r in audit],
                INGESTION_LOG_DDL,
            )
            self.store.append(INGESTION_LOG, log_df)
            mon_df = local_df(
                self.spark,
                [
                    (
                        r["facility_id"], r["batch_id"], r["file_name"], r["table_name"],
                        r["load_end_time"], r["json_rec_count"],
                        "Y" if r["status"] == "success" else "F",
                        r["error_message"],
                    )
                    for r in audit
                ],
                STG_MONITORING_DDL,
            )
            self.store.append(STG_MONITORING, mon_df)

        end = datetime.now()
        status = "Job Passed" if report.files_failed == 0 else "Job Failed"
        run_df = local_df(
            self.spark,
            [(run_id, start, end, status, process_type, None, report.records_ingested)],
            PIPELINE_LOG_DDL,
        )
        self.store.append(PIPELINE_LOG, run_df)
        return report

    # ------------------------------------------------------------------
    # K4 — INSERT…SELECT summary report (pcs_summary_report.py:25-34)
    # ------------------------------------------------------------------

    def write_summary_report(self) -> DataFrame:
        """Materialize the state-machine summary into
        ``process_summary_report`` (K4/A3): one row of per-status file
        counts + record totals, appended with a report timestamp —
        the reference's INSERT…SELECT of SUM(CASE WHEN processed=k…)
        buckets (pcs_summary_report.py:27-33).

        Buckets count FILES, not attempts: the log keeps one row per
        attempt (fail → requeue → success is three rows for one file),
        while the reference's sync_file holds one row per file — so the
        summary reduces to the LATEST row per (file, facility) first,
        or a retried file would inflate total_files and double-count
        its earlier attempts' record tallies."""
        log = self.store.read_or_empty(INGESTION_LOG, INGESTION_LOG_DDL)
        latest = Window.partitionBy("file_name", "facility_id").orderBy(
            F.desc("load_start_time"), F.desc("load_end_time")
        )
        log = (
            log.withColumn("_rn", F.row_number().over(latest))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

        def bucket(status: str) -> Column:
            return F.count(F.when(F.col("status") == status, 1))

        summary = log.agg(
            F.count("*").alias("total_files"),
            bucket("success").alias("n_success"),
            bucket("failed").alias("n_failed"),
            bucket("requeued").alias("n_requeued"),
            F.coalesce(F.sum("json_rec_count"), F.lit(0)).alias("records_ingested"),
            F.coalesce(F.sum("bad_rec_count"), F.lit(0)).alias("records_quarantined"),
        ).withColumn("report_time", F.current_timestamp())
        self.store.append(PROCESS_SUMMARY, summary.coalesce(1))
        return self.store.read(PROCESS_SUMMARY)

    # ------------------------------------------------------------------
    # post-ingest side effect (file_loader.py:199-232)
    # ------------------------------------------------------------------

    def refresh_patient_counts(self, table: str = "stg_patient_person") -> DataFrame:
        """COUNT(DISTINCT uuid) per facility (A2, file_loader.py:211-216:
        ``WHERE archived=0``) → overwrite central_partner_mapping (M1
        update-by-key as read-modify-write)."""
        stg = self.store.read(table)
        counts = (
            stg.filter(F.col("archived") == 0)
            .groupBy("stg_datim_id")
            .agg(F.countDistinct("uuid").alias("patient_count"))
            .withColumnRenamed("stg_datim_id", "datim_id")
        )
        if self.store.exists(PARTNER_MAPPING):
            prior = self.store.read(PARTNER_MAPPING).select("datim_id", "ip_name")
            merged = prior.join(counts, "datim_id", "full").select(
                "datim_id",
                F.coalesce(F.col("patient_count"), F.lit(0)).alias("patient_count"),
                "ip_name",
            )
        else:
            merged = counts.withColumn("ip_name", F.lit(None).cast("string"))
        self.store.overwrite(PARTNER_MAPPING, merged)
        return self.store.read(PARTNER_MAPPING)
