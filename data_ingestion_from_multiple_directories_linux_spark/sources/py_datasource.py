"""Custom Python DataSource for the upload tree (SURVEY.md §2.1 S1/S8).

``sources/json_dir.py`` reads the reference's upload layout
(``<root>/<facility>/<table>_<batch>_<ts>.json``, reference
file_loader.py:264-265) through ``spark.read.json`` — the right default.
This module exposes the SAME layout as a first-class Spark *format* via
the Python DataSource API (Spark 4), which buys three things json_dir
cannot express:

* **The file list IS the partition list.** ``partitions()`` returns one
  input partition per upload file, so Spark's scheduler sees the real
  unit of work (a file), balances executors at file granularity, and
  retries exactly one file on task failure — the property the
  reference's file-at-a-time loop had, recovered INSIDE a distributed
  scan.
* **Scan-level filter pushdown.** ``pushFilters`` accepts equality/IN
  predicates on the lineage columns (facility_id, table_name) and
  prunes the FILE LIST before any partition is planned — the Python-
  source equivalent of parquet partition pruning: a query for one
  facility opens that facility's files only, which at 50k-file scale is
  the difference between listing and reading.
* **Lineage without name parsing in the plan.** Each row carries its
  file/facility/batch from the partition metadata directly.

Rows come out raw (``record`` = the JSON object text) plus lineage; the
ingestion engine's cleanse/validate stages take over from there, exactly
as they do for the json_dir path.

Registration: ``spark.dataSource.register(UploadDataSource)`` then
``spark.read.format("upload_json").option("path", root).load()``.
Filter pushdown additionally needs the opt-in conf
``spark.sql.python.filterPushdown.enabled=true`` (Spark refuses to plan
a pushFilters-implementing reader without it, so misconfiguration fails
loudly rather than silently scanning everything).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterable, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    In,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from .json_dir import discover_files

#: the fixed output schema: lineage + the raw record text
UPLOAD_SCHEMA = (
    "facility_id string, table_name string, batch_id string, "
    "file_name string, record string"
)

#: lineage columns pushFilters can prune the file list on
_PRUNABLE = {"facility_id", "table_name"}


class _FilePartition(InputPartition):
    """One upload file = one Spark task (picklable metadata only)."""

    def __init__(self, path, file_name, facility_id, table_name, batch_id):
        self.path = path
        self.file_name = file_name
        self.facility_id = facility_id
        self.table_name = table_name
        self.batch_id = batch_id


class UploadReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("upload_json requires .option('path', root)")
        #: accepted pushed filters: column -> allowed value set
        self._keep: dict[str, set] = {}

    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:
        """Accept equality/IN on lineage columns (they prune whole
        files); everything else is returned for Spark to re-apply.

        The filter list is a CONJUNCTION (every accepted filter must
        hold), so repeated filters on one column INTERSECT their value
        sets — a union would let rows through that an accepted filter
        excludes, and Spark never re-applies accepted filters (e.g.
        ``facility_id IN ('A','B') AND facility_id = 'A'``, which
        Catalyst constraint propagation can generate, must prune to
        {'A'}, not {'A','B'})."""
        for f in filters:
            col = f.attribute[0] if hasattr(f, "attribute") else None
            if isinstance(f, EqualTo) and col in _PRUNABLE:
                vals = {f.value}
            elif isinstance(f, In) and col in _PRUNABLE:
                # the dataclass field is `value` (a tuple); `.values`
                # was a latent AttributeError — the In branch had never
                # been exercised before this test
                vals = set(f.value)
            else:
                yield f  # unsupported → Spark evaluates it post-scan
                continue
            if col in self._keep:
                self._keep[col] &= vals
            else:
                self._keep[col] = vals

    def partitions(self) -> Sequence[InputPartition]:
        """Driver-side metadata listing only (the same walk Spark's own
        file index does); pushed filters prune here, BEFORE any task
        exists."""
        parts = []
        for m in discover_files(self.root):
            vals = {"facility_id": m.facility_id, "table_name": m.table_name}
            if any(
                vals[c] not in allowed
                for c, allowed in self._keep.items()
            ):
                continue
            parts.append(
                _FilePartition(
                    m.path, m.file_name, m.facility_id, m.table_name,
                    m.batch_id,
                )
            )
        return parts

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        """Executor-side: parse ONE file's JSON array, yield
        (lineage..., record-text) rows. A malformed file yields a single
        row with NULL record — the engine's quarantine stage sees it."""
        try:
            with open(partition.path) as f:
                records = json.load(f)
            if not isinstance(records, list):
                records = [records]
        except (OSError, ValueError):
            records = [None]
        for rec in records:
            yield (
                partition.facility_id,
                partition.table_name,
                partition.batch_id,
                partition.file_name,
                None if rec is None else json.dumps(rec, sort_keys=True),
            )


class UploadDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "upload_json"

    def schema(self) -> str:
        return UPLOAD_SCHEMA

    def reader(self, schema: StructType) -> UploadReader:
        return UploadReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> "UploadWriter":
        return UploadWriter(self.options, overwrite)


# ---------------------------------------------------------------------------
# Writer: emit the upload-tree layout back out (the round-trip sink)
# ---------------------------------------------------------------------------


class _UploadCommit(WriterCommitMessage):
    """Per-task commit message: the (temp, final) renames this task
    staged. Picklable plain data only."""

    def __init__(self, renames: list[tuple[str, str]]):
        self.renames = renames


class UploadWriter(DataSourceWriter):
    """Writes rows (facility_id, table_name, record) back into the
    reference's upload layout — one JSON-array file per (facility,
    table) per task, named ``<table>_<pid>_<suffix>.json`` (the
    reference's ``<table>_<batch>_<timestamp>`` convention with the task
    partition id as the batch ordinal).

    Two-phase commit, the part plain ``foreachPartition`` file writing
    cannot give you: tasks stage ``.tmp-*`` files and report them in
    their commit message; only the DRIVER's ``commit()`` renames staged
    files to their final names, and ``abort()`` removes every staged
    file — so a failed/speculatively-duplicated task never leaves a
    half-written upload visible to the reference's file-discovery scan
    (which lists ``<table>_*.json``, and would otherwise ingest
    partial files; the same task-commit discipline FileFormatWriter
    applies to parquet, here for a custom layout)."""

    def __init__(self, options: dict, overwrite: bool):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("upload_json writer requires .option('path', root)")
        if overwrite:
            raise ValueError(
                "upload_json supports append only (the upload tree is an "
                "arrival log; delete via the retention job, not overwrite)"
            )
        #: stamped into file names; defaults to a fixed batch tag so
        #: reruns are deterministic — pass a timestamp for real loads
        self.suffix = options.get("suffix", "00000000000000")
        #: "error" (default) refuses to clobber an existing final file —
        #: two append jobs sharing the default suffix would otherwise
        #: silently overwrite each other's uploads in an arrival log.
        #: "overwrite" restores the old clobbering behavior explicitly.
        self.if_exists = options.get("if_exists", "error")
        if self.if_exists not in ("error", "overwrite"):
            raise ValueError("upload_json: if_exists must be error|overwrite")
        #: staged .tmp-* files older than this many seconds found in a
        #: committed directory are swept as leftovers of failed or
        #: speculative task attempts (abort() only runs on whole-job
        #: failure, so a task-level failure inside an ultimately
        #: successful job would otherwise leak its staging files
        #: forever). The TTL keeps the sweep safe against a CONCURRENT
        #: append job that is mid-stage in the same facility directory.
        self.tmp_ttl_sec = float(options.get("tmp_ttl_sec", "3600"))

    def write(self, iterator) -> _UploadCommit:
        import json as _json
        import os as _os
        import uuid as _uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        groups: dict[tuple[str, str], list[str]] = {}
        for row in iterator:
            rec = row["record"]
            # NULL record rows are the READER's quarantine marker for a
            # malformed source file (read() yields record=NULL); they
            # carry no emittable payload, so a reader→writer round trip
            # skips them instead of crashing the job on json.loads(None)
            # (review finding). Same for rows missing the layout keys.
            if rec is None or row["facility_id"] is None or row["table_name"] is None:
                continue
            # validate executor-side: a malformed record would poison
            # the whole emitted file for downstream array parsers
            _json.loads(rec)
            groups.setdefault(
                (row["facility_id"], row["table_name"]), []
            ).append(rec)
        renames = []
        for (fac, table), recs in sorted(groups.items()):
            d = _os.path.join(self.root, fac)
            _os.makedirs(d, exist_ok=True)
            # reference naming: <table>_<batch>_<timestamp>.json —
            # the task/partition id is the batch ordinal, so names stay
            # parseable by discover_files AND unique per task
            final = _os.path.join(
                d, f"{table}_{pid}_{self.suffix}.json"
            )
            tmp = _os.path.join(d, f".tmp-{_uuid.uuid4().hex}")
            with open(tmp, "w") as f:
                f.write("[" + ",".join(recs) + "]")
            renames.append((tmp, final))
        return _UploadCommit(renames)

    def commit(self, messages) -> None:
        import os as _os
        import time as _time

        renames = [r for m in messages for r in m.renames]
        if self.if_exists == "error":
            # Refuse to clobber: os.link is atomic-exclusive (EEXIST if
            # the final name is taken), unlike os.replace. Pre-check all
            # targets so an ordinary collision fails the whole commit
            # before anything goes live; link() then closes the
            # check-to-publish race, and a mid-loop race UNWINDS the
            # links already made (tmps are only deleted after every
            # link succeeded), so the commit is all-or-nothing even
            # when two same-suffix jobs interleave.
            taken = sorted(f for _t, f in renames if _os.path.exists(f))
            if taken:
                raise FileExistsError(
                    "upload_json append would overwrite existing upload(s) "
                    f"{taken[:3]}{'…' if len(taken) > 3 else ''}; pass a "
                    "unique .option('suffix', …) per job or "
                    ".option('if_exists', 'overwrite') explicitly"
                )
            linked = []
            try:
                for tmp, final in renames:
                    _os.link(tmp, final)  # raises FileExistsError on race
                    linked.append(final)
            except FileExistsError:
                for f in linked:  # roll back our own publishes
                    try:
                        _os.unlink(f)
                    except OSError:
                        pass
                raise
            for tmp, _final in renames:
                _os.unlink(tmp)
        else:
            for tmp, final in renames:
                _os.replace(tmp, final)
        # Sweep stale staging files from failed/speculative task
        # attempts in the directories this job touched: abort() never
        # runs when the job succeeds, so without this they accumulate
        # invisibly (discovery lists <table>_*.json only). TTL-guarded
        # so a concurrent job's in-flight .tmp-* files survive.
        cutoff = _time.time() - self.tmp_ttl_sec
        for d in sorted({_os.path.dirname(f) for _t, f in renames}):
            try:
                entries = _os.listdir(d)
            except OSError:
                continue
            for fn in entries:
                if not fn.startswith(".tmp-"):
                    continue
                p = _os.path.join(d, fn)
                try:
                    if _os.path.getmtime(p) < cutoff:
                        _os.remove(p)
                except OSError:
                    pass

    def abort(self, messages) -> None:
        import os as _os

        for m in messages:
            if m is None:
                continue
            for tmp, _ in m.renames:
                try:
                    _os.remove(tmp)
                except OSError:
                    pass
