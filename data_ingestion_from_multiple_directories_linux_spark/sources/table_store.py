"""Parquet-backed table store with atomic overwrite.

The reference keeps all mutable state in PostgreSQL tables updated in-place
(sync_file, file_ingestion_log, stg_* …; SURVEY.md §2.10). On immutable
object storage the engine expresses UPDATE/DELETE as read-modify-write with
a write-temp-swap so readers never observe a half-written table (SURVEY.md
§7 "mutable state on immutable storage").

Append-only tables (audit logs, staging appends) use plain parquet appends —
each Spark write job is atomic at the directory level. At cluster scale the
same interface maps 1:1 onto a table format with real transactions (Delta /
Iceberg MERGE); the swap trick is the dependency-free fallback.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class TableStore:
    """Directory-of-parquet-tables with append / atomic-overwrite / read."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        return os.path.isdir(self.path(name))

    def read(self, name: str) -> DataFrame:
        if not self.exists(name):
            raise FileNotFoundError(f"table {name!r} not found under {self.root}")
        return self.spark.read.parquet(self.path(name))

    def read_or_empty(self, name: str, schema: str) -> DataFrame:
        """Read, or produce an empty frame with the given DDL schema —
        lets first-run logic treat missing audit tables as zero rows."""
        if self.exists(name):
            return self.spark.read.parquet(self.path(name))
        return self.spark.createDataFrame([], schema)

    def append(self, name: str, df: DataFrame, partition_by: tuple[str, ...] = ()) -> None:
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(name))

    def overwrite(
        self,
        name: str,
        df: DataFrame,
        partition_by: tuple[str, ...] = (),
        flatten: bool = False,
    ) -> None:
        """Write-temp-swap: materialize to a scratch dir, then atomically
        replace the live dir. df may be derived FROM the live table (the
        read-modify-write pattern), which plain mode('overwrite') to the
        same path would corrupt — Spark would delete its own input.

        ``flatten=True`` (with ``partition_by``) uses the partition
        columns only to SPLIT files — one file per partition value —
        then hoists the leaf files to the table root before the swap,
        so the partition columns never enter the table's visible schema
        (hive layout stores them in directory names, not in the parquet
        data files). Layout-maintenance jobs use this to control
        file-to-value assignment exactly (zorder_table's rectangle
        grid) without leaving an internal column behind in reads,
        appends, or later compactions (review finding)."""
        tmp = self.path(f".{name}.tmp-{uuid.uuid4().hex}")
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
        if partition_by and flatten:
            n = 0
            for dirpath, _dirs, files in os.walk(tmp):
                if dirpath == tmp:
                    continue
                for f in files:
                    if f.endswith(".parquet"):
                        os.rename(
                            os.path.join(dirpath, f),
                            os.path.join(tmp, f"f{n:05d}-{f}"),
                        )
                        n += 1
            for d in os.listdir(tmp):
                p = os.path.join(tmp, d)
                if os.path.isdir(p):
                    shutil.rmtree(p, ignore_errors=True)
        live = self.path(name)
        trash = self.path(f".{name}.old-{uuid.uuid4().hex}")
        if os.path.isdir(live):
            os.rename(live, trash)
        os.rename(tmp, live)
        if os.path.isdir(trash):
            shutil.rmtree(trash, ignore_errors=True)

    def drop(self, name: str) -> None:
        if self.exists(name):
            shutil.rmtree(self.path(name))

    def list_tables(self, pattern: str | None = None) -> list[str]:
        """Catalog table-list scan (reference
        stg_records_deletion_process.py:31-50: name-pattern + IN-list over
        information_schema)."""
        import re

        names = [
            d
            for d in sorted(os.listdir(self.root))
            if os.path.isdir(os.path.join(self.root, d)) and not d.startswith(".")
        ]
        if pattern:
            names = [n for n in names if re.search(pattern, n)]
        return names

    def table_sizes(self, top_n: int = 100) -> list[tuple[str, int]]:
        """Table-size introspection (reference table_sizes.sql:1-11:
        pg_total_relation_size top-100) — filesystem stats per table dir."""
        out = []
        for name in self.list_tables():
            total = 0
            for dirpath, _dirnames, filenames in os.walk(self.path(name)):
                for f in filenames:
                    total += os.path.getsize(os.path.join(dirpath, f))
            out.append((name, total))
        out.sort(key=lambda kv: (-kv[1], kv[0]))
        return out[:top_n]

    def overwrite_partitions(
        self, name: str, df: DataFrame, partition_by: tuple[str, ...]
    ) -> list[str]:
        """Dynamic partition overwrite: replace ONLY the hive partitions
        present in ``df``, leaving every other partition untouched — the
        incremental-recompute write pattern (re-land one facility/day
        without rewriting the table; Spark's
        ``partitionOverwriteMode=dynamic`` for the swap-based store).

        A full :meth:`overwrite` rewrites the WHOLE table to replace one
        partition — at 100 TB that turns a daily one-partition refresh
        into a full-table write. Here ``df`` materializes partitioned
        into scratch, then each leaf partition directory it produced is
        swapped into the live tree with the same rename discipline as
        :meth:`overwrite`. Returns the relative partition paths
        replaced.

        Atomicity contract (documented, not hand-waved): the swap is
        atomic PER PARTITION, not per call — a reader racing a
        multi-partition refresh can observe a mix of old and new
        partitions, but never a half-written single partition (each
        rename is atomic, and a table format with real snapshot
        isolation — Delta/Iceberg — is the cluster-scale upgrade). The
        old data for each partition is parked in a per-call
        ``.{name}.dpo-old-*`` trash dir UNDER ITS RELATIVE PATH, so a
        crash between "old moved to trash" and "new moved in" is
        repairable: :meth:`repair` restores any partition that is
        missing from the live tree from the newest trash copy, then
        clears all ``.dpo-*`` residue. Call it at startup."""
        if not partition_by:
            raise ValueError("overwrite_partitions needs partition columns")
        tmp = self.path(f".{name}.dpo-{uuid.uuid4().hex}")
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(tmp)
        live = self.path(name)
        if not os.path.isdir(live):
            os.rename(tmp, live)
            return sorted(
                os.path.join(*parts)
                for parts, _d in self._leaf_partitions(live, len(partition_by))
            )
        trash = self.path(f".{name}.dpo-old-{uuid.uuid4().hex}")
        replaced = []
        for parts, src in self._leaf_partitions(tmp, len(partition_by)):
            rel = os.path.join(*parts)
            dst = os.path.join(live, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            if os.path.isdir(dst):
                parked = os.path.join(trash, rel)
                os.makedirs(os.path.dirname(parked), exist_ok=True)
                os.rename(dst, parked)
            os.rename(src, dst)
            replaced.append(rel)
        shutil.rmtree(trash, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)
        return sorted(replaced)

    def repair(self, name: str) -> dict[str, list[str]]:
        """Crash-recovery scan for :meth:`overwrite_partitions` AND
        :meth:`overwrite` residue — run at startup, like a table
        format's orphan-file cleanup.

        Two restore rules, applied NEWEST trash first (mtime order —
        when two crashed calls both parked a copy, the later call's
        parked data is the one the last committed state held):

        * ``.{name}.old-*`` (a full-table :meth:`overwrite` crashed
          between "live → trash" and "tmp → live"): if the live dir is
          MISSING entirely, the newest parked table is moved back
          whole — without this the only surviving committed copy would
          be deleted as residue.
        * ``.{name}.dpo-old-*`` (partition swap): any partition parked
          under its relative path whose live counterpart is missing is
          restored; parked partitions whose live copy exists are
          dropped (the swap completed).

        Then all remaining residue — ``.dpo-*`` scratch, ``.tmp-*``
        uncommitted writer output, older parked copies — is removed.
        Returns ``{"restored": [...relpaths], "removed":
        [...dirnames]}`` ('.' marks a whole-table restore)."""
        live = self.path(name)
        restored: list[str] = []
        removed: list[str] = []
        residue = [
            d
            for d in os.listdir(self.root)
            if d.startswith(f".{name}.")
            and os.path.isdir(os.path.join(self.root, d))
        ]
        # newest first: restores prefer the most recent parked copy
        residue.sort(
            key=lambda d: os.path.getmtime(os.path.join(self.root, d)),
            reverse=True,
        )
        for d in residue:
            p = os.path.join(self.root, d)
            if d.startswith(f".{name}.old-") and not os.path.isdir(live):
                os.rename(p, live)
                restored.append(".")
                removed.append(d)
                continue
            if d.startswith(f".{name}.dpo-old-"):
                for dirpath, _dirs, files in os.walk(p):
                    if not files:
                        continue
                    rel = os.path.relpath(dirpath, p)
                    dst = os.path.join(live, rel)
                    if not os.path.isdir(dst):
                        os.makedirs(os.path.dirname(dst), exist_ok=True)
                        os.rename(dirpath, dst)
                        restored.append(rel)
            shutil.rmtree(p, ignore_errors=True)
            removed.append(d)
        return {"restored": sorted(restored), "removed": removed}

    def partition_columns(self, name: str) -> tuple[str, ...]:
        """The hive partition columns of a table, inferred from its
        directory layout (``key=value`` nesting) — pure metadata. Empty
        tuple for flat tables. Lets maintenance sweeps preserve a
        table's partitioning without the caller re-stating it."""
        cols: list[str] = []
        d = self.path(name)
        while True:
            subs = [
                e
                for e in sorted(os.listdir(d))
                if "=" in e and os.path.isdir(os.path.join(d, e))
            ]
            if not subs:
                return tuple(cols)
            cols.append(subs[0].split("=", 1)[0])
            d = os.path.join(d, subs[0])

    @staticmethod
    def _leaf_partitions(root: str, depth: int):
        """Yield (key=value path components, abs dir) for every leaf
        partition directory exactly ``depth`` levels below root."""
        def walk(d: str, parts: list[str]):
            if len(parts) == depth:
                yield parts, d
                return
            for entry in sorted(os.listdir(d)):
                sub = os.path.join(d, entry)
                if os.path.isdir(sub) and "=" in entry:
                    yield from walk(sub, parts + [entry])

        yield from walk(root, [])
