"""Streaming sketch maintenance: an additive count-min table kept
current by a Structured Streaming file source (SURVEY.md §2.12a L72).

The batch-side count-min operator (operators/profiling.py
``count_min_heavy_hitters``) shows the sketch's defining property:
cells are pure partial counts, so sketches of disjoint data MERGE BY
ADDITION. This module exercises that property where it matters — a
stream: each micro-batch contributes its own cell partials, and the
queryable sketch is the sum over everything seen so far. Ingesting a
corpus in K micro-batches yields bit-identical cells to ingesting it in
one shot, which is the whole point of a mergeable summary.

Idempotency under foreachBatch's at-least-once contract follows the
segment-sketch design (how log-structured stores keep per-segment
sketches): partials are stored keyed by (checkpoint scope, batch_id) —
a replayed batch REPLACES its own partial rows instead of adding them
twice (the same purge-before-write move as StreamingIngestion's audit
path, stream_ingest.py). The merge to queryable cells happens at read
time over the tiny partial table (≤ batches × depth × width rows),
with ``compact()`` folding history into one segment when the partial
count grows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.profiling import CM_DEPTH, CM_WIDTH, _cm_hash
from ..sources.table_store import TableStore

#: partial-cells table: one segment of cell counts per micro-batch
CM_PARTIALS = "cm_partials"
CM_PARTIALS_DDL = (
    "checkpoint string, batch_id bigint, j int, bucket bigint, cell_n bigint"
)


def cm_cell_partials(df: DataFrame, key_col: str) -> DataFrame:
    """Cell partial counts of one data slice — the per-segment sketch.
    Shared by the batch query and the streaming merge, so both build
    THE SAME sketch for the same data."""
    u = F.col(key_col)
    return (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).cast("int").alias("j"),
                            _cm_hash(j, u).alias("bucket"),
                        )
                        for j in range(CM_DEPTH)
                    ]
                )
            ).alias("cell")
        )
        .select("cell.j", "cell.bucket")
        .groupBy("j", "bucket")
        .agg(F.count("*").cast("long").alias("cell_n"))
    )


class StreamingCountMin:
    """Maintain a count-min sketch of ``key_col`` over a JSON file
    stream (availableNow micro-batches, checkpointed)."""

    def __init__(
        self,
        spark: SparkSession,
        store: TableStore,
        source_dir: str,
        checkpoint_dir: str,
        schema: str,
        key_col: str,
    ) -> None:
        self.spark = spark
        self.store = store
        self.source_dir = source_dir
        self.checkpoint_dir = checkpoint_dir
        self.schema = schema
        self.key_col = key_col

    # -- merge ----------------------------------------------------------

    def _scope(self) -> str:
        # same stream-identity device as StreamingIngestion._commit_scope:
        # batch ids restart at 0 when a checkpoint is cleared, so partials
        # are scoped by checkpoint path
        return self.checkpoint_dir

    def _merge_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Replace this batch's partial segment (idempotent replay)."""
        part = cm_cell_partials(batch_df, self.key_col).select(
            F.lit(self._scope()).alias("checkpoint"),
            F.lit(int(batch_id)).cast("long").alias("batch_id"),
            "j",
            "bucket",
            "cell_n",
        )
        if self.store.exists(CM_PARTIALS):
            kept = self.store.read(CM_PARTIALS).filter(
                ~(
                    (F.col("checkpoint") == self._scope())
                    & (F.col("batch_id") == int(batch_id))
                )
            )
            self.store.overwrite(CM_PARTIALS, kept.unionByName(part))
        else:
            self.store.overwrite(CM_PARTIALS, part)

    def run_available_now(self) -> None:
        q = (
            self.spark.readStream.format("json")
            .schema(self.schema)
            .load(self.source_dir)
            .writeStream.foreachBatch(self._merge_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # -- query ----------------------------------------------------------

    def cells(self) -> DataFrame:
        """The queryable sketch: partial segments merged by addition."""
        return (
            self.store.read(CM_PARTIALS)
            .groupBy("j", "bucket")
            .agg(F.sum("cell_n").cast("long").alias("cell_n"))
        )

    def estimate(self, keys: DataFrame, key_col: str) -> DataFrame:
        """Point-frequency estimates (min over hash rows; always ≥ the
        true count) for a frame of keys — answered from the sketch
        alone, no re-scan of the ingested data."""
        cells = self.cells()
        out = keys
        mins = []
        for j in range(CM_DEPTH):
            cj = cells.filter(F.col("j") == j).select(
                F.col("bucket").alias(f"b{j}"),
                F.col("cell_n").alias(f"n{j}"),
            )
            out = out.join(
                F.broadcast(cj),
                _cm_hash(j, F.col(key_col)) == F.col(f"b{j}"),
                "left",
            )
            mins.append(F.coalesce(F.col(f"n{j}"), F.lit(0)))
        return out.select(
            key_col, F.least(*mins).cast("long").alias("cm_estimate")
        )

    def compact(self) -> None:
        """Fold THIS scope's settled partial segments into one
        (batch_id −1) — the maintenance sweep once history fragments.

        Two safety rules (both review-found hazards):

        * only this checkpoint scope's rows fold — another stream
          instance sharing the store keeps its own segments, which its
          replays must still be able to find and replace;
        * the scope's HIGHEST batch_id segment is kept un-folded: it is
          the only batch that can still replay (a crash lands between
          apply and checkpoint commit), and its replay repairs by
          deleting its own (scope, batch_id) segment — folding it away
          would make the delete a no-op and double-count the batch.
          Everything below it is checkpoint-committed and settled."""
        if not self.store.exists(CM_PARTIALS):
            return
        cur = self.store.read(CM_PARTIALS)
        mine = cur.filter(F.col("checkpoint") == self._scope())
        others = cur.filter(F.col("checkpoint") != self._scope())
        last = mine.agg(F.max("batch_id")).first()[0]
        if last is None:
            return
        folded = (
            mine.filter(F.col("batch_id") != last)
            .groupBy("j", "bucket")
            .agg(F.sum("cell_n").cast("long").alias("cell_n"))
            .select(
                F.lit(self._scope()).alias("checkpoint"),
                F.lit(-1).cast("long").alias("batch_id"),
                "j",
                "bucket",
                "cell_n",
            )
        )
        keep_last = mine.filter(F.col("batch_id") == last)
        self.store.overwrite(
            CM_PARTIALS, others.unionByName(folded).unionByName(keep_last)
        )
