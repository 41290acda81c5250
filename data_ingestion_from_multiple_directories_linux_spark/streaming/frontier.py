"""Streaming crawl-frontier dedup: canonicalize → Bloom → exact rescue
(SURVEY.md §2.12a L140).

The batch pieces exist separately — URL canonicalization (L134, the
dedup prologue), the mergeable persisted Bloom filter (L128), and the
canonicalize-then-bloom composition pin (tests/test_llm_pipeline.py).
This module runs the composition where a crawler actually needs it: a
CONTINUOUS stream of discovered URLs, where each micro-batch must emit
only resources never seen in ANY earlier batch, across raw spellings,
crash-replays and checkpoint restarts.

Per micro-batch (foreachBatch, availableNow ≙ the reference's cron
tick):

1. **canonicalize** raw URLs and keep one row per canonical key
   (min doc_id — the exact-dedup keeper convention) — respellings of
   one resource inside the batch collapse here;
2. **Bloom probe** against the persisted bit table: negatives are
   PROVABLY new (the filter has no false negatives) and emit without
   touching any corpus-sized state;
3. **exact rescue** for the positives: a Bloom hit is either a true
   dup or a false positive, so positives — alone — pay an anti-join
   against the emitted-output table (the L128 "positives alone pay
   the verify shuffle" rule). A crawl frontier that skipped this would
   silently drop one-in-(FP-rate) genuinely-new pages forever;
4. **state append**: the batch's new canonical keys land in the
   output table, and their bits APPEND to the filter (bloom_bits is
   mergeable by union — no read-modify-write of a bitmap).

Idempotency under foreachBatch's at-least-once contract: output rows
are keyed by (checkpoint scope, batch_id) and a replayed batch
purges-then-rewrites its own rows (the stream_ingest audit device);
the rescue join reads the output table WITHOUT the replaying batch's
own rows, so a replay re-derives exactly the same emission even though
its keys are already in the filter (they all probe positive and all
get rescued). Duplicate bit appends are harmless by the filter's
union-merge law.

At 100 TB: the filter is the only broadcast state (one array row, the
L128 sizing/sharding notes apply); the exact-rescue join is bounded by
the Bloom-positive count, not the stream volume; everything else is
map-only per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bloomdedup import bloom_bits, probe_bloom
from ..operators.urlnorm import url_canonicalize
from ..sources.table_store import TableStore

#: emitted-frontier table: one row per first-seen canonical resource.
FRONTIER_OUT = "crawl_frontier_out"
#: persisted filter bits for the frontier (separate from the batch
#: operator's table — a different seen-set).
FRONTIER_BITS = "crawl_frontier_bits"


class StreamingCrawlFrontier:
    """Maintain a first-seen-only crawl frontier over a JSON file
    stream of (doc_id, url) discovery records."""

    def __init__(
        self,
        spark: SparkSession,
        store: TableStore,
        source_dir: str,
        checkpoint_dir: str,
        schema: str = "doc_id bigint, url string",
    ) -> None:
        self.spark = spark
        self.store = store
        self.source_dir = source_dir
        self.checkpoint_dir = checkpoint_dir
        self.schema = schema

    def _scope(self) -> str:
        # batch ids restart at 0 when a checkpoint is cleared — scope
        # state rows by checkpoint path (the stream-identity device
        # shared with StreamingIngestion / StreamingCountMin)
        return self.checkpoint_dir

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        canon = (
            batch_df.filter(F.col("url").isNotNull())
            .select("doc_id", url_canonicalize("url").alias("url"))
            .groupBy("url")
            .agg(F.min("doc_id").cast("long").alias("doc_id"))
        )

        if self.store.exists(FRONTIER_BITS):
            bits = self.store.read(FRONTIER_BITS)
        else:
            bits = self.spark.createDataFrame([], "bit bigint")
        probed = probe_bloom(canon, bits)
        negatives = probed.filter(~F.col("hit")).select("url", "doc_id")
        positives = probed.filter(F.col("hit")).select("url", "doc_id")

        # exact rescue: positives not in the emitted table (excluding a
        # replaying batch's own rows) are Bloom false positives
        if self.store.exists(FRONTIER_OUT):
            prior = self.store.read(FRONTIER_OUT).filter(
                ~(
                    (F.col("checkpoint") == self._scope())
                    & (F.col("batch_id") == int(batch_id))
                )
            )
            rescued = positives.join(
                prior.select("url").distinct(), "url", "left_anti"
            )
        else:
            prior = None
            rescued = positives

        new = negatives.unionByName(rescued).select(
            F.lit(self._scope()).alias("checkpoint"),
            F.lit(int(batch_id)).cast("long").alias("batch_id"),
            "url",
            "doc_id",
        )
        # materialize before writing: ``new`` derives from the CURRENT
        # output-table files via the rescue join, and the overwrite
        # below swaps those files out — a lazy plan evaluated after the
        # swap (the bits append) would read deleted parquet. One batch's
        # emissions are small; the checkpoint also means the rescue join
        # runs once, not once per consumer.
        new = new.localCheckpoint(eager=True)

        # purge-then-rewrite this batch's own output rows (idempotent
        # replay), append everything else untouched
        if prior is not None:
            self.store.overwrite(FRONTIER_OUT, prior.unionByName(new))
        else:
            self.store.overwrite(FRONTIER_OUT, new)

        # append the new keys' bits — duplicate appends are harmless
        # (bloom_bits merges by union), so no replay guard is needed
        self.store.append(FRONTIER_BITS, bloom_bits(new.select("url")))

    def run_available_now(self) -> None:
        q = (
            self.spark.readStream.format("json")
            .schema(self.schema)
            .load(self.source_dir)
            .writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def frontier(self) -> DataFrame:
        """Every first-seen canonical resource emitted so far:
        (url, doc_id, batch_id)."""
        return self.store.read(FRONTIER_OUT).select(
            "url", "doc_id", "batch_id"
        )
