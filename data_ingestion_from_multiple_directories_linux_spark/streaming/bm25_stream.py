"""Streaming BM25 index maintenance: the persisted inverted index kept
current per micro-batch, queries served from the merged segments.

The batch query (operators/retrieval.py ``bm25_topk``) tokenizes the
corpus into a (doc_id, term, tf) inverted index and scores from it. A
crawl stream should never re-tokenize history to refresh that index:
tf rows are pure partial counts over disjoint document slices, so each
micro-batch contributes its own index SEGMENT — keyed by (checkpoint
scope, batch_id), purge-then-rewritten on replay (the drift-monitor /
segment-sketch discipline) — and the serving path reads the merged
segments through THE SAME ``bm25_scored_from_index`` the batch query
uses (one scorer, two surfaces; the incremental-MinHash band-index
precedent, dedup.py).

A per-segment doc-count cell rides alongside the tf rows: token-less
documents carry no index rows but still shift idf's N and the
dl·N/n_tok normalization, so the corpus document count cannot be
recovered from the index itself.

Contract: cross-batch document identity is UPSTREAM's job (the crawl
frontier emits each canonical resource exactly once — L140); this
maintainer guarantees replay idempotency per batch, not cross-batch
dedup. Segments merge by addition (SUM per (doc_id, term)), the same
law the drift cells follow.

At 100 TB: each batch tokenizes only its own documents; the segment
table is append-shaped and :meth:`StreamingBM25Index.compact` folds
settled segments on the count-min partials' cadence (scope-isolated,
highest batch kept un-folded for replay repair — sketch_stream's two
safety rules); serving cost is the batch scorer's (index probe bounded
by query terms — never a corpus rescan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators.retrieval import (
    TOP_K,
    bm25_scored_from_index,
    build_tf_index,
)
from ..sources.table_store import TableStore

#: per-batch index segments: (checkpoint, batch_id, doc_id, term, tf).
BM25_TF_PARTIALS = "bm25_tf_partials"
BM25_TF_DDL = (
    "checkpoint string, batch_id bigint, doc_id bigint, term string, tf bigint"
)
#: per-batch document-count cells (token-less docs included).
BM25_DOC_PARTIALS = "bm25_doc_partials"
BM25_DOC_DDL = "checkpoint string, batch_id bigint, n_docs bigint"


class StreamingBM25Index:
    """Maintain the BM25 inverted index over a JSON document stream
    (availableNow micro-batches, checkpointed) and serve the batch
    ranking from the merged segments."""

    def __init__(
        self,
        spark: SparkSession,
        store: TableStore,
        source_dir: str,
        checkpoint_dir: str,
        schema: str = "doc_id bigint, text string",
    ) -> None:
        self.spark = spark
        self.store = store
        self.source_dir = source_dir
        self.checkpoint_dir = checkpoint_dir
        self.schema = schema

    def _scope(self) -> str:
        # batch ids restart at 0 when a checkpoint is cleared — scope
        # segments by checkpoint path (stream identity, the shared
        # device of every streaming maintainer here)
        return self.checkpoint_dir

    def _merge_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Replace this batch's index segment + doc cell (idempotent)."""
        own = (F.col("checkpoint") == self._scope()) & (
            F.col("batch_id") == int(batch_id)
        )
        key = [
            F.lit(self._scope()).alias("checkpoint"),
            F.lit(int(batch_id)).cast("long").alias("batch_id"),
        ]
        seg = build_tf_index(batch_df.select("doc_id", "text")).select(
            *key, "doc_id", "term", "tf"
        )
        cell = batch_df.select(
            *key, F.count("*").cast("long").alias("n_docs")
        )
        for table, part in ((BM25_TF_PARTIALS, seg), (BM25_DOC_PARTIALS, cell)):
            if self.store.exists(table):
                kept = self.store.read(table).filter(~own)
                self.store.overwrite(table, kept.unionByName(part))
            else:
                self.store.overwrite(table, part)

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

    def compact(self) -> None:
        """Fold THIS scope's settled index segments into one
        (batch_id −1) segment per table — the maintenance sweep once
        history fragments. tf rows merge by SUM per (doc_id, term) and
        doc cells by SUM (the same union law :meth:`tf`/:meth:`n_docs`
        apply on read, so serving output is bit-identical before and
        after — pytest-pinned). Safety rules shared with
        ``StreamingCountMin.compact``: only this checkpoint scope's
        rows fold, and the scope's HIGHEST batch_id segment stays
        un-folded — it is the only batch that can still crash-replay,
        and its replay repairs by purging its own (scope, batch_id)
        rows, which folding away would break."""
        plans = (
            (BM25_TF_PARTIALS, ["doc_id", "term"], "tf"),
            (BM25_DOC_PARTIALS, [], "n_docs"),
        )
        for table, keys, val in plans:
            if not self.store.exists(table):
                continue
            cur = self.store.read(table)
            mine = cur.filter(F.col("checkpoint") == self._scope())
            others = cur.filter(F.col("checkpoint") != self._scope())
            last = mine.agg(F.max("batch_id")).first()[0]
            if last is None:
                continue
            folded = (
                mine.filter(F.col("batch_id") != last)
                .groupBy(*keys)
                .agg(F.sum(val).cast("long").alias(val))
                # groupBy() over zero settled rows yields one NULL row
                .filter(F.col(val).isNotNull())
                .select(
                    F.lit(self._scope()).alias("checkpoint"),
                    F.lit(-1).cast("long").alias("batch_id"),
                    *keys,
                    val,
                )
            )
            keep_last = mine.filter(F.col("batch_id") == last)
            self.store.overwrite(
                table, others.unionByName(folded).unionByName(keep_last)
            )

    def tf(self) -> DataFrame:
        """Merged (doc_id, term, tf) index over everything ingested."""
        return (
            self.store.read_or_empty(BM25_TF_PARTIALS, BM25_TF_DDL)
            .groupBy("doc_id", "term")
            .agg(F.sum("tf").cast("long").alias("tf"))
        )

    def n_docs(self) -> DataFrame:
        """1-row (n_docs) frame — token-less documents included."""
        return self.store.read_or_empty(
            BM25_DOC_PARTIALS, BM25_DOC_DDL
        ).select(
            F.coalesce(F.sum("n_docs"), F.lit(0)).cast("long").alias("n_docs")
        )

    def topk(self) -> DataFrame:
        """The bm25_topk ranking served from the streamed index — the
        SAME scorer and window the registered batch query runs, so the
        two surfaces cannot disagree on the same corpus.

        The scorer persists the merged tf frame it probes (5 internal
        consumers); this maintainer is LONG-LIVED, so that cache is
        scoped to THIS call — materialize the (top-K-sized) ranking,
        then release the frame — or every serve/refresh would leak one
        corpus-sized cached index (the drift-monitor ``drift()``
        discipline)."""
        tf = self.tf()
        scored = bm25_scored_from_index(tf, self.n_docs())
        rn = F.row_number().over(
            W.partitionBy("query_id").orderBy(
                F.desc("bm25_micro"), F.asc("doc_id")
            )
        )
        ranked = (
            scored.withColumn("rank", rn.cast("long"))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "doc_id", "bm25_micro", "n_terms_hit", "rank")
        )
        try:
            # the scorer persisted THIS tf plan object (persist()
            # returns self), so the handle releases the scorer's cache
            return ranked.localCheckpoint(eager=True)
        finally:
            tf.unpersist()
