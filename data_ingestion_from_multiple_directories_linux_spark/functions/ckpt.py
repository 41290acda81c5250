"""Block cleanup for iterative localCheckpoint loops.

``DataFrame.localCheckpoint(eager=True)`` is the correct
lineage-truncation discipline for iterative DataFrame algorithms
(connected components, label propagation): without it the logical plan
grows by one join per round and analysis cost compounds. But the
checkpointed blocks are pinned for the SESSION lifetime —
``DataFrame.unpersist()`` does not reach them (the RDD is persisted
below the DataFrame cache manager; measured on Spark 4.1: the
persistent-RDD count is unchanged after ``unpersist``). An N-round loop
therefore holds N copies of its state table in executor storage — a
genuine OOM vector when the state is a billion-edge table at 100 TB,
and dead weight even locally (a full 156-query sweep leaks ~19 cached
tables without this).

:class:`CheckpointJanitor` frees superseded rounds by unpersisting the
EXACT checkpointed RDD: after ``localCheckpoint`` the frame's analyzed
plan is a ``LogicalRDD`` whose ``rdd()`` is the block-backed RDD, so
the janitor reads its id directly and later drops it through
``SparkContext.getPersistentRDDs`` (the only route PySpark offers to
an RDD persisted below the DataFrame cache manager). Tracking the id —
never a before/after set-diff of the persistent-RDD registry — means a
``persist()`` that happens to register during the checkpoint job (or a
concurrent thread's cache on a shared session) can never be freed by
mistake. Safety of the cycling rests on eagerness: round N+1's blocks
are fully computed before round N's are dropped, and nothing else
references round N (the loop variable is overwritten). The FINAL
round's blocks are never freed — the returned lazy frame reads them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _checkpoint_rdd_id(df: DataFrame) -> int | None:
    """The id of the block-backed RDD under a localCheckpointed frame
    (its analyzed plan is a LogicalRDD), or None when the plan is not
    the direct product of a checkpoint."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getName().endswith(".LogicalRDD"):
            return int(plan.rdd().id())
    except Exception:
        pass
    return None


class CheckpointJanitor:
    """Track and free localCheckpoint block sets in an iterative loop.

    Usage::

        jan = CheckpointJanitor(spark)
        state = jan.checkpoint(initial_df)      # eager ckpt, tracked
        for _ in range(rounds):
            state = jan.checkpoint(step(state)) # frees the PREVIOUS round
        return state                            # final blocks stay live
    """

    def __init__(self, spark: SparkSession) -> None:
        self._jsc = spark.sparkContext._jsc
        self._held: int | None = None

    def checkpoint(self, df: DataFrame) -> DataFrame:
        """Eagerly localCheckpoint ``df``; free the blocks of the
        previous checkpoint taken through this janitor. Returns the
        checkpointed frame."""
        out = df.localCheckpoint(eager=True)
        rid = _checkpoint_rdd_id(out)
        self.release()
        self._held = rid
        return out

    def release(self) -> None:
        """Free the currently-held checkpoint's blocks now (call when
        the tracked frame is superseded by something OUTSIDE the
        janitor, e.g. a fixed point reached before the round limit)."""
        if self._held is None:
            return
        rdd = self._jsc.getPersistentRDDs().get(self._held)
        if rdd is not None:
            rdd.unpersist(False)
        self._held = None

    def detach(self) -> None:
        """Stop tracking WITHOUT freeing — call before returning the
        tracked frame to a caller (its blocks must outlive the loop)."""
        self._held = None
