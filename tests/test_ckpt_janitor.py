"""CheckpointJanitor: superseded localCheckpoint blocks are freed,
kept blocks stay readable — the storage discipline behind the
iterative connected-components loops.

Assertions count NEWLY-REGISTERED persistent RDD ids relative to a
baseline snapshot, never the global count: on the shared test session,
Spark's ContextCleaner asynchronously unpersists RDDs whose Python
references earlier tests dropped, so a global count can shrink mid-test
(observed once as a full-suite-only flake). Foreign REMOVALS are
invisible to a new-ids set; foreign ADDS cannot happen because the
suite runs tests serially within the process.
"""

from __future__ import annotations


def _persistent_ids(spark) -> set[int]:
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def _new_ids(spark, base: set[int]) -> set[int]:
    return _persistent_ids(spark) - base


def test_cycle_frees_previous_round(spark):
    from data_ingestion_from_multiple_directories_linux_spark.functions.ckpt import (
        CheckpointJanitor,
    )

    base = _persistent_ids(spark)
    jan = CheckpointJanitor(spark)
    state = jan.checkpoint(spark.range(100).selectExpr("id", "id as lbl"))
    assert len(_new_ids(spark, base)) == 1
    for _ in range(4):
        state = jan.checkpoint(state.selectExpr("id", "lbl + 1 as lbl"))
        # one state copy held, regardless of round count
        assert len(_new_ids(spark, base)) == 1
    # the live frame reads its (kept) blocks fine
    assert state.count() == 100
    assert state.agg({"lbl": "min"}).first()[0] == 4
    jan.release()
    assert not _new_ids(spark, base)


def test_detach_keeps_final_blocks(spark):
    from data_ingestion_from_multiple_directories_linux_spark.functions.ckpt import (
        CheckpointJanitor,
    )

    base = _persistent_ids(spark)
    jan = CheckpointJanitor(spark)
    final = jan.checkpoint(spark.range(10))
    jan.detach()
    jan.release()  # no-op after detach
    assert len(_new_ids(spark, base)) == 1
    assert final.count() == 10  # still readable
    final.unpersist(True)


def test_janitor_never_frees_foreign_persists(spark):
    """The review-found hazard, pinned: a persist() whose cache RDD
    registers DURING the checkpoint's eager job (or any concurrent
    cache on a shared session) must NOT be freed by the janitor — only
    the exact checkpointed RDD is tracked."""
    from pyspark import StorageLevel

    from data_ingestion_from_multiple_directories_linux_spark.functions.ckpt import (
        CheckpointJanitor,
    )

    base = _persistent_ids(spark)
    jan = CheckpointJanitor(spark)
    side = spark.range(1000).selectExpr("id % 7 as k").persist(
        StorageLevel.MEMORY_ONLY
    )
    # first checkpoint's eager job materializes `side` too — its cache
    # registers inside the checkpoint window
    state = jan.checkpoint(side.groupBy("k").count())
    for _ in range(3):
        state = jan.checkpoint(
            state.join(side.groupBy("k").count().withColumnRenamed("count", "c2"), "k")
            .select("k", "count")
        )
    # side's cache survived every cycle: rows come back instantly from
    # cache and the registry still holds it plus exactly one checkpoint
    assert side.count() == 1000
    assert len(_new_ids(spark, base)) == 2  # side + current round
    jan.release()
    side.unpersist(True)
    assert not _new_ids(spark, base)


def test_cc_sweep_holds_single_state_copy(spark):
    """End-to-end: a deep chain graph (many propagation rounds) leaves
    exactly ONE persistent state table behind after materialization."""
    from data_ingestion_from_multiple_directories_linux_spark.operators.dedup import (
        connected_components,
    )

    base = _persistent_ids(spark)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    out = connected_components(edges, max_iter=40)
    rows = out.collect()
    assert len(rows) == 31
    assert {r["cluster_id"] for r in rows} == {0}
    assert len(_new_ids(spark, base)) <= 1
