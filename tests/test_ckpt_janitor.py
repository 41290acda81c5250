"""CheckpointJanitor: superseded localCheckpoint blocks are freed,
kept blocks stay readable — the storage discipline behind the
iterative connected-components loops."""

from __future__ import annotations


def _n_persistent(spark) -> int:
    return len(spark.sparkContext._jsc.getPersistentRDDs())


def test_cycle_frees_previous_round(spark):
    from data_ingestion_from_multiple_directories_linux_spark.functions.ckpt import (
        CheckpointJanitor,
    )

    base = _n_persistent(spark)
    jan = CheckpointJanitor(spark)
    state = jan.checkpoint(spark.range(100).selectExpr("id", "id as lbl"))
    assert _n_persistent(spark) == base + 1
    for _ in range(4):
        state = jan.checkpoint(state.selectExpr("id", "lbl + 1 as lbl"))
        # one state copy held, regardless of round count
        assert _n_persistent(spark) == base + 1
    # the live frame reads its (kept) blocks fine
    assert state.count() == 100
    assert state.agg({"lbl": "min"}).first()[0] == 4
    jan.release()
    assert _n_persistent(spark) == base


def test_detach_keeps_final_blocks(spark):
    from data_ingestion_from_multiple_directories_linux_spark.functions.ckpt import (
        CheckpointJanitor,
    )

    base = _n_persistent(spark)
    jan = CheckpointJanitor(spark)
    final = jan.checkpoint(spark.range(10))
    jan.detach()
    jan.release()  # no-op after detach
    assert _n_persistent(spark) == base + 1
    assert final.count() == 10  # still readable


def test_keep_prev_defers_freeing(spark):
    from data_ingestion_from_multiple_directories_linux_spark.functions.ckpt import (
        CheckpointJanitor,
    )

    base = _n_persistent(spark)
    jan = CheckpointJanitor(spark)
    a = jan.checkpoint(spark.range(5))
    b = jan.checkpoint(a.selectExpr("id * 2 as id"), keep_prev=True)
    assert _n_persistent(spark) == base + 2  # both alive
    assert a.count() == 5 and b.count() == 5
    jan.release()  # frees only the tracked (latest) one
    assert _n_persistent(spark) == base + 1
    assert a.count() == 5


def test_cc_sweep_holds_single_state_copy(spark):
    """End-to-end: a deep chain graph (many propagation rounds) leaves
    exactly ONE persistent state table behind after materialization."""
    from data_ingestion_from_multiple_directories_linux_spark.operators.dedup import (
        connected_components,
    )

    base = _n_persistent(spark)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    out = connected_components(edges, max_iter=40)
    rows = out.collect()
    assert len(rows) == 31
    assert {r["cluster_id"] for r in rows} == {0}
    assert _n_persistent(spark) <= base + 1
