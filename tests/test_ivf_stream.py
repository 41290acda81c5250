"""Streaming IVF assignment maintainer (streaming/ivf_stream.py, L172)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from data_ingestion_from_multiple_directories_linux_spark.operators.cellbalance import (
    ivf_cell_balance,
)
from data_ingestion_from_multiple_directories_linux_spark.operators.similarity import (
    _assign_cells,
    _trained_centroids,
    _vec_corpus,
    ivf_topk_neighbors,
    load_ivf_centroids,
    save_ivf_centroids,
)
from data_ingestion_from_multiple_directories_linux_spark.sources.table_store import (
    TableStore,
)
from data_ingestion_from_multiple_directories_linux_spark.streaming.ivf_stream import (
    StreamingIvfIndex,
)

SF = "/root/testdata/sf0.001"
CENT = "_test_ivf_stream_centroids"


def _setup(spark, tmp_path, waves):
    """Persist the trained centroids, write the shared vector corpus as
    JSON waves, return a ready maintainer."""
    store = TableStore(spark, str(tmp_path / "wh"))
    save_ivf_centroids(store, CENT, _trained_centroids(spark, SF))

    src = tmp_path / "src"
    src.mkdir()
    rows = _vec_corpus(spark, SF).select("vec_id", "v").collect()
    for name, pred in waves:
        with open(os.path.join(str(src), name), "w") as f:
            for r in rows:
                if pred(r["vec_id"]):
                    f.write(
                        json.dumps(
                            {
                                "vec_id": r["vec_id"],
                                "embedding": [float(x) for x in r["v"]],
                            }
                        )
                        + "\n"
                    )
    return StreamingIvfIndex(
        spark, store, str(src), str(tmp_path / "ck"), CENT
    )


def _one_shot(spark, store):
    """The batch assignment over the same corpus and the SAME persisted
    centroids the stream loads."""
    return _assign_cells(
        _vec_corpus(spark, SF), load_ivf_centroids(store, CENT)
    )


def test_two_wave_ingest_equals_one_shot_assignment(spark, tmp_path):
    """Assignment is a pure function of (vector, persisted centroids):
    streaming the corpus in two waves must produce the byte-identical
    (vec_id, nv, cell) set as one batch assignment — batch boundaries
    can never move a vector's cell."""
    fr = _setup(
        spark,
        tmp_path,
        [("w1.json", lambda i: i % 2 == 0), ("w2.json", lambda i: i % 2 == 1)],
    )
    fr.run_available_now()

    got = {
        (r["vec_id"], r["nv"], r["cell"]) for r in fr.assigned().collect()
    }
    want = {
        (r["vec_id"], r["nv"], r["cell"])
        for r in _one_shot(spark, fr.store).collect()
    }
    assert got == want and got


def test_replay_is_idempotent_and_gate_filters(spark, tmp_path):
    """foreachBatch at-least-once: re-processing a batch with the same
    batch_id leaves the merged assignment byte-identical (purge-then-
    rewrite). Malformed vectors (wrong dim) never enter a segment."""
    fr = _setup(spark, tmp_path, [("w1.json", lambda i: True)])
    # one malformed vector rides wave 1 — the gate must drop it
    with open(os.path.join(fr.source_dir, "w1.json"), "a") as f:
        f.write(json.dumps({"vec_id": 999999, "embedding": [1.0, 2.0]}) + "\n")
    fr.run_available_now()

    before = sorted(
        (r["vec_id"], r["nv"], r["cell"]) for r in fr.assigned().collect()
    )
    assert all(v != 999999 for v, _, _ in before)

    # manual replay of batch 0 with the same payload (the crash-replay
    # shape foreachBatch delivers)
    replay = fr.spark.read.schema(fr.schema).json(fr.source_dir)
    fr._assign_batch(replay, 0)
    after = sorted(
        (r["vec_id"], r["nv"], r["cell"]) for r in fr.assigned().collect()
    )
    assert after == before


def test_served_topk_equals_registered_batch_query(spark, tmp_path):
    """One-scorer-two-surfaces, enforced by equality: the maintainer's
    topk() over the streamed assignment must equal the registered
    ivf_topk_neighbors query over the same corpus (the in-session
    trained centroids round-trip the store bit-identically)."""
    fr = _setup(
        spark,
        tmp_path,
        [("w1.json", lambda i: i % 3 == 0), ("w2.json", lambda i: i % 3 != 0)],
    )
    fr.run_available_now()

    got = {
        (r["query_id"], r["neighbor_id"], r["rank"], r["cosine"])
        for r in fr.topk().collect()
    }
    want = {
        (r["query_id"], r["neighbor_id"], r["rank"], r["cosine"])
        for r in ivf_topk_neighbors(spark, SF).collect()
    }
    assert got == want and got


def test_cell_balance_matches_registered_report(spark, tmp_path):
    """The streamed cell-balance report (the retrain trigger) must
    equal the oracle-checked ivf_cell_balance query over the same
    corpus, and its totals must account for every ingested vector."""
    fr = _setup(
        spark,
        tmp_path,
        [("w1.json", lambda i: i % 2 == 0), ("w2.json", lambda i: i % 2 == 1)],
    )
    fr.run_available_now()

    got = sorted(map(tuple, fr.cell_balance().collect()))
    want = sorted(map(tuple, ivf_cell_balance(spark, SF).collect()))
    assert got == want and got

    n_total = fr.assigned().count()
    assert sum(r[1] for r in got) == n_total
    # the report is informative: some cell is over its fair share
    assert max(r[3] for r in got) > 1000
    bal = fr.cell_balance()
    assert bal.columns == [
        "cell",
        "n_vecs",
        "share_permille",
        "imbalance_permille",
    ]


def test_checkpoint_skips_processed_files(spark, tmp_path):
    """availableNow + checkpoint: a second run with no new files adds
    nothing; a new file afterwards lands as a new segment."""
    fr = _setup(spark, tmp_path, [("w1.json", lambda i: i % 2 == 0)])
    fr.run_available_now()
    n1 = fr.assigned().count()
    fr.run_available_now()  # no new files
    assert fr.assigned().count() == n1

    rows = _vec_corpus(spark, SF).select("vec_id", "v").collect()
    with open(os.path.join(fr.source_dir, "w2.json"), "w") as f:
        for r in rows:
            if r["vec_id"] % 2 == 1:
                f.write(
                    json.dumps(
                        {
                            "vec_id": r["vec_id"],
                            "embedding": [float(x) for x in r["v"]],
                        }
                    )
                    + "\n"
                )
    fr.run_available_now()
    assert fr.assigned().count() == len(rows)
    assert (
        fr.store.read("ivf_assign_segments")
        .select("batch_id")
        .distinct()
        .count()
        == 2
    )


def test_retrain_trigger_fires_on_drift_and_rebalances(spark, tmp_path):
    """The complete drift->retrain->cutover lifecycle: a planted drift
    cluster (a tight bundle of vectors unlike the training corpus)
    concentrates into few cells and trips the imbalance trigger;
    retrain_if_drifted retrains on the merged corpus (auto-K), swaps
    the centroids generation, rebuilds every segment with its
    (checkpoint, batch_id) key preserved, strictly reduces the max
    imbalance, and serving continues against the new generation."""
    fr = _setup(spark, tmp_path, [("w1.json", lambda i: True)])
    fr.run_available_now()

    # below-threshold: no retrain, centroids untouched
    cent_before = sorted(
        map(tuple, load_ivf_centroids(fr.store, CENT).collect())
    )
    assert fr.retrain_if_drifted(threshold_permille=10**9) is False
    assert (
        sorted(map(tuple, load_ivf_centroids(fr.store, CENT).collect()))
        == cent_before
    )

    # wave 2: a drift cluster — 300 near-identical vectors far from the
    # base distribution, all landing in one Voronoi cell
    with open(os.path.join(fr.source_dir, "w2.json"), "w") as f:
        for i in range(300):
            v = [50.0 + 0.001 * i] + [0.0] * 63
            f.write(
                json.dumps({"vec_id": 1_000_000 + i, "embedding": v}) + "\n"
            )
    fr.run_available_now()

    before = fr.max_imbalance_permille()
    n_before = fr.assigned().count()
    keys_before = sorted(
        (r["checkpoint"], r["batch_id"], r["vec_id"])
        for r in fr.store.read("ivf_assign_segments").collect()
    )
    assert before > 3000  # the cluster tripped the trigger

    assert fr.retrain_if_drifted(threshold_permille=3000) is True
    after = fr.max_imbalance_permille()
    assert after < before  # retrain strictly rebalanced
    # rebuild preserved every row and its replay key
    assert fr.assigned().count() == n_before
    keys_after = sorted(
        (r["checkpoint"], r["batch_id"], r["vec_id"])
        for r in fr.store.read("ivf_assign_segments").collect()
    )
    assert keys_after == keys_before
    # serving continues against the new generation
    assert fr.topk().count() > 0


def test_compact_folds_settled_segments_preserving_everything(spark, tmp_path):
    """compact() folds settled segments into batch_id -1 while the
    merged assignment (and so serving + the balance report) stays
    row-identical, the highest batch stays un-folded so its replay
    still repairs, and foreign checkpoint scopes are untouched."""
    fr = _setup(spark, tmp_path, [("w1.json", lambda i: i % 3 == 0)])
    fr.run_available_now()
    rows = _vec_corpus(spark, SF).select("vec_id", "v").collect()
    for k, name in ((1, "w2.json"), (2, "w3.json")):
        with open(os.path.join(fr.source_dir, name), "w") as f:
            for r in rows:
                if r["vec_id"] % 3 == k:
                    f.write(
                        json.dumps(
                            {
                                "vec_id": r["vec_id"],
                                "embedding": [float(x) for x in r["v"]],
                            }
                        )
                        + "\n"
                    )
        fr.run_available_now()
    before = sorted(
        (r["vec_id"], r["nv"], r["cell"]) for r in fr.assigned().collect()
    )
    # a foreign scope's segment rides the same table — compact must not
    # touch it (another instance's replays still need to find it)
    foreign = (
        fr.store.read("ivf_assign_segments")
        .limit(1)
        .select(
            F.lit("other-ckpt").alias("checkpoint"),
            F.lit(7).cast("long").alias("batch_id"),
            F.lit(-12345).cast("long").alias("vec_id"),
            "v",
            "nv",
            "cell",
        )
    )
    fr.store.append("ivf_assign_segments", foreign)

    fr.compact()
    seg = fr.store.read("ivf_assign_segments")
    mine = seg.filter(F.col("checkpoint") == fr.checkpoint_dir)
    assert {
        r["batch_id"] for r in mine.select("batch_id").distinct().collect()
    } == {-1, 2}
    assert sorted(
        (r["vec_id"], r["nv"], r["cell"])
        for r in mine.collect()
    ) == before
    other = seg.filter(F.col("checkpoint") == "other-ckpt").collect()
    assert len(other) == 1 and other[0]["batch_id"] == 7

    # the kept (highest) batch still crash-replays as a no-op
    replay = fr.spark.read.schema(fr.schema).json(
        os.path.join(fr.source_dir, "w3.json")
    )
    fr._assign_batch(replay, 2)
    mine2 = fr.store.read("ivf_assign_segments").filter(
        F.col("checkpoint") == fr.checkpoint_dir
    )
    assert sorted(
        (r["vec_id"], r["nv"], r["cell"]) for r in mine2.collect()
    ) == before
