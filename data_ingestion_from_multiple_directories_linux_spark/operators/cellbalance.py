"""IVF cell-balance report: occupancy per cell, the retrain trigger.

An IVF index's search cost and recall both ride on the assignment
staying balanced: a cell holding 5× its fair share scans 5× the
candidates per probe (the n/K term), and a drifting corpus (new topics,
new languages) silently concentrates into few cells until the index is
retrained. The number a deployment watches is per-cell occupancy
against the perfectly-balanced baseline — this module computes it, as
one shared function consumed by BOTH surfaces:

* the registered batch query ``ivf_cell_balance`` (the trained
  assignment every IVF query shares — oracle replays training,
  assignment, and the occupancy arithmetic exactly);
* the streaming maintainer's report
  (:meth:`streaming.ivf_stream.StreamingIvfIndex.cell_balance`) over
  the merged per-batch assignment segments — the continuously-updated
  form whose max imbalance IS the retrain trigger.

``imbalance_permille`` = 1000 · n_vecs · K / total — 1000 means the
cell holds exactly its fair share; the max over cells is the trigger
(e.g. retrain at >3000: some cell 3× overloaded). Integer floor
arithmetic throughout, so the DuckDB oracle matches bit-for-bit.

Scale shape: one groupBy over the assignment (map-side combinable
count), a 1-row total scalar broadcast back onto the ≤K-row occupancy
frame — the kmv/tf_idf allowlisted pattern. Never corpus-sized after
the first aggregate.

Reference parity: none; SURVEY §2.12a additive (L172).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query
from .similarity import (
    _assign_cells,
    _ivf_train_assign_ctes,
    _trained_centroids,
    _vec_corpus,
)


def cell_occupancy(assigned: DataFrame) -> DataFrame:
    """(cell, n_vecs, share_permille, imbalance_permille) from an
    (…, cell) assignment frame. The occupancy frame is ≤K rows —
    checkpointed so its two consumers (the total scalar and the final
    projection) don't re-aggregate the assignment."""
    occ = (
        assigned.groupBy("cell")
        .agg(F.count("*").cast("long").alias("n_vecs"))
        .localCheckpoint(eager=True)
    )
    tot = occ.agg(
        F.sum("n_vecs").cast("long").alias("total"),
        F.count("*").cast("long").alias("n_cells"),
    )
    return occ.crossJoin(F.broadcast(tot)).select(
        "cell",
        "n_vecs",
        F.expr("CAST((1000 * n_vecs) DIV total AS BIGINT)").alias(
            "share_permille"
        ),
        F.expr("CAST((1000 * n_vecs * n_cells) DIV total AS BIGINT)").alias(
            "imbalance_permille"
        ),
    )


@query(
    "ivf_cell_balance",
    oracle=f"""
    {_ivf_train_assign_ctes()},
    occ AS (
        SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs
        FROM assigned GROUP BY cell
    ),
    tot AS (
        SELECT CAST(SUM(n_vecs) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_cells
        FROM occ
    )
    SELECT cell, n_vecs,
           CAST((1000 * n_vecs) // t.total AS BIGINT) AS share_permille,
           CAST((1000 * n_vecs * t.n_cells) // t.total AS BIGINT)
               AS imbalance_permille
    FROM occ, tot t
    """,
)
def ivf_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Occupancy of every trained-IVF cell over the shared vector
    corpus: (cell, n_vecs, share_permille, imbalance_permille). The
    max imbalance is the retrain trigger a production deployment
    alerts on; the streaming maintainer serves the same report from
    its merged assignment segments (streaming/ivf_stream.py)."""
    corpus = _vec_corpus(spark, sf_dir)
    centroids = _trained_centroids(spark, sf_dir)
    return cell_occupancy(_assign_cells(corpus, centroids))
