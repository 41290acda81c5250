"""Fixed-SIZE deterministic anchor sampling for recall evaluations.

A recall audit's exact ground-truth arm costs O(anchors × corpus): if
anchors are a fixed *fraction* of the corpus (the old
``vec_id % TOPK_QUERY_MOD == 0`` rule) the audit is O(corpus²/mod) and
stops being runnable long before 100 TB. The production pattern is a
fixed *count*: sample N anchor queries deterministically, so the audit
costs O(N · corpus) — linear in the corpus — at any scale. This module
holds that sampler, shared by ``ivf_recall_eval`` /
``ivf_recall_eval_nprobe2`` (operators/annrecall.py) and
``matryoshka_recall_eval`` (operators/matryoshka.py).

Selection rule: the ``ANCHOR_COUNT`` ids whose ``md5(CAST(id AS
VARCHAR))`` hex sorts lowest (id tiebreak) — the same
deterministic-hash-order convention as ``stratified_sample_exact``
(operators/stratified.py) and the IVF training sample
(similarity.TRAIN_SAMPLE_BELOW), so both engines derive the identical
anchor set with no RNG and no dependence on row order. Spark plans it
as a ``TakeOrderedAndProject`` (distributed partial top-N, no global
exchange); the anchor frame is then broadcast back onto one corpus
scan.

Reference parity: none (shared machinery for SURVEY §2.12a
L168/L170/L170b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: anchor queries per recall audit — FIXED, not a corpus fraction, so
#: the exact ground-truth arm is O(ANCHOR_COUNT · corpus) at any scale.
ANCHOR_COUNT = 20


def anchor_vec_ids(corpus: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """The ``ANCHOR_COUNT`` md5-lowest ids of ``corpus`` — a bounded
    (≤ANCHOR_COUNT-row) single-column frame, planned as a distributed
    TakeOrderedAndProject. Callers broadcast-join it back onto the
    corpus to recover the anchor vectors."""
    h = F.md5(F.col(id_col).cast("string").cast("binary"))
    return corpus.select(id_col).orderBy(h, F.col(id_col)).limit(ANCHOR_COUNT)


def sql_anchor_cte(src: str, id_col: str = "vec_id") -> str:
    """DuckDB twin of :func:`anchor_vec_ids` as a CTE body (no name):
    ``SELECT {id_col} FROM {src} ORDER BY md5 hex, id LIMIT N``."""
    return (
        f"SELECT {id_col} FROM {src} "
        f"ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col} "
        f"LIMIT {ANCHOR_COUNT}"
    )
