"""IVF near-dup pairs with the production √n cell count (auto-K).

The registered ``embedding_near_dup_ivf`` pins K=N_CENTROIDS=32 so its
DuckDB oracle can replay the Lloyd training byte-for-byte — but the
production rule is K=choose_k(n)≈√n (similarity.choose_k: K balances
the K assignment dots per vector against the n/K candidates per cell,
so total work is minimized and the per-cell quadratic term tracks √n
as the corpus grows). Until round 12 that path was measured only by a
hand-rolled one-off inside bench.py's amplified-corpus section; this
module makes it a REGISTERED query, so the √n rule is continuously
measured by the ordinary bench machinery at every scale point (sf0.01,
sf0.1, and the ~100× amplified corpus via SCALE_OPS) with no special
case.

No oracle: K derives from the corpus count at runtime, which the
fixed-K training CTEs cannot replicate — the driver records the
rows-only check. Correctness of the underlying train/assign/pair
pipeline is carried by the oracle-exact ``embedding_near_dup_ivf``
(identical machinery, pinned K) plus this module's pytest pins
(returned pairs ⊆ exact cosine≥threshold pairs; K == choose_k(n); the
synthetic near-dup offset is corpus-derived).

Scale notes: the synthesized near-dup offset is max(vec_id)+1 — a
corpus-derived 1-row broadcast scalar, never a fixed constant (the
determinism convention; a fixed 10000 collides once the corpus outgrows
it, which is exactly the amplified-corpus case the one-off had to work
around). ``choose_k`` needs one count() job before the plan builds —
the same train-time action every k-means run pays.

Reference parity: none; SURVEY §2.12a additive (L173).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine_q, dot_q, norm_sq_q, to_double_array
from .registry import query
from .similarity import (
    NEAR_DUP_COSINE,
    _assign_cells,
    choose_k,
    load_embeddings,
    train_ivf_centroids,
)


@query("embedding_near_dup_ivf_autok")
def embedding_near_dup_ivf_autok(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(id_a, id_b, cell, cosine, k_cells) — near-duplicate pairs
    (cosine ≥ {NEAR_DUP_COSINE}) via IVF blocking with K=choose_k(n):
    the production auto-K configuration of ``embedding_near_dup_ivf``,
    registered so bench.py measures the √n rule at every scale point
    through the ordinary query path. ``k_cells`` records the chosen K
    in the output."""
    e = load_embeddings(spark, sf_dir).select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    # corpus-derived synth offset (never a fixed constant): planted
    # near-dups at max(vec_id)+1 + vec_id can't collide at any scale
    off = e.agg(
        (F.coalesce(F.max("vec_id"), F.lit(0)) + 1).alias("__off")
    )
    mut = (
        e.filter(F.col("vec_id") % 5 == 0)
        .crossJoin(F.broadcast(off))
        .select(
            (F.col("vec_id") + F.col("__off")).alias("vec_id"),
            F.transform(
                "v", lambda x, i: x + F.lit(0.02) * (i % 7 - 3).cast("double")
            ).alias("v"),
        )
    )
    corpus = e.unionByName(mut).withColumn("nv", norm_sq_q("v"))
    k = choose_k(corpus.count())
    base = e.withColumn("nv", norm_sq_q("v"))
    cent = train_ivf_centroids(base, k=k)
    # assigned feeds both sides of the pair join — persist so the
    # assignment chain (K cosines per vector + argmax) runs once
    assigned = _assign_cells(corpus, cent).persist()

    a = assigned.select(
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("nv").alias("na"),
        "cell",
    )
    b = assigned.select(
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("nv").alias("nb"),
        F.col("cell").alias("cell_b"),
    )
    cos = cosine_q(dot_q("va", "vb"), F.col("na"), F.col("nb"))
    return (
        a.join(
            b,
            (F.col("cell") == F.col("cell_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b", "cell", cos.alias("cosine"))
        .filter(F.col("cosine") >= NEAR_DUP_COSINE)
        .withColumn("k_cells", F.lit(k).cast("long"))
    )
