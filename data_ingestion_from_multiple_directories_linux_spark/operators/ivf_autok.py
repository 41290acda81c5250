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

Oracle (round-13, closing VERDICT r12 item 3 — this was the one
registered query without a DuckDB replay): K is not a literal the SQL
could pin, but it IS a deterministic function of the corpus — so the
oracle computes it too. A ``kval`` CTE takes the corpus count, an
exact integer sqrt (floor(sqrt(n)) as double, corrected ±1 against
n — byte-equal to ``math.isqrt`` for any n this engine can count),
and the same min/max clamps as :func:`similarity.choose_k`; the seed
CTE's ``rn <= K`` and the emitted ``k_cells`` read it as a scalar
subquery. The corpus-derived mutant offset (max(vec_id)+1) is likewise
a scalar subquery. Everything else reuses the fixed-K twin's proven
CTE builders verbatim.

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

from ..functions.vectors import (
    cosine_q,
    dot_q,
    norm_sq_q,
    sql_cosine_q,
    sql_dot_q,
    sql_norm_sq_q,
    to_double_array,
)
from .registry import query
from .similarity import (
    E_SQL,
    LLOYD_ROUNDS,
    NEAR_DUP_COSINE,
    TRAIN_SAMPLE_BELOW,
    _assign_cells,
    _sql_assign,
    _sql_lloyd_update,
    _trained_centroids,
    choose_k,
    load_embeddings,
)


def _autok_oracle_sql() -> str:
    """The fixed-K IVF oracle with K and the mutant offset computed from
    the data instead of pinned: ``kval`` replays ``choose_k`` (clamped
    exact isqrt of the corpus count), ``off`` replays max(vec_id)+1."""
    train = []
    cent = "cent0"
    for r in range(LLOYD_ROUNDS):
        train.append(_sql_assign(cent, "base", f"tassign{r}"))
        cent = f"cent{r + 1}"
        train.append(_sql_lloyd_update(f"tassign{r}", cent))
    train_ctes = ",".join(train)
    return f"""
    WITH e AS ({E_SQL}),
    off AS (SELECT COALESCE(MAX(vec_id), 0) + 1 AS o FROM e),
    corpus AS (
        SELECT vec_id, v, {sql_norm_sq_q('v')} AS nv FROM (
            SELECT vec_id, v FROM e
            UNION ALL
            SELECT e.vec_id + off.o AS vec_id,
                   list_transform(range(len(v)),
                                  i -> v[i+1] + CAST(0.02 AS DOUBLE) * ((i % 7) - 3)) AS v
            FROM e, off WHERE e.vec_id % 5 = 0
        )
    ),
    kval AS (
        SELECT GREATEST(8, LEAST(65536,
                   CASE WHEN (r + 1) * (r + 1) <= n THEN r + 1
                        WHEN r * r > n THEN r - 1
                        ELSE r END)) AS k
        FROM (SELECT n, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS r
              FROM (SELECT COUNT(*) AS n FROM corpus))
    ),
    base AS (
        SELECT vec_id, v, {sql_norm_sq_q('v')} AS nv FROM e
        WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) < '{TRAIN_SAMPLE_BELOW}'
    ),
    cent0 AS (
        SELECT rn - 1 AS cid, v AS cv, nv AS ncv FROM (
            SELECT v, nv,
                   ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                      vec_id) AS rn
            FROM base)
        WHERE rn <= (SELECT k FROM kval)
    ),
    {train_ctes},
    {_sql_assign(cent, "corpus", "assigned")},
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cell AS cell,
               {sql_cosine_q(sql_dot_q('a.v', 'b.v'), 'a.nv', 'b.nv')} AS cosine
        FROM assigned a JOIN assigned b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cell, cosine,
           CAST((SELECT k FROM kval) AS BIGINT) AS k_cells
    FROM pairs
    WHERE cosine >= {NEAR_DUP_COSINE}
    """


@query("embedding_near_dup_ivf_autok", oracle=_autok_oracle_sql())
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
    # session centroid memo (similarity._trained_centroids): training is
    # deterministic per (app, dir, K), and the fixed-K family already
    # shares its centroid frame through the same memo — auto-K trained
    # from scratch on EVERY invocation instead (measured ~1.7 s of its
    # 4.8 s warm wall at sf0.1; guide §5 — don't recompute a reused,
    # deterministic artifact). The memoized base frame is byte-identical
    # to the one trained here (same load_embeddings projection).
    cent = _trained_centroids(spark, sf_dir, k=k)
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
