"""Embedding-space evaluation: exact covariance matrix + kNN label audit.

Two audits an embedding pipeline runs before trusting a vector corpus:

* ``embedding_covariance`` — the exact per-dimension second-moment
  matrix (upper triangle), the input to whitening / PCA / drift
  detection. Following the exact-moment convention (L101): the engine
  emits EXACT mergeable integer statistics — Σ floor(x_i·x_j·10^9) and
  Σ floor(x_i·10^9) as BIGINTs, order-independent under partial
  aggregation — plus the covariance as a fixed-shape double projection
  of those integers, so the driver hash-compares all of it.

* ``knn_label_eval`` — leave-seeds-out k-nearest-neighbor label
  prediction: every fifth vector keeps its label (the seed pool), each
  remaining vector is predicted by majority vote of its 5 nearest
  seeds (quantized cosine, vote ties → smallest label), and the output
  is the confusion matrix. This is the standard "does the geometry
  encode the labels?" audit for an embedding model or a weak labeler
  — near-diagonal mass ⇒ trustworthy space; uniform mass (what this
  synthetic corpus shows) ⇒ geometry and labels are independent,
  which is exactly the finding the audit exists to surface.

Scale shape: covariance is ONE map-side pair expansion (d·(d+1)/2
struct rows per vector, codegen'd transform/flatten) into a groupBy
over d² keys — vocabulary-sized shuffle, corpus scanned once. kNN
broadcasts the seed pool (labeled data ≪ corpus by construction) and
windows per query over its seed candidates only; ``knn_label_eval_ivf``
is the 100 TB stage — exactly as the reranking family does, stage 1
prunes every query to its trained-IVF cell-mates (the only broadcast
is the K=32 centroid frame), then the same deterministic vote runs on
the in-cell candidates; the oracle replays training, assignment, and
vote bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.vectors import (
    SCALE,
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
    EMB_DIM,
    LLOYD_ROUNDS,
    N_CENTROIDS,
    TRAIN_SAMPLE_BELOW,
    _assign_cells,
    _sql_assign,
    _sql_lloyd_update,
    _trained_centroids,
    load_embeddings,
)

#: every SEED_MOD-th vector keeps its label; the rest are evaluated.
#: 20 keeps the labeled pool a deterministic 5% sample: the exact audit
#: is a query×seed cross join, so the seed-pool size is ITS cost knob —
#: at the bench SF the audit's value (a recall yardstick for the IVF
#: twin, which shares this split) does not need a 20% pool, and the
#: brute-force leg is the suite's single most expensive query.
SEED_MOD = 20
#: vote width for the kNN label audit.
KNN_K = 5


@query(
    "embedding_covariance",
    oracle=f"""
    WITH e AS ({E_SQL}),
    nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vec FROM e),
    pairs AS (
        SELECT i.range AS i, j.range AS j,
               CAST(SUM(CAST(floor((e.v[i.range + 1] * e.v[j.range + 1])
                                   * 1e9) AS BIGINT)) AS BIGINT) AS sum_xy_q
        FROM e, range(0, {EMB_DIM}) i, range(0, {EMB_DIM}) j
        WHERE j.range >= i.range
        GROUP BY i.range, j.range
    ),
    means AS (
        SELECT i.range AS i,
               CAST(SUM(CAST(floor(e.v[i.range + 1] * 1e9) AS BIGINT))
                    AS BIGINT) AS m
        FROM e, range(0, {EMB_DIM}) i
        GROUP BY i.range
    )
    SELECT CAST(p.i AS BIGINT) AS i, CAST(p.j AS BIGINT) AS j,
           nv.n_vec, p.sum_xy_q,
           mi.m AS sum_x_q, mj.m AS sum_y_q,
           (CAST(p.sum_xy_q AS DOUBLE) / (1e9 * nv.n_vec))
           - ((CAST(mi.m AS DOUBLE) / (1e9 * nv.n_vec))
              * (CAST(mj.m AS DOUBLE) / (1e9 * nv.n_vec))) AS cov
    FROM pairs p
    JOIN means mi ON mi.i = p.i
    JOIN means mj ON mj.i = p.j
    CROSS JOIN nv
    """,
)
def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle covariance of the embedding corpus:
    (i, j, n_vec, sum_xy_q, sum_x_q, sum_y_q, cov) for 0 ≤ i ≤ j < 64.
    The integer sums are the mergeable statistics (exact, resumable —
    a second corpus shard's sums simply add); cov is their fixed-shape
    double projection cov = E[xy] − E[x]E[y] on the 10^9-quantized
    values."""
    e = load_embeddings(spark, sf_dir).select(
        to_double_array("embedding").alias("v")
    )
    nv = e.select(F.count("*").cast("long").alias("n_vec"))
    pair_rows = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(EMB_DIM - 1)),
            lambda i: F.transform(
                F.sequence(i, F.lit(EMB_DIM - 1)),
                lambda j: F.struct(
                    i.alias("i"),
                    j.alias("j"),
                    F.floor(
                        (F.element_at(F.col("v"), i + 1)
                         * F.element_at(F.col("v"), j + 1))
                        * F.lit(SCALE)
                    )
                    .cast("long")
                    .alias("p"),
                ),
            ),
        )
    )
    pairs = (
        e.select(F.explode(pair_rows).alias("r"))
        .groupBy(
            F.col("r.i").cast("long").alias("i"),
            F.col("r.j").cast("long").alias("j"),
        )
        .agg(F.sum("r.p").cast("long").alias("sum_xy_q"))
    )
    means = (
        e.select(F.posexplode("v").alias("i", "x"))
        .groupBy(F.col("i").cast("long").alias("i"))
        .agg(F.sum(F.floor(F.col("x") * F.lit(SCALE)).cast("long")).cast("long").alias("m"))
    )
    mi = means.select(F.col("i").alias("i"), F.col("m").alias("sum_x_q"))
    mj = means.select(F.col("i").alias("j"), F.col("m").alias("sum_y_q"))
    out = (
        pairs.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .crossJoin(F.broadcast(nv))
    )
    cov = (
        F.col("sum_xy_q").cast("double") / (F.lit(SCALE) * F.col("n_vec"))
    ) - (
        (F.col("sum_x_q").cast("double") / (F.lit(SCALE) * F.col("n_vec")))
        * (F.col("sum_y_q").cast("double") / (F.lit(SCALE) * F.col("n_vec")))
    )
    return out.select(
        "i", "j", "n_vec", "sum_xy_q", "sum_x_q", "sum_y_q", cov.alias("cov")
    )


@query(
    "knn_label_eval",
    oracle=f"""
    WITH e AS ({E_SQL}),
    seeds AS (
        -- NULL-label seeds cannot vote (and would tie-break NULLS
        -- FIRST in Spark but NULLS LAST in DuckDB — adversarial-corpus
        -- hazard), so the labeled-pool contract excludes them.
        SELECT vec_id AS sid, label AS slabel, v AS sv,
               {sql_norm_sq_q('v')} AS nsv
        FROM e WHERE vec_id % {SEED_MOD} = 0 AND label IS NOT NULL
    ),
    qs AS (
        SELECT vec_id AS qid, label AS qlabel, v AS qv,
               {sql_norm_sq_q('v')} AS nqv
        FROM e WHERE vec_id % {SEED_MOD} <> 0
    ),
    scored AS (
        SELECT q.qid, q.qlabel, s.sid, s.slabel,
               {sql_cosine_q(sql_dot_q('q.qv', 's.sv'), 'nqv', 'nsv')} AS cosine
        FROM qs q CROSS JOIN seeds s
    ),
    topk AS (
        SELECT qid, qlabel, slabel FROM (
            SELECT *, row_number() OVER (
                PARTITION BY qid ORDER BY cosine DESC, sid
            ) AS rn FROM scored
        ) WHERE rn <= {KNN_K}
    ),
    votes AS (
        SELECT qid, qlabel, slabel, CAST(COUNT(*) AS BIGINT) AS c
        FROM topk GROUP BY qid, qlabel, slabel
    ),
    pred AS (
        SELECT qid, qlabel, slabel AS plabel FROM (
            SELECT *, row_number() OVER (
                PARTITION BY qid ORDER BY c DESC, slabel
            ) AS rn FROM votes
        ) WHERE rn = 1
    )
    SELECT CAST(qlabel AS BIGINT) AS label_true,
           CAST(plabel AS BIGINT) AS label_pred,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM pred GROUP BY qlabel, plabel
    """,
)
def knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix (label_true, label_pred, n) of 5-NN majority-
    vote label prediction, seeds = every 5th vector carrying a non-NULL
    label (unlabeled seeds cannot vote). Vote ties break to
    the smallest label; neighbor ties break on vec_id — both total
    orders, so the prediction is engine-portable."""
    e = load_embeddings(spark, sf_dir).select(
        "vec_id", "label", to_double_array("embedding").alias("v")
    )
    seeds = e.filter(
        (F.col("vec_id") % SEED_MOD == 0) & F.col("label").isNotNull()
    ).select(
        F.col("vec_id").alias("sid"),
        F.col("label").alias("slabel"),
        F.col("v").alias("sv"),
        norm_sq_q("v").alias("nsv"),
    )
    qs = e.filter(F.col("vec_id") % SEED_MOD != 0).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        norm_sq_q("v").alias("nqv"),
    )
    scored = qs.crossJoin(F.broadcast(seeds)).select(
        "qid",
        "qlabel",
        "sid",
        "slabel",
        cosine_q(dot_q("qv", "sv"), F.col("nqv"), F.col("nsv")).alias("cosine"),
    )
    topk = (
        scored.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("sid"))
            ),
        )
        .filter(F.col("rn") <= KNN_K)
        .select("qid", "qlabel", "slabel")
    )
    votes = topk.groupBy("qid", "qlabel", "slabel").agg(
        F.count("*").cast("long").alias("c")
    )
    pred = (
        votes.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("qid").orderBy(F.desc("c"), F.asc("slabel"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("qid", "qlabel", F.col("slabel").alias("plabel"))
    )
    return pred.groupBy(
        F.col("qlabel").cast("long").alias("label_true"),
        F.col("plabel").cast("long").alias("label_pred"),
    ).agg(F.count("*").cast("long").alias("n"))


# ---------------------------------------------------------------------------
# IVF-staged kNN label audit (the 100 TB form of knn_label_eval)
# ---------------------------------------------------------------------------


def _ivf_knn_oracle_sql() -> str:
    """Oracle for the IVF-staged audit: replay the md5-seeded sampled
    Lloyd training (the similarity family's shared CTE building blocks)
    on the RAW embeddings corpus, assign every vector to its cell, then
    run the identical vote restricted to in-cell seeds."""
    train = []
    cent = "cent0"
    for r in range(LLOYD_ROUNDS):
        train.append(_sql_assign(cent, "base", f"tassign{r}"))
        cent = f"cent{r + 1}"
        train.append(_sql_lloyd_update(f"tassign{r}", cent))
    train_ctes = ",".join(train)
    return f"""
    WITH e AS (
        SELECT vec_id, label, v, {sql_norm_sq_q('v')} AS nv FROM ({E_SQL})
    ),
    base AS (
        SELECT vec_id, v, nv FROM e
        WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1)
              < '{TRAIN_SAMPLE_BELOW}'
    ),
    corpus AS (SELECT vec_id, v, nv FROM e),
    cent0 AS (
        SELECT rn - 1 AS cid, v AS cv, nv AS ncv FROM (
            SELECT v, nv,
                   ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                      vec_id) AS rn
            FROM base)
        WHERE rn <= {N_CENTROIDS}
    ),
    {train_ctes},
    {_sql_assign(cent, "corpus", "assigned")},
    a AS (
        SELECT s.vec_id, s.v, s.nv, s.cell, e.label
        FROM assigned s JOIN e ON e.vec_id = s.vec_id
    ),
    seeds AS (
        SELECT vec_id AS sid, label AS slabel, v AS sv, nv AS nsv, cell
        FROM a WHERE vec_id % {SEED_MOD} = 0 AND label IS NOT NULL
    ),
    qs AS (
        SELECT vec_id AS qid, label AS qlabel, v AS qv, nv AS nqv, cell
        FROM a WHERE vec_id % {SEED_MOD} <> 0
    ),
    scored AS (
        SELECT q.qid, q.qlabel, s.sid, s.slabel,
               {sql_cosine_q(sql_dot_q('q.qv', 's.sv'), 'q.nqv', 's.nsv')}
                   AS cosine
        FROM qs q JOIN seeds s ON s.cell = q.cell
    ),
    topk AS (
        SELECT qid, qlabel, slabel FROM (
            SELECT *, row_number() OVER (
                PARTITION BY qid ORDER BY cosine DESC, sid
            ) AS rn FROM scored
        ) WHERE rn <= {KNN_K}
    ),
    votes AS (
        SELECT qid, qlabel, slabel, CAST(COUNT(*) AS BIGINT) AS c
        FROM topk GROUP BY qid, qlabel, slabel
    ),
    pred AS (
        SELECT qid, qlabel, slabel AS plabel FROM (
            SELECT *, row_number() OVER (
                PARTITION BY qid ORDER BY c DESC, slabel
            ) AS rn FROM votes
        ) WHERE rn = 1
    )
    SELECT CAST(qlabel AS BIGINT) AS label_true,
           CAST(plabel AS BIGINT) AS label_pred,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM pred GROUP BY qlabel, plabel
    """


@query("knn_label_eval_ivf", oracle=_ivf_knn_oracle_sql())
def knn_label_eval_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale form of :func:`knn_label_eval` — the docstring promise
    made real: stage 1 prunes every query vector to its trained-IVF
    cell-mates (the shared ``_trained_centroids`` memo + the same
    nearest-centroid assignment ``rerank_topk_ivf`` uses), stage 2 runs
    the IDENTICAL deterministic vote over the in-cell seeds only.

    Plan shape at 100 TB: the ONLY broadcast is the K={N_CENTROIDS}
    centroid frame (never the seed pool, which grows with the corpus);
    the query↔seed match is an equi-join on ``cell`` — hash-partitioned
    both sides, candidates per query are O(corpus/K), and the vote
    window runs over in-cell seed counts, never the corpus. A query
    whose cell holds no labeled seed drops out of the audit (the
    documented IVF recall trade, same as a cosine_topk miss across a
    Voronoi face); the exact twin stays registered as the ground truth
    to quantify that gap."""
    e = load_embeddings(spark, sf_dir).select(
        "vec_id", "label", to_double_array("embedding").alias("v")
    )
    corpus = e.select("vec_id", "v", norm_sq_q("v").alias("nv"))
    assigned = _assign_cells(corpus, _trained_centroids(spark, sf_dir))
    # seeds and queries both read the assignment — persist it once or
    # the lazy plan re-derives the scan+assign subtree per consumer
    # (the similarity family's convention, e.g. ivf_topk_neighbors)
    a = assigned.join(e.select("vec_id", "label"), "vec_id").persist()
    seeds = a.filter(
        (F.col("vec_id") % SEED_MOD == 0) & F.col("label").isNotNull()
    ).select(
        F.col("vec_id").alias("sid"),
        F.col("label").alias("slabel"),
        F.col("v").alias("sv"),
        F.col("nv").alias("nsv"),
        F.col("cell").alias("scell"),
    )
    qs = a.filter(F.col("vec_id") % SEED_MOD != 0).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("nv").alias("nqv"),
        "cell",
    )
    scored = qs.join(seeds, F.col("cell") == F.col("scell")).select(
        "qid",
        "qlabel",
        "sid",
        "slabel",
        cosine_q(dot_q("qv", "sv"), F.col("nqv"), F.col("nsv")).alias(
            "cosine"
        ),
    )
    topk = (
        scored.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("sid"))
            ),
        )
        .filter(F.col("rn") <= KNN_K)
        .select("qid", "qlabel", "slabel")
    )
    votes = topk.groupBy("qid", "qlabel", "slabel").agg(
        F.count("*").cast("long").alias("c")
    )
    pred = (
        votes.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("qid").orderBy(F.desc("c"), F.asc("slabel"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("qid", "qlabel", F.col("slabel").alias("plabel"))
    )
    return pred.groupBy(
        F.col("qlabel").cast("long").alias("label_true"),
        F.col("plabel").cast("long").alias("label_pred"),
    ).agg(F.count("*").cast("long").alias("n"))


# ---------------------------------------------------------------------------
# Diagonal standardization (whitening apply — the L148 consumer)
# ---------------------------------------------------------------------------


@query(
    "embedding_standardize",
    oracle=f"""
    WITH e AS ({E_SQL}),
    nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vec FROM e),
    m AS (
        SELECT i.range AS i,
               CAST(SUM(CAST(floor(e.v[i.range + 1] * 1e9) AS BIGINT))
                    AS BIGINT) AS ms,
               CAST(SUM(CAST(floor((e.v[i.range + 1] * e.v[i.range + 1])
                                   * 1e9) AS BIGINT)) AS BIGINT) AS s2
        FROM e, range(0, {EMB_DIM}) i
        GROUP BY i.range
    ),
    stats AS (
        SELECT i,
               CAST(ms AS DOUBLE) / (1e9 * nv.n_vec) AS mu,
               (CAST(s2 AS DOUBLE) / (1e9 * nv.n_vec))
               - ((CAST(ms AS DOUBLE) / (1e9 * nv.n_vec))
                  * (CAST(ms AS DOUBLE) / (1e9 * nv.n_vec))) AS var
        FROM m, nv
    ),
    arrs AS (
        SELECT list(mu ORDER BY i) AS mus, list(var ORDER BY i) AS vars
        FROM stats
    )
    SELECT e.vec_id, CAST(j.range AS BIGINT) AS j,
           CASE WHEN arrs.vars[j.range + 1] > 0 THEN
               CAST(floor(((e.v[j.range + 1] - arrs.mus[j.range + 1])
                           / sqrt(arrs.vars[j.range + 1])) * 1e6) AS BIGINT)
           END AS z_micro
    FROM e, arrs, range(0, {EMB_DIM}) j
    """,
)
def embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, j, z_micro) — diagonal whitening applied to every valid
    vector: z_j = (x_j − μ_j)/σ_j on the corpus's own moments (the L148
    diagonal), micro-floor-quantized so the driver hash-compares the
    standardized corpus bit-for-bit. Emitted one row per dimension (the
    driver's value compare is scalar-typed; consumers re-assemble with
    collect_list if they want arrays). A zero-variance dimension
    standardizes to NULL in both engines (division by zero is
    undefined, not 0 — the consumer must drop or impute it explicitly).

    Shape: one moments aggregation (d-key shuffle of BIGINT partials),
    the 64-entry μ/σ arrays collapse to ONE broadcast row, and the
    apply is a map-only codegen'd transform over the scan — the
    train-once/apply-everywhere cadence of the quantizer family."""
    e = load_embeddings(spark, sf_dir).select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    nv = e.select(F.count("*").cast("long").alias("n_vec"))
    ex = e.select(F.posexplode("v").alias("i", "x"))
    m = ex.groupBy("i").agg(
        F.sum(F.floor(F.col("x") * F.lit(SCALE)).cast("long"))
        .cast("long")
        .alias("ms"),
        F.sum(F.floor((F.col("x") * F.col("x")) * F.lit(SCALE)).cast("long"))
        .cast("long")
        .alias("s2"),
    )
    mu = F.col("ms").cast("double") / (F.lit(SCALE) * F.col("n_vec"))
    var = (F.col("s2").cast("double") / (F.lit(SCALE) * F.col("n_vec"))) - (
        mu * mu
    )
    stats = m.crossJoin(F.broadcast(nv)).select(
        "i", mu.alias("mu"), var.alias("var")
    )
    arrs = stats.agg(
        F.array_sort(F.collect_list(F.struct("i", "mu", "var"))).alias("sv")
    ).select(
        F.transform(F.col("sv"), lambda s: s.mu).alias("mus"),
        F.transform(F.col("sv"), lambda s: s["var"]).alias("vars"),
    )
    z = F.transform(
        F.sequence(F.lit(0), F.lit(EMB_DIM - 1)),
        lambda j: F.when(
            F.element_at(F.col("vars"), j + 1) > 0,
            F.floor(
                (
                    (
                        F.element_at(F.col("v"), j + 1)
                        - F.element_at(F.col("mus"), j + 1)
                    )
                    / F.sqrt(F.element_at(F.col("vars"), j + 1))
                )
                * F.lit(1000000.0)
            ).cast("long"),
        ),
    )
    return (
        e.crossJoin(F.broadcast(arrs))
        .select("vec_id", F.posexplode_outer(z).alias("j", "z_micro"))
        .select("vec_id", F.col("j").cast("long").alias("j"), "z_micro")
    )
