"""Embedding similarity search over ``embeddings`` (LLM-pipeline operators).

* **Brute-force cosine top-k** — the exact baseline: one scan, JVM-side
  zip_with/aggregate dot products, TakeOrderedAndProject. O(n·d) per
  query with zero shuffle of the embedding table — the right shape when
  k and the query batch are small.
* **IVF-bucketed near-duplicate pairs** — the scale path: assign every
  vector to its nearest of K fixed centroids (one broadcast join), then
  search pairs *within cells only* (nprobe=1). Recall < 1 by design at
  cell boundaries — the standard IVF tradeoff — and the DuckDB oracle
  replicates the same assignment, so correctness is checked exactly.

Determinism: all dot products / norms use the quantized-integer
accumulation of functions.vectors (sum(floor(x*y*1e9)) over BIGINT) so
Spark and DuckDB produce bit-identical cosines; see that module's
docstring.

The embedding corpus is near-orthogonal random (max natural cosine ~0.5),
so the near-dup query synthesizes duplicates deterministically:
vec_id % 5 == 0 → a perturbed copy at vec_id + 10000
(v_i + 0.02·((i mod 7) - 3), cosine ~0.97 to its source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
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

TOP_K = 20
QUERY_VEC_ID = 0
#: K follows the √n rule (~√6000 at bench scale); more cells = smaller
#: quadratic term per cell, balanced against K assignment dots per vector.
N_CENTROIDS = 32


def choose_k(n: int, min_k: int = 8, max_k: int = 1 << 16) -> int:
    """IVF cell count for a corpus of ``n`` vectors: the √n rule,
    clamped. √n balances the two linear terms of IVF cost — K
    assignment dots per vector vs n/K candidates per probed cell — so
    total work is minimized at K≈√n (the FAISS guideline). Used by the
    non-oracle production path (``ivf_near_dup_pairs(k=...)``); the
    registered oracle queries keep the pinned K=N_CENTROIDS so the
    DuckDB replay stays byte-stable. BENCH ``ops_100x`` records the
    chosen K at the amplified corpus — the measured evidence that
    scaled K keeps pair-stage growth sub-quadratic."""
    import math

    return max(min_k, min(max_k, math.isqrt(max(n, 1))))
#: fixed Lloyd iteration count: deterministic (no convergence probe), so
#: the DuckDB oracle can unroll the identical rounds
LLOYD_ROUNDS = 2
#: training sample: vectors whose md5(vec_id) starts below this hex char
#: (4/16 = 25%) — k-means quality needs a sample, not the corpus; the
#: same filter string runs in both engines
TRAIN_SAMPLE_BELOW = "4"
#: embeddings.parquet dimension (TESTDATA.md) — the oracle's unnest range
EMB_DIM = 64
NEAR_DUP_COSINE = 0.8

#: DuckDB: embeddings as double lists. The WHERE is the VALIDATION
#: GATE every similarity query shares: malformed embeddings (NULL
#: vector, wrong dimension, NULL or nonfinite elements) are excluded
#: before any index training or search — the contract a production
#: pipeline enforces at ingest, and the only stance that keeps k-means
#: argmins engine-portable (a NULL distance inside a min_by tie-breaks
#: differently per engine; adversarial-corpus finding). Nonfinite
#: elements joined the gate after the nonfinite-float sweep: one NaN
#: coordinate otherwise aborts the whole fleet of quantized-BIGINT
#: index paths under ANSI (cosine/IVF/PQ all overflow on it), and a
#: NaN distance is meaningless anyway.
E_SQL = (
    "SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v "
    "FROM embeddings "
    f"WHERE len(embedding) = {EMB_DIM} "
    "AND len(list_filter(embedding, x -> x IS NULL OR NOT isfinite(x))) = 0"
)


def load_embeddings(
    spark: SparkSession, sf_dir: str, spread: bool = True
) -> DataFrame:
    """Spark twin of E_SQL's validation gate: embeddings with the
    declared dimension and no NULL or nonfinite elements (a NULL
    vector fails the size check — size(NULL) is NULL; the finiteness
    predicate is fn/cleansing.is_finite's BETWEEN, which both engines
    evaluate identically because each orders NaN above +Inf). Every
    similarity query loads through this.

    ``spread`` (default True) opts the scan into the layout-probed
    rebalance — right for the family's compute-dense consumers (K
    cosines per vector, pair joins, kNN audits: 1.3-3.1× in the r12
    interleaved A/B). The two consumers whose only pre-shuffle work is
    a posexplode straight into a partial aggregate (label_centroids,
    sq8_quantized_topk) opt OUT: the exchange is a measured net tax for
    them (r13 interleaved: 0.33 vs 0.79 s / 0.73 vs 1.19 s), and the
    2× bench gate flagged exactly these two after the r12 spread."""
    from ..functions.cleansing import DBL_MAX

    return load_table(spark, sf_dir, "embeddings", spread=spread).filter(
        (F.size("embedding") == EMB_DIM)
        & ~F.exists(
            "embedding",
            lambda x: x.isNull() | ~x.between(-DBL_MAX, DBL_MAX),
        )
    )

#: corpus with synthesized near-duplicate vectors (both engines build it)
VEC_CORPUS_SQL = f"""
    SELECT vec_id, v FROM ({E_SQL})
    UNION ALL
    SELECT vec_id + 10000 AS vec_id,
           list_transform(range(len(v)),
                          i -> v[i+1] + CAST(0.02 AS DOUBLE) * ((i % 7) - 3)) AS v
    FROM ({E_SQL}) WHERE vec_id % 5 = 0
"""


# ---------------------------------------------------------------------------
# Brute-force cosine top-k (exact baseline)
# ---------------------------------------------------------------------------


@query(
    "cosine_topk",
    oracle=f"""
    WITH e AS ({E_SQL}),
    q AS (SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID})
    SELECT e.vec_id, e.label,
           {sql_cosine_q(sql_dot_q('e.v', 'q.qv'),
                         sql_norm_sq_q('e.v'),
                         sql_norm_sq_q('q.qv'))} AS cosine
    FROM e, q
    WHERE e.vec_id <> {QUERY_VEC_ID}
    ORDER BY cosine DESC, e.vec_id
    LIMIT {TOP_K}
    """,
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for one query vector (brute force).

    The query vector is broadcast (a 1-row crossJoin — no driver
    collect); every partition scores its rows with codegen'd
    zip_with/aggregate and the plan ends in TakeOrderedAndProject
    (per-partition heap + driver merge of k rows). At 100 TB this scans
    once with zero shuffle of the table — the exact-search baseline the
    IVF path is measured against.
    """
    e = load_embeddings(spark, sf_dir).select(
        "vec_id", "label", to_double_array("embedding").alias("v")
    )
    qv = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("v").alias("qv"))
    scored = e.filter(F.col("vec_id") != QUERY_VEC_ID).crossJoin(F.broadcast(qv))
    cos = cosine_q(dot_q("v", "qv"), norm_sq_q("v"), norm_sq_q("qv"))
    return (
        scored.select("vec_id", "label", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
    )


# ---------------------------------------------------------------------------
# IVF-bucketed near-duplicate pairs (the ANN scale path)
# ---------------------------------------------------------------------------


def _seed_centroids(base: DataFrame, k: int) -> DataFrame:
    """K seed centroids by md5-rank of vec_id — a deterministic stand-in
    for uniform random sampling (md5 scatters ids uniformly; both engines
    hash the identical decimal string). TakeOrderedAndProject keeps the
    selection scan-shaped; the row_number window runs on k rows only."""
    seeded = (
        base.withColumn("h", F.md5(F.col("vec_id").cast("string").cast("binary")))
        .select("h", "vec_id", "v", "nv")
        .orderBy("h", "vec_id")
        .limit(k)
    )
    rn = F.row_number().over(W.orderBy("h", "vec_id"))
    return seeded.select(
        (rn - 1).cast("long").alias("cid"),
        F.col("v").alias("cv"),
        F.col("nv").alias("ncv"),
    )


def _lloyd_update(assigned: DataFrame) -> DataFrame:
    """One Lloyd centroid update, cross-engine deterministic: per (cell,
    dim) sum floor(x*1e9) as exact BIGINT (order-independent), then one
    double division by (1e9 * cell_size). Rebuild the array index-sorted.
    Empty cells simply disappear (K shrinks) — same in the oracle."""
    ex = assigned.select("cell", F.posexplode("v").alias("i", "x"))
    sums = ex.groupBy("cell", "i").agg(
        F.sum(F.floor(F.col("x") * F.lit(SCALE)).cast("long")).alias("s"),
        F.count("*").alias("c"),
    )
    comp = (F.col("s").cast("double") / (F.lit(SCALE) * F.col("c"))).alias("m")
    cv = F.transform(
        F.array_sort(F.collect_list(F.struct("i", "m"))),
        lambda st: st["m"],
    )
    return (
        sums.select("cell", "i", comp)
        .groupBy("cell")
        .agg(cv.alias("cv"))
        .select(F.col("cell").alias("cid"), "cv", norm_sq_q("cv").alias("ncv"))
    )


def train_ivf_centroids(
    base: DataFrame, k: int = N_CENTROIDS, rounds: int = LLOYD_ROUNDS
) -> DataFrame:
    """(cid, cv, ncv) — k-means centroids: md5-seeded + ``rounds`` fixed
    Lloyd iterations, entirely as DataFrame aggregations (no driver-side
    numpy, no collect). Training runs on a deterministic 25% sample
    (md5(vec_id) prefix — uniform, engine-independent): centroid quality
    needs a sample, not the corpus, and the Lloyd cost drops 4x; at
    100 TB the sampled-training pattern is mandatory (k-means|| style).
    Each round is one broadcast-assign (K cosines per vector, argmax) +
    one explode/groupBy update — both hash-partitioned, both linear in
    sample_n·d. The fixed round count (no convergence probe) keeps the
    arithmetic replicable in the DuckDB oracle."""
    # checkpoint each round's ≤k-row centroid frame in ONE partition:
    # truncates the growing iterative plan (the classic loop pitfall)
    # without scheduling shuffle.partitions near-empty tasks per round
    from ..functions.ckpt import CheckpointJanitor

    base = base.filter(
        F.substring(F.md5(F.col("vec_id").cast("string").cast("binary")), 1, 1)
        < TRAIN_SAMPLE_BELOW
    ).persist()
    # cycle superseded rounds' checkpoint blocks (tiny ≤k-row frames,
    # but at production round counts the leak is linear in rounds —
    # same discipline as connected_components); the FINAL centroid
    # frame detaches: it outlives the loop via the session memo
    jan = CheckpointJanitor(base.sparkSession)
    try:
        cent = jan.checkpoint(_seed_centroids(base, k).repartition(1))
        for _ in range(rounds):
            assigned = _assign_cells(base, cent)
            cent = jan.checkpoint(_lloyd_update(assigned).repartition(1))
        jan.detach()
        return cent
    finally:
        base.unpersist()
        jan.release()  # no-op after detach; frees on an exception path


#: trained-centroid memo per (Spark app, corpus dir, K): three
#: registered queries (pairs, top-k, hard negatives) train on the
#: IDENTICAL base frame — training is deterministic, so the ≤K-row
#: localCheckpointed centroid frame is safely shared within a session
#: instead of running the Lloyd rounds three times. Across sessions the
#: same role is played by :func:`save_ivf_centroids` /
#: :func:`load_ivf_centroids` — train once, persist as a table, reload
#: bit-identical (the PQ codebooks' contract, mirrored).
_CENTROID_CACHE: dict[tuple[str, str, int], DataFrame] = {}


def _vec_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthesized near-dup vector corpus every similarity query
    shares: the embeddings table plus a perturbed copy of every 5th
    vector at vec_id + 10000 (the planted near-duplicates). Defined
    ONCE — six queries' oracles replay this construction as
    VEC_CORPUS_SQL, so a drift between any two Spark-side copies would
    silently break only some oracles (review finding). Returns
    (vec_id, v, nv)."""
    e = load_embeddings(spark, sf_dir).select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    mut = e.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform(
            "v", lambda x, i: x + F.lit(0.02) * (i % 7 - 3).cast("double")
        ).alias("v"),
    )
    return e.unionByName(mut).withColumn("nv", norm_sq_q("v"))


def _trained_centroids(
    spark: SparkSession, sf_dir: str, k: int = N_CENTROIDS
) -> DataFrame:
    import os

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), k)
    cent = _CENTROID_CACHE.get(key)
    if cent is None:
        e = load_embeddings(spark, sf_dir).select(
            "vec_id", to_double_array("embedding").alias("v")
        )
        base = e.withColumn("nv", norm_sq_q("v"))
        cent = train_ivf_centroids(base, k=k)
        _CENTROID_CACHE[key] = cent
    return cent


def _assign_cells(
    corpus: DataFrame, centroids: DataFrame, nprobe: int = 1
) -> DataFrame:
    """Nearest-centroid assignment: broadcast the K centroids, score K
    cosines per vector, keep the ``nprobe`` best cells (ties → smallest
    cid). Output is (vec_id, v, nv, cell) — one row per probed cell, so
    nprobe=1 keeps the classic IVF shape and nprobe>1 duplicates each
    vector into its runner-up cells, trading nprobe× pair-stage compute
    for boundary recall (vectors near a Voronoi face meet their
    neighbors across it).

    Both paths pre-reduce map-side — never a per-vector window sort over
    the n·K scored rows: the argmax is a partial-aggregating
    ``max(struct(ccos, -cid))``; the top-nprobe generalizes it to
    ``slice(array_sort(collect_list(...)), -nprobe)`` with K small
    structs per vector riding the combine. Norms are computed once per
    vector/centroid and carried along — the pair stage reuses ``nv``
    instead of recomputing norms per pair."""
    scored = corpus.crossJoin(F.broadcast(centroids))
    cos = cosine_q(dot_q("v", "cv"), F.col("nv"), F.col("ncv"))
    scored = scored.select("vec_id", "v", "nv", "cid", cos.alias("ccos"))
    if nprobe == 1:
        return (
            scored.groupBy("vec_id")
            .agg(
                F.max(
                    F.struct(F.col("ccos"), (-F.col("cid")).alias("ncid"))
                ).alias("m"),
                # v/nv are functionally dependent on vec_id — first() is
                # deterministic here (every row in the group carries them)
                F.first("v").alias("v"),
                F.first("nv").alias("nv"),
            )
            .select("vec_id", "v", "nv", (-F.col("m.ncid")).alias("cell"))
        )
    # ascending sort keeps (ccos, -cid) ordering consistent with the
    # argmax (larger cosine wins, then smaller cid); take the LAST
    # nprobe elements — start index clamps to 1 so K < nprobe keeps
    # every cell instead of slicing past the front
    ranked = F.array_sort(
        F.collect_list(F.struct(F.col("ccos"), (-F.col("cid")).alias("ncid")))
    )
    return (
        scored.groupBy("vec_id")
        .agg(ranked.alias("ranked"), F.first("v").alias("v"), F.first("nv").alias("nv"))
        .select(
            "vec_id",
            "v",
            "nv",
            F.explode(
                F.slice(
                    "ranked",
                    F.greatest(F.lit(1), F.size("ranked") - F.lit(nprobe - 1)),
                    nprobe,
                )
            ).alias("t"),
        )
        .select("vec_id", "v", "nv", (-F.col("t.ncid")).alias("cell"))
    )


def _sql_assign(cent: str, src: str, out: str) -> str:
    """CTE: assign ``src`` rows to nearest centroid in ``cent``."""
    cos = sql_cosine_q(sql_dot_q(f"{src}.v", "c.cv"), f"{src}.nv", "c.ncv")
    return f"""
    {out} AS (
        SELECT vec_id, v, nv, cell FROM (
            SELECT {src}.vec_id, {src}.v, {src}.nv, c.cid AS cell,
                   ROW_NUMBER() OVER (PARTITION BY {src}.vec_id
                                      ORDER BY {cos} DESC, c.cid) AS rn
            FROM {src}, {cent} c)
        WHERE rn = 1
    )"""


def _sql_lloyd_update(assigned: str, out: str) -> str:
    """CTE twin of :func:`_lloyd_update` (exact-BIGINT dim sums)."""
    return f"""
    {out} AS (
        SELECT cid, cv, {sql_norm_sq_q('cv')} AS ncv FROM (
            SELECT cell AS cid, list(m ORDER BY i) AS cv FROM (
                SELECT cell, i,
                       CAST(CAST(SUM(CAST(floor(v[i+1] * 1e9) AS BIGINT))
                                 AS BIGINT) AS DOUBLE)
                       / (1000000000.0 * COUNT(*)) AS m
                FROM {assigned},
                     (SELECT unnest(range({EMB_DIM})) AS i) t
                GROUP BY cell, i)
            GROUP BY cell)
    )"""


def _ivf_train_assign_ctes() -> str:
    """The CTE prefix shared by every IVF oracle: base/corpus norms,
    md5-seeded centroids, LLOYD_ROUNDS train iterations, and the final
    nearest-centroid assignment of the corpus (CTE name ``assigned``)."""
    train = []
    cent = "cent0"
    for r in range(LLOYD_ROUNDS):
        train.append(_sql_assign(cent, "base", f"tassign{r}"))
        cent = f"cent{r + 1}"
        train.append(_sql_lloyd_update(f"tassign{r}", cent))
    train_ctes = ",".join(train)
    return f"""
    WITH base AS (
        SELECT vec_id, v, {sql_norm_sq_q('v')} AS nv FROM ({E_SQL})
        WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) < '{TRAIN_SAMPLE_BELOW}'
    ),
    corpus AS (
        SELECT vec_id, v, {sql_norm_sq_q('v')} AS nv FROM ({VEC_CORPUS_SQL})
    ),
    cent0 AS (
        SELECT rn - 1 AS cid, v AS cv, nv AS ncv FROM (
            SELECT v, nv,
                   ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                      vec_id) AS rn
            FROM base)
        WHERE rn <= {N_CENTROIDS}
    ),
    {train_ctes},
    {_sql_assign(cent, "corpus", "assigned")}"""


def _ivf_oracle_sql() -> str:
    return f"""
    {_ivf_train_assign_ctes()},
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cell AS cell,
               {sql_cosine_q(sql_dot_q('a.v', 'b.v'), 'a.nv', 'b.nv')} AS cosine
        FROM assigned a JOIN assigned b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cell, cosine FROM pairs
    WHERE cosine >= {NEAR_DUP_COSINE}
    """


@query("embedding_near_dup_ivf", oracle=_ivf_oracle_sql())
def embedding_near_dup_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs (cosine >= 0.8) via IVF blocking.

    Centroids are TRAINED: :func:`train_ivf_centroids` runs md5-seeded
    initialization plus LLOYD_ROUNDS fixed Lloyd iterations over the
    base table (K = N_CENTROIDS = 32), entirely as DataFrame
    aggregations; the full corpus (base + synthesized near-dups) is then
    assigned to its nearest trained centroid and pair search runs within
    cells only. The pair-join is hash-partitioned on the cell, so the
    quadratic term is n²/K per cell instead of n² global; K grows with
    corpus size (√n rule) at scale, and nprobe>1 trades compute for
    boundary recall. The oracle replicates the identical seeded training
    (exact-BIGINT quantized sums → bit-identical centroids), so the
    entry is an exact check of the full train+assign+search pipeline,
    not a recall estimate.
    """
    return ivf_near_dup_pairs(spark, sf_dir, nprobe=1)


def ivf_near_dup_pairs(
    spark: SparkSession, sf_dir: str, nprobe: int = 1, k: int = N_CENTROIDS
) -> DataFrame:
    """The IVF pipeline with a tunable probe width and cell count.
    nprobe=1, k=N_CENTROIDS is the oracle-exact registered query;
    nprobe>1 probes each vector's runner-up cells too, recovering pairs
    that straddle a Voronoi boundary at nprobe× pair-stage cost (recall
    measured in tests/test_scale_techniques.py); the production path
    passes ``k=choose_k(n)`` so the per-cell quadratic term tracks √n
    as the corpus grows (bench ``ops_100x`` measures this). Cross-cell
    duplicate candidates (two vectors sharing several probed cells) are
    reduced to one row per pair, keeping the output a pair list for
    every nprobe."""
    corpus = _vec_corpus(spark, sf_dir)
    centroids = _trained_centroids(spark, sf_dir, k=k)
    # assigned feeds both sides of the pair join — persist so the
    # assignment chain (K cosines per vector + top-nprobe) runs once
    assigned = _assign_cells(corpus, centroids, nprobe=nprobe).persist()

    a = assigned.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"),
        F.col("nv").alias("na"), "cell",
    )
    b = assigned.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"),
        F.col("nv").alias("nb"), F.col("cell").alias("cell_b"),
    )
    pairs = a.join(
        b, (F.col("cell") == F.col("cell_b")) & (F.col("id_a") < F.col("id_b"))
    )
    cos = cosine_q(dot_q("va", "vb"), F.col("na"), F.col("nb"))
    out = (
        pairs.select("id_a", "id_b", "cell", cos.alias("cosine"))
        .filter(F.col("cosine") >= NEAR_DUP_COSINE)
    )
    if nprobe > 1:
        # same pair can surface from several shared cells — keep one
        # (smallest cell id; cosine identical by construction)
        out = out.groupBy("id_a", "id_b").agg(
            F.min("cell").alias("cell"), F.first("cosine").alias("cosine")
        )
    return out


# ---------------------------------------------------------------------------
# IVF top-k neighbor search (the ANN query path, vs cosine_topk brute force)
# ---------------------------------------------------------------------------

TOPK_NEIGHBORS = 5  #: neighbors returned per query vector
TOPK_QUERY_MOD = 50  #: every TOPK_QUERY_MOD-th corpus vector is a query


def _ivf_topk_oracle_sql() -> str:
    cos = sql_cosine_q(sql_dot_q("q.v", "c.v"), "q.nv", "c.nv")
    return f"""
    {_ivf_train_assign_ctes()},
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {cos} AS cosine,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {cos} DESC, c.vec_id) AS rnk
        FROM assigned q JOIN assigned c
          ON q.cell = c.cell AND c.vec_id != q.vec_id
        WHERE q.vec_id % {TOPK_QUERY_MOD} = 0
    )
    SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, cosine
    FROM scored WHERE rnk <= {TOPK_NEIGHBORS}
    """


@query("ivf_topk_neighbors", oracle=_ivf_topk_oracle_sql())
def ivf_topk_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k nearest neighbors per query vector via IVF cell pruning —
    the ANN *search* path (``cosine_topk`` is the brute-force baseline:
    exact but O(corpus) per query; this scans only the query's cell,
    O(corpus/K) per query at the cost of cell-boundary misses, which
    nprobe>1 recovers — see :func:`_assign_cells`).

    Queries are the corpus vectors with vec_id % TOPK_QUERY_MOD == 0
    (deterministic, so the oracle replicates the query set); candidates
    are their cell-mates from the SAME trained assignment the pair
    queries use; ranking is (cosine desc, neighbor_id) per query. The
    per-query window runs over in-cell candidates only (~n/K rows), and
    the whole pipeline — training included — is replicated exactly by
    the DuckDB oracle.
    """
    corpus = _vec_corpus(spark, sf_dir)
    centroids = _trained_centroids(spark, sf_dir)
    assigned = _assign_cells(corpus, centroids).persist()

    q = assigned.filter(F.col("vec_id") % TOPK_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("nv").alias("qn"), "cell",
    )
    c = assigned.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv_"),
        F.col("nv").alias("cn"), F.col("cell").alias("cell_c"),
    )
    cos = cosine_q(dot_q("qv", "cv_"), F.col("qn"), F.col("cn"))
    scored = q.join(
        c,
        (F.col("cell") == F.col("cell_c"))
        & (F.col("neighbor_id") != F.col("query_id")),
    ).select("query_id", "neighbor_id", cos.alias("cosine"))
    rnk = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    )
    return (
        scored.withColumn("rank", rnk.cast("long"))
        .filter(F.col("rank") <= TOPK_NEIGHBORS)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH near-duplicate pairs (the banded alternative to IVF)
# ---------------------------------------------------------------------------

#: 2 bands × 8 sign bits: a pair is a candidate if ALL bits of either
#: band agree (banding boosts recall exactly as in minhash LSH).
LSH_BANDS = 2
LSH_BITS = 8
#: primes > 7 parameterizing the deterministic hyperplanes (one per bit)
_LSH_P = (11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67, 71)


def _hyperplane_dot_sql(p: int, q: int, spark_side: bool) -> str:
    """Sign-test dot of v with the deterministic hyperplane
    c(i) = ((i*p + q) % 11) - 5, accumulated as exact BIGINTs
    (floor(x*1e9) * int coefficient) so both engines agree bit-for-bit
    regardless of summation order. Modulus 11 deliberately differs from
    the mod-7 pattern that synthesizes the near-dup perturbations — a
    mod-7 hyperplane correlates with that perturbation direction and
    flips signs far more often than a random hyperplane would (measured:
    recall 25% vs the ~67% random-hyperplane theory)."""
    if spark_side:
        return (
            f"aggregate(transform(v, (x, i) -> "
            f"CAST(floor(x * 1000000000) AS BIGINT) * "
            f"CAST(((i * {p} + {q}) % 11) - 5 AS BIGINT)), "
            f"CAST(0 AS BIGINT), (a, y) -> a + y)"
        )
    return (
        f"CAST(list_sum(list_transform(range(len(v)), i -> "
        f"CAST(floor(v[i+1] * 1000000000) AS BIGINT) * "
        f"CAST(((i * {p} + {q}) % 11) - 5 AS BIGINT))) AS BIGINT)"
    )


def _band_sig_sql(band: int, spark_side: bool) -> str:
    bits = []
    for h in range(LSH_BITS):
        p = _LSH_P[band * LSH_BITS + h]
        q = 5 + 3 * (band * LSH_BITS + h)
        dot = _hyperplane_dot_sql(p, q, spark_side)
        bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << h} ELSE 0 END)")
    return " + ".join(bits)


@query(
    "embedding_near_dup_lsh",
    oracle=f"""
    WITH corpus AS (
        SELECT vec_id, v, {sql_norm_sq_q('v')} AS nv,
               {_band_sig_sql(0, False)} AS s0,
               {_band_sig_sql(1, False)} AS s1
        FROM ({VEC_CORPUS_SQL})
    ),
    keys AS (
        SELECT vec_id, v, nv, 0 AS band, s0 AS sig FROM corpus
        UNION ALL
        SELECT vec_id, v, nv, 1 AS band, s1 AS sig FROM corpus
    ),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {sql_cosine_q(sql_dot_q('a.v', 'b.v'), 'a.nv', 'b.nv')} AS cosine
        FROM keys a JOIN keys b
          ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id
    )
    SELECT DISTINCT id_a, id_b, cosine FROM pairs
    WHERE cosine >= {NEAR_DUP_COSINE}
    """,
)
def embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs via random-hyperplane (SimHash-style)
    LSH — the banded alternative to :func:`embedding_near_dup_ivf`.

    Each vector gets 2 band signatures of 8 sign bits (sign of the dot
    with a deterministic hyperplane); candidate pairs share ALL bits of
    at least one band, so the pair join is an equi-join on (band, sig) —
    hash-partitioned buckets, quadratic only within a bucket, recall
    boosted by banding exactly as in minhash LSH. Unlike IVF there is no
    centroid assignment pass: signatures are a pure projection, so the
    only shuffles are the bucket join and the final pair dedup. Sign
    tests accumulate exact BIGINTs (quantized components × integer
    coefficients), so the oracle replicates the bucketing bit-for-bit
    and the entry checks the full pipeline, not a recall estimate.

    At 100 TB: bits/bands scale with corpus size (more bits → smaller
    buckets, more bands → recall), and the signature projection
    parallelizes with the scan — no global pass like k-means training.
    """
    corpus = (
        _vec_corpus(spark, sf_dir)
        .withColumn("s0", F.expr(_band_sig_sql(0, True)))
        .withColumn("s1", F.expr(_band_sig_sql(1, True)))
    )
    # keys feeds both sides of the pair join — persist so the 16
    # interpreted sign-test projections run once, not twice
    keys = corpus.select(
        "vec_id", "v", "nv",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band"), F.col("s0").alias("sig")),
                F.struct(F.lit(1).alias("band"), F.col("s1").alias("sig")),
            )
        ).alias("k"),
    ).select("vec_id", "v", "nv", "k.band", "k.sig").persist()
    a = keys.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"),
        F.col("nv").alias("na"), "band", "sig",
    )
    b = keys.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"),
        F.col("nv").alias("nb"), F.col("band").alias("band_b"),
        F.col("sig").alias("sig_b"),
    )
    pairs = a.join(
        b,
        (F.col("band") == F.col("band_b"))
        & (F.col("sig") == F.col("sig_b"))
        & (F.col("id_a") < F.col("id_b")),
    )
    cos = cosine_q(dot_q("va", "vb"), F.col("na"), F.col("nb"))
    return (
        pairs.select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= NEAR_DUP_COSINE)
        .distinct()
    )


# ---------------------------------------------------------------------------
# Hard-negative mining (contrastive-training data from the IVF cells)
# ---------------------------------------------------------------------------

NEG_COS_LO = 0.1  #: negatives must be at least this similar ("hard")
NEG_PER_QUERY = 3  #: negatives kept per query vector


def _hard_negative_oracle_sql() -> str:
    cos = sql_cosine_q(sql_dot_q("q.v", "c.v"), "q.nv", "c.nv")
    return f"""
    {_ivf_train_assign_ctes()},
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS negative_id,
               {cos} AS cosine,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {cos} DESC, c.vec_id) AS rnk
        FROM assigned q JOIN assigned c
          ON q.cell = c.cell AND c.vec_id != q.vec_id
        WHERE q.vec_id % {TOPK_QUERY_MOD} = 0
          AND {cos} >= {NEG_COS_LO} AND {cos} < {NEAR_DUP_COSINE}
    )
    SELECT query_id, negative_id, CAST(rnk AS BIGINT) AS rank, cosine
    FROM scored WHERE rnk <= {NEG_PER_QUERY}
    """


@query("hard_negative_mining", oracle=_hard_negative_oracle_sql())
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard negatives for contrastive training: per query vector, the
    most-similar in-cell candidates INSIDE the band
    [NEG_COS_LO, NEAR_DUP_COSINE) — similar enough to be informative,
    below the near-dup line so they aren't positives mislabeled as
    negatives. Same trained IVF assignment as the pair/top-k queries;
    the band filter rides the in-cell join, and the per-query ranking
    window runs over the banded candidates only. Oracle replicates the
    full pipeline — training, banding, ranking — exactly."""
    corpus = _vec_corpus(spark, sf_dir)
    assigned = _assign_cells(corpus, _trained_centroids(spark, sf_dir)).persist()

    q = assigned.filter(F.col("vec_id") % TOPK_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("nv").alias("qn"), "cell",
    )
    c = assigned.select(
        F.col("vec_id").alias("negative_id"), F.col("v").alias("cv_"),
        F.col("nv").alias("cn"), F.col("cell").alias("cell_c"),
    )
    cos = cosine_q(dot_q("qv", "cv_"), F.col("qn"), F.col("cn"))
    scored = (
        q.join(
            c,
            (F.col("cell") == F.col("cell_c"))
            & (F.col("negative_id") != F.col("query_id")),
        )
        .select("query_id", "negative_id", cos.alias("cosine"))
        .filter(
            (F.col("cosine") >= NEG_COS_LO) & (F.col("cosine") < NEAR_DUP_COSINE)
        )
    )
    rnk = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.desc("cosine"), "negative_id")
    )
    return (
        scored.withColumn("rank", rnk.cast("long"))
        .filter(F.col("rank") <= NEG_PER_QUERY)
        .select("query_id", "negative_id", "rank", "cosine")
    )


# ---------------------------------------------------------------------------
# SQ8 scalar-quantized top-k (the compressed-index search path)
# ---------------------------------------------------------------------------

SQ_LEVELS = 127  #: int8 symmetric range: codes in [-127, 127]


@query(
    "sq8_quantized_topk",
    oracle=f"""
    WITH e AS ({E_SQL}),
    ex AS (
        SELECT vec_id, generate_subscripts(v, 1) AS pos, unnest(v) AS x
        FROM e
    ),
    sc AS (
        SELECT list(s ORDER BY pos) AS scales
        FROM (SELECT pos, max(abs(x)) AS s FROM ex GROUP BY pos)
    ),
    qe AS (
        SELECT vec_id, label,
               list_transform(range(len(v)), i ->
                   CASE WHEN scales[i+1] > 0
                        THEN CAST(floor((v[i+1] * 127.0) / scales[i+1]) AS BIGINT)
                        ELSE 0 END) AS q
        FROM e, sc
    ),
    qq AS (SELECT q AS qv FROM qe WHERE vec_id = {QUERY_VEC_ID})
    SELECT qe.vec_id, qe.label,
           CAST(list_sum(list_transform(range(len(q)), i -> q[i+1] * qv[i+1]))
                AS BIGINT) AS qdot
    FROM qe, qq
    WHERE qe.vec_id <> {QUERY_VEC_ID}
    ORDER BY qdot DESC, qe.vec_id
    LIMIT {TOP_K}
    """,
)
def sq8_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by int8 scalar-quantized dot product — the SQ8 compressed
    index of FAISS/Lucene as DataFrame ops: per-dimension symmetric
    quantization ``code = floor(x·127 / max_d|x|)`` shrinks the corpus
    8x vs float64 math (the 100 TB win: the scan reads 1 byte/dim and
    the dot is integer SIMD), at a ranking error bounded by one code
    step per dimension.

    Two passes: (1) per-dimension scales — posexplode → 64-group
    partial-agg MAX(ABS(x)) → one array row broadcast back (at 100 TB
    scales train on a sample, like the IVF centroids); (2) quantize
    both sides with codegen'd zip_with, integer-dot against the
    broadcast query codes, TakeOrderedAndProject. Determinism: MAX is
    order-independent, ``(x·127.0)/s`` is one IEEE expression written
    identically in both engines, floor is exact, and the integer dot
    sum is order-independent — the same contract as functions.vectors.

    Exactness vs cosine_topk: ranking by unnormalized quantized dot —
    the oracle replicates the FULL quantization pipeline, so the check
    certifies codes, not only the winner set."""
    # spread=False: posexplode→partial-agg is the whole pre-shuffle map
    # work; the rebalance exchange is a measured net tax here (module
    # docstring of load_embeddings)
    e = load_embeddings(spark, sf_dir, spread=False).select(
        "vec_id", "label", to_double_array("embedding").alias("v")
    )
    scales = (
        e.select(F.posexplode("v").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.max(F.abs(F.col("x"))).alias("s"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s"))),
                lambda kv: kv.getField("s"),
            ).alias("scales")
        )
    )
    quantize = lambda vec: F.zip_with(  # noqa: E731
        vec,
        F.col("scales"),
        lambda x, s: F.when(
            s > F.lit(0.0), F.floor((x * F.lit(127.0)) / s).cast("long")
        ).otherwise(F.lit(0).cast("long")),
    )
    qe = e.crossJoin(F.broadcast(scales)).select(
        "vec_id", "label", quantize(F.col("v")).alias("q")
    )
    qv = qe.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("q").alias("qv")
    )
    dot = F.aggregate(
        F.zip_with(F.col("q"), F.col("qv"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        qe.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", "label", dot.alias("qdot"))
        .orderBy(F.desc("qdot"), F.asc("vec_id"))
        .limit(TOP_K)
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) with ADC top-k — the compressed-corpus search
# ---------------------------------------------------------------------------

PQ_M = 4  #: subspaces (64 dims → 4 × 16)
PQ_SUBDIM = EMB_DIM // PQ_M
PQ_K = 8  #: centroids per subspace (3-bit codes; 256 in production PQ)
#: one Lloyd round per subspace: deterministic, oracle-unrollable (the
#: IVF contract, applied per subspace)
PQ_ROUNDS = 1


def _pq_slices(vecs: DataFrame, id_cols: list[str]) -> DataFrame:
    """(*)id_cols, m, sv) — each vector split into PQ_M contiguous
    sub-vectors (one row per subspace; F.slice is 1-based)."""
    subs = F.transform(
        F.sequence(F.lit(0), F.lit(PQ_M - 1)),
        lambda m: F.slice(F.col("v"), m * PQ_SUBDIM + 1, PQ_SUBDIM),
    )
    return vecs.select(*id_cols, F.posexplode(subs).alias("m", "sv"))


def _pq_assign(slices: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid-in-subspace assignment by EXACT integer L2:
    ||x-c||² ranks identically to nsv + ncv - 2·dot, and with the
    quantized-BIGINT dot/norms that expression is exact integer
    arithmetic — assignment ties break on cid with no float ambiguity
    (the cross-engine property the IVF cosine path gets from its
    quantized ints, here in L2 form). Centroids broadcast (≤ M·K
    rows); the argmin is the map-side-combining max(struct) device."""
    j = slices.join(F.broadcast(cent), "m")
    dist = (
        norm_sq_q("sv") + F.col("ncv") - F.lit(2) * dot_q("sv", "cv")
    ).alias("d")
    scored = j.select(
        *[c for c in slices.columns if c != "sv"], "sv", "cid", dist
    )
    return (
        scored.groupBy(*[c for c in slices.columns if c != "sv"])
        .agg(
            F.max(
                F.struct(
                    (-F.col("d")).alias("nd"), (-F.col("cid")).alias("ncid")
                )
            ).alias("w"),
            F.first("sv").alias("sv"),
        )
        .withColumn("cell", (-F.col("w.ncid")).cast("long"))
        .drop("w")
    )


def train_pq_codebooks(base: DataFrame) -> DataFrame:
    """(m, cid, cv, ncv) — one K-centroid codebook per subspace:
    md5-rank seeds (sub-slices of the same K seed vectors — one
    TakeOrderedAndProject serves all M subspaces) + PQ_ROUNDS exact-
    BIGINT Lloyd iterations keyed by (m, cell), all M subspaces
    training in ONE set of DataFrame aggregations (m rides the keys —
    no per-subspace loop). Same sampled-training contract as the IVF
    path (md5-prefix 25% sample)."""
    sample = base.filter(
        F.substring(F.md5(F.col("vec_id").cast("string").cast("binary")), 1, 1)
        < TRAIN_SAMPLE_BELOW
    ).persist()
    try:
        rn = F.row_number().over(W.orderBy("h", "vec_id"))
        seeds = (
            sample.withColumn(
                "h", F.md5(F.col("vec_id").cast("string").cast("binary"))
            )
            .orderBy("h", "vec_id")
            .limit(PQ_K)
            .select((rn - 1).cast("long").alias("cid"), "v")
        )
        from ..functions.ckpt import CheckpointJanitor

        jan = CheckpointJanitor(sample.sparkSession)
        cent = jan.checkpoint(
            _pq_slices(seeds, ["cid"])
            .select("m", "cid", F.col("sv").alias("cv"))
            .withColumn("ncv", norm_sq_q("cv"))
            .repartition(1)
        )
        bsl = _pq_slices(sample, ["vec_id"]).persist()
        for _ in range(PQ_ROUNDS):
            assigned = _pq_assign(bsl, cent)
            ex = assigned.select(
                "m", "cell", F.posexplode("sv").alias("i", "x")
            )
            sums = ex.groupBy("m", "cell", "i").agg(
                F.sum(F.floor(F.col("x") * F.lit(SCALE)).cast("long")).alias(
                    "s"
                ),
                F.count("*").alias("c"),
            )
            comp = (
                F.col("s").cast("double") / (F.lit(SCALE) * F.col("c"))
            ).alias("mean")
            cv = F.transform(
                F.array_sort(F.collect_list(F.struct("i", "mean"))),
                lambda st: st["mean"],
            )
            # cycles the previous round's blocks (see train_ivf_centroids)
            cent = jan.checkpoint(
                sums.select("m", "cell", "i", comp)
                .groupBy("m", "cell")
                .agg(cv.alias("cv"))
                .select(
                    "m",
                    F.col("cell").alias("cid"),
                    "cv",
                    norm_sq_q("cv").alias("ncv"),
                )
                .repartition(1)
            )
        bsl.unpersist()
        jan.detach()  # the session memo keeps the final codebooks
        return cent
    finally:
        sample.unpersist()


#: PQ codebook memo per (Spark app, corpus dir) — same contract as
#: _CENTROID_CACHE: training is deterministic, the ≤M·K-row checkpointed
#: frame is shared by pq_topk_adc and ivfpq_topk_neighbors instead of
#: re-running the Lloyd aggregations per query
_PQ_CODEBOOK_CACHE: dict[tuple[str, str], DataFrame] = {}


def _trained_pq_codebooks(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    cent = _PQ_CODEBOOK_CACHE.get(key)
    if cent is None:
        e = load_embeddings(spark, sf_dir).select(
            "vec_id", to_double_array("embedding").alias("v")
        )
        cent = train_pq_codebooks(e)
        _PQ_CODEBOOK_CACHE[key] = cent
    return cent


def _sql_pq_dist(sv: str, cv: str) -> str:
    """Exact-integer L2 ranking expression (see _pq_assign)."""
    return (
        f"{sql_norm_sq_q(sv)} + {sql_norm_sq_q(cv)} - 2 * ({sql_dot_q(sv, cv)})"
    )


def _pq_oracle_sql() -> str:
    """DuckDB twin of the WHOLE PQ pipeline: seeding, the Lloyd round
    per subspace, corpus encoding, and the ADC top-k — the compressed
    search is value-certified end to end, training included (the IVF
    oracle contract, per subspace)."""
    sl = f"list_slice(v, m * {PQ_SUBDIM} + 1, m * {PQ_SUBDIM} + {PQ_SUBDIM})"
    assign = f"""
        SELECT vec_id, m, sv, cell FROM (
            SELECT s.vec_id, s.m, s.sv, c.cid AS cell,
                   ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                       ORDER BY {_sql_pq_dist('s.sv', 'c.cv')} ASC, c.cid)
                       AS rn
            FROM {{src}} s JOIN {{cent}} c ON c.m = s.m)
        WHERE rn = 1
    """
    return f"""
    WITH e AS ({E_SQL}),
    base AS (
        SELECT vec_id, v FROM e
        WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1)
              < '{TRAIN_SAMPLE_BELOW}'
    ),
    ms AS (SELECT unnest(range({PQ_M})) AS m),
    bsl AS (SELECT vec_id, m, {sl} AS sv FROM base, ms),
    seedv AS (
        SELECT rn - 1 AS cid, v FROM (
            SELECT v, ROW_NUMBER() OVER (
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
            FROM base)
        WHERE rn <= {PQ_K}
    ),
    cent0 AS (SELECT m, cid, {sl} AS cv
              FROM (SELECT cid, v FROM seedv), ms),
    assign0 AS ({assign.format(src='bsl', cent='cent0')}),
    cent1 AS (
        SELECT m, cell AS cid, list(mean ORDER BY i) AS cv FROM (
            SELECT m, cell, i,
                   CAST(CAST(SUM(CAST(floor(sv[i+1] * 1e9) AS BIGINT))
                             AS BIGINT) AS DOUBLE)
                   / (1000000000.0 * COUNT(*)) AS mean
            FROM assign0, (SELECT unnest(range({PQ_SUBDIM})) AS i) t
            GROUP BY m, cell, i)
        GROUP BY m, cell
    ),
    csl AS (SELECT vec_id, m, {sl} AS sv FROM e, ms),
    codes AS ({assign.format(src='csl', cent='cent1')}),
    qtab AS (
        SELECT c.m, c.cid, {sql_dot_q('q.sv', 'c.cv')} AS pdot
        FROM csl q JOIN cent1 c ON c.m = q.m
        WHERE q.vec_id = {QUERY_VEC_ID}
    )
    SELECT e.vec_id, e.label, CAST(SUM(t.pdot) AS BIGINT) AS approx_dot
    FROM codes k
    JOIN qtab t ON t.m = k.m AND t.cid = k.cell
    JOIN e ON e.vec_id = k.vec_id
    WHERE k.vec_id <> {QUERY_VEC_ID}
    GROUP BY e.vec_id, e.label
    ORDER BY approx_dot DESC, e.vec_id
    LIMIT {TOP_K}
    """


@query("pq_topk_adc", oracle=_pq_oracle_sql())
def pq_topk_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization top-k with asymmetric distance computation
    (Jégou '11; the FAISS IVFPQ code path minus the IVF stage, which
    `embedding_near_dup_ivf` already covers): {PQ_M} codebooks of
    {PQ_K} centroids trained per 16-dim subspace, every corpus vector
    stored as {PQ_M} small codes (3 bits each here — 256x smaller than
    the float32 vector; 8-bit codes at production K), and the query
    scored against the CODEBOOKS once (an M×K lookup table) instead of
    against every vector.

    Plan: training = one TakeOrderedAndProject seed + per-(m,cell,i)
    exact-BIGINT Lloyd aggregations (all M subspaces in one keyed agg
    pass, no per-subspace loop); encoding = broadcast M·K centroids,
    integer-L2 argmin; search = codes equi-join the broadcast M×K
    query table, SUM per vector, TakeOrderedAndProject. At 100 TB the
    corpus scan reads CODES (bytes/vector), not embeddings — the
    memory-bound trick that makes billion-vector search fit a cluster.
    The oracle replays seeding, training, encoding and ADC exactly —
    integer quantization makes every stage bit-identical."""
    e = load_embeddings(spark, sf_dir).select(
        "vec_id", "label", to_double_array("embedding").alias("v")
    )
    cent = _trained_pq_codebooks(spark, sf_dir)
    csl = _pq_slices(e.select("vec_id", "label", "v"), ["vec_id", "label"])
    codes = _pq_assign(csl, cent).select("vec_id", "label", "m", "cell")
    qtab = (
        csl.filter(F.col("vec_id") == QUERY_VEC_ID)
        .join(F.broadcast(cent), "m")
        .select("m", "cid", dot_q("sv", "cv").alias("pdot"))
    )
    return (
        codes.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(
            F.broadcast(qtab),
            (codes["m"] == qtab["m"]) & (codes["cell"] == qtab["cid"]),
        )
        .groupBy("vec_id", "label")
        .agg(F.sum("pdot").cast("long").alias("approx_dot"))
        .orderBy(F.desc("approx_dot"), F.asc("vec_id"))
        .limit(TOP_K)
    )


# ---------------------------------------------------------------------------
# Class prototypes (mean embedding per label)
# ---------------------------------------------------------------------------


@query(
    "label_centroids",
    oracle=f"""
    SELECT label, CAST(i AS BIGINT) AS pos,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(CAST(SUM(CAST(floor(v[i+1] * 1e9) AS BIGINT)) AS BIGINT)
                AS DOUBLE) / (1000000000.0 * COUNT(*)) AS mean_val
    FROM ({E_SQL}), (SELECT unnest(range({EMB_DIM})) AS i) t
    GROUP BY label, i
    """,
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (class prototypes) — the vector behind
    prototype classifiers, semantic-dedup cluster summaries, and
    label-conditioned retrieval; also the per-class drift monitor a
    training pipeline snapshots every refresh.

    One posexplode → ONE partial-agg groupBy on (label, dim): the
    shuffle carries |labels|·d pre-summed rows per partition, not
    vectors. Means use the exact-BIGINT quantized-sum device of the
    Lloyd updates (order-independent integer sums, one double division
    at the end) so the oracle matches bit-for-bit — the same
    mergeable-statistics shape as exact_moment_correlation: per-shard
    moment sums union-merge, the statistic derives at read."""
    # spread=False: same posexplode→partial-agg shape as
    # sq8_quantized_topk — the rebalance exchange is a net tax here
    e = load_embeddings(spark, sf_dir, spread=False).select(
        "label", to_double_array("embedding").alias("v")
    )
    ex = e.select("label", F.posexplode("v").alias("pos", "x"))
    return ex.groupBy("label", "pos").agg(
        F.sum(F.floor(F.col("x") * F.lit(SCALE)).cast("long")).alias("s"),
        F.count("*").alias("c"),
    ).select(
        "label",
        F.col("pos").cast("long").alias("pos"),
        F.col("c").cast("long").alias("n_vecs"),
        (F.col("s").cast("double") / (F.lit(SCALE) * F.col("c"))).alias(
            "mean_val"
        ),
    )


# ---------------------------------------------------------------------------
# Semantic deduplication (SemDeDup) — embedding-space dedup materialized
# ---------------------------------------------------------------------------


def _semantic_dedup_oracle_sql() -> str:
    """IVF train/assign CTEs + in-cell pair search + recursive closure +
    canonical anti-join — the whole SemDeDup pipeline replayed in SQL
    (WITH RECURSIVE hoisted onto the shared IVF prefix)."""
    prefix = _ivf_train_assign_ctes().replace("WITH ", "WITH RECURSIVE ", 1)
    return f"""
    {prefix},
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM assigned a JOIN assigned b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE {sql_cosine_q(sql_dot_q('a.v', 'b.v'), 'a.nv', 'b.nv')}
              >= {NEAR_DUP_COSINE}
    ),
    und AS (
        SELECT id_a AS node, id_b AS peer FROM pairs
        UNION ALL
        SELECT id_b AS node, id_a AS peer FROM pairs
    ),
    reach(node, lbl) AS (
        SELECT node, node FROM (SELECT DISTINCT node FROM und)
        UNION
        SELECT u.node, r.lbl FROM und u JOIN reach r ON r.node = u.peer
    ),
    comp AS (SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
    drop_ids AS (SELECT node FROM comp WHERE node != cluster_id)
    SELECT corpus.vec_id FROM corpus
    WHERE corpus.vec_id NOT IN (SELECT node FROM drop_ids)
    """


@query("semantic_dedup_survivors", oracle=_semantic_dedup_oracle_sql())
def semantic_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. '23) end to end: semantic near-duplicates
    found in EMBEDDING space (paraphrases and re-encodings that share no
    n-grams) and the corpus MATERIALIZED with one canonical survivor per
    semantic cluster — the embedding-side twin of
    `dedup_materialize_canonical`'s text pipeline.

    Stages, each individually certified elsewhere and composed here:
    trained-IVF cell assignment (cluster the corpus), in-cell cosine
    pairs (the paper's within-cluster pairwise check — n²/K, never n²),
    connected components over the pairs, keep cluster-min, LEFT ANTI
    hash join back onto the corpus. The oracle replays training, pair
    search, and a recursive-CTE closure exactly. At 100 TB every stage
    is hash-partitioned; the drop list is cluster-count sized and
    broadcasts."""
    pairs = ivf_near_dup_pairs(spark, sf_dir, nprobe=1).select("id_a", "id_b")

    from .dedup import connected_components

    comp = connected_components(pairs)
    drop = comp.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("vec_id")
    )
    corpus = _vec_corpus(spark, sf_dir)
    return corpus.join(drop, "vec_id", "left_anti").select("vec_id")


# ---------------------------------------------------------------------------
# IVFPQ: cell-pruned search ranked by PQ/ADC codes (the FAISS flagship)
# ---------------------------------------------------------------------------


def _ivfpq_oracle_sql() -> str:
    """IVF train/assign CTEs + PQ train/encode CTEs (p-prefixed to
    avoid name collisions; both train on the SAME md5-sampled base) +
    in-cell ADC ranking — the full IVFPQ pipeline replayed."""
    sl = f"list_slice(v, m * {PQ_SUBDIM} + 1, m * {PQ_SUBDIM} + {PQ_SUBDIM})"
    passign = f"""
        SELECT vec_id, m, sv, cell FROM (
            SELECT s.vec_id, s.m, s.sv, c.cid AS cell,
                   ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                       ORDER BY {_sql_pq_dist('s.sv', 'c.cv')} ASC, c.cid)
                       AS rn
            FROM {{src}} s JOIN {{cent}} c ON c.m = s.m)
        WHERE rn = 1
    """
    return f"""
    {_ivf_train_assign_ctes()},
    pms AS (SELECT unnest(range({PQ_M})) AS m),
    pbsl AS (SELECT vec_id, m, {sl} AS sv FROM base, pms),
    pseedv AS (
        SELECT rn - 1 AS cid, v FROM (
            SELECT v, ROW_NUMBER() OVER (
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
            FROM base)
        WHERE rn <= {PQ_K}
    ),
    pcent0 AS (SELECT m, cid, {sl} AS cv
               FROM (SELECT cid, v FROM pseedv), pms),
    passign0 AS ({passign.format(src='pbsl', cent='pcent0')}),
    pcent1 AS (
        SELECT m, cell AS cid, list(mean ORDER BY i) AS cv FROM (
            SELECT m, cell, i,
                   CAST(CAST(SUM(CAST(floor(sv[i+1] * 1e9) AS BIGINT))
                             AS BIGINT) AS DOUBLE)
                   / (1000000000.0 * COUNT(*)) AS mean
            FROM passign0, (SELECT unnest(range({PQ_SUBDIM})) AS i) t
            GROUP BY m, cell, i)
        GROUP BY m, cell
    ),
    pcsl AS (SELECT vec_id, m, {sl} AS sv FROM corpus, pms),
    pcodes AS ({passign.format(src='pcsl', cent='pcent1')}),
    qtab AS (
        SELECT q.vec_id AS query_id, c.m, c.cid,
               {sql_dot_q('q.sv', 'c.cv')} AS pdot
        FROM pcsl q JOIN pcent1 c ON c.m = q.m
        WHERE q.vec_id % {TOPK_QUERY_MOD} = 0
    ),
    adc AS (
        SELECT t.query_id, k.vec_id AS neighbor_id,
               CAST(SUM(t.pdot) AS BIGINT) AS adc
        FROM pcodes k JOIN qtab t ON t.m = k.m AND t.cid = k.cell
        GROUP BY t.query_id, k.vec_id
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, a.adc,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY a.adc DESC, c.vec_id) AS rnk
        FROM assigned q
        JOIN assigned c ON q.cell = c.cell AND c.vec_id != q.vec_id
        JOIN adc a ON a.query_id = q.vec_id AND a.neighbor_id = c.vec_id
        WHERE q.vec_id % {TOPK_QUERY_MOD} = 0
    )
    SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, adc
    FROM scored WHERE rnk <= {TOPK_NEIGHBORS}
    """


@query("ivfpq_topk_neighbors", oracle=_ivfpq_oracle_sql())
def ivfpq_topk_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFPQ top-k — the two compression/pruning halves COMPOSED the
    way FAISS's flagship index composes them: the IVF stage prunes the
    candidate set to the query's cell (O(corpus/K) per query,
    `ivf_topk_neighbors`'s machinery) and the PQ stage ranks those
    candidates from 3-bit codes via the broadcast ADC table
    (`pq_topk_adc`'s machinery) — so the search touches neither the
    full corpus NOR any full-precision candidate vector. At 100 TB
    this is the billion-vector recipe: cells bound the scan, codes
    bound the bytes per candidate.

    Both trainings run on the SAME deterministic md5 sample; the
    oracle replays IVF training, PQ training, encoding, cell
    assignment and ADC ranking end to end — integer quantization
    keeps all of it bit-identical. Ranking is (adc desc, neighbor_id)
    per query over in-cell candidates only."""
    return _ivfpq_search(
        spark,
        sf_dir,
        _trained_centroids(spark, sf_dir),
        _trained_pq_codebooks(spark, sf_dir),
    )


def ivfpq_topk_from_store(
    spark: SparkSession,
    sf_dir: str,
    store,
    ivf_name: str = "ivf_centroids",
    pq_name: str = "pq_codebooks",
) -> DataFrame:
    """IVFPQ top-k consuming PERSISTED artifacts: both the IVF
    centroids and the PQ codebooks are read from the table store
    (train-once / search-many — the production cadence at 100 TB,
    where re-running Lloyd per search job would dominate the search
    itself). Bit-identical to :func:`ivfpq_topk_neighbors` when the
    stored artifacts came from the same corpus (pinned in tests)."""
    return _ivfpq_search(
        spark,
        sf_dir,
        load_ivf_centroids(store, ivf_name),
        load_pq_codebooks(store, pq_name),
    )


def _ivfpq_search(
    spark: SparkSession,
    sf_dir: str,
    cent_ivf: DataFrame,
    cent_pq: DataFrame,
) -> DataFrame:
    """The IVFPQ search plan, parameterized by artifact frames (trained
    in-session or reloaded from the table store — same plan either
    way)."""
    corpus_nv = _vec_corpus(spark, sf_dir)
    assigned = _assign_cells(corpus_nv, cent_ivf).persist()
    # the PQ encode and query-lookup inputs read the PERSISTED assigned
    # frame, not fresh corpus scans: _assign_cells emits exactly one row
    # per vec_id carrying the identical v, so the row set equals
    # _vec_corpus — the rewrite drops two parquet scans + two
    # mutant-union subtrees from the plan (3 corpus constructions → 1;
    # guide §2.4, plan diff in plans/r13/ivfpq_topk_neighbors_*.txt)
    corpus = assigned.select("vec_id", "v")

    codes = _pq_assign(
        _pq_slices(corpus, ["vec_id"]), cent_pq
    ).select("vec_id", "m", "cell")
    qtab = (
        _pq_slices(
            corpus.filter(F.col("vec_id") % TOPK_QUERY_MOD == 0), ["vec_id"]
        )
        .withColumnRenamed("vec_id", "query_id")
        .join(F.broadcast(cent_pq), "m")
        .select("query_id", "m", "cid", dot_q("sv", "cv").alias("pdot"))
    )
    q = assigned.filter(F.col("vec_id") % TOPK_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "cell"
    )
    cand = q.join(
        assigned.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("cell").alias("cell_c"),
        ),
        (F.col("cell") == F.col("cell_c"))
        & (F.col("neighbor_id") != F.col("query_id")),
    ).select("query_id", "neighbor_id")
    adc = (
        cand.join(codes, codes["vec_id"] == cand["neighbor_id"])
        .join(
            qtab,
            (codes["m"] == qtab["m"])
            & (codes["cell"] == qtab["cid"])
            & (cand["query_id"] == qtab["query_id"]),
        )
        .groupBy(cand["query_id"], "neighbor_id")
        .agg(F.sum("pdot").cast("long").alias("adc"))
    )
    rnk = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.desc("adc"), "neighbor_id")
    )
    return (
        adc.withColumn("rank", rnk.cast("long"))
        .filter(F.col("rank") <= TOPK_NEIGHBORS)
        .select("query_id", "neighbor_id", "rank", "adc")
    )


def save_pq_codebooks(store, name: str, cent: DataFrame) -> None:
    """Persist trained PQ codebooks as a table (atomic swap) — training
    artifacts ARE tables in this engine: train once on a sample batch,
    every later encode/search job reads the codebooks instead of
    re-running Lloyd (the production cadence; the minhash band index
    follows the same persist-the-index pattern)."""
    store.overwrite(name, cent.select("m", "cid", "cv", "ncv"))


def load_pq_codebooks(store, name: str) -> DataFrame:
    """Read persisted codebooks back in the exact shape _pq_assign
    expects. Determinism contract: encoding with RELOADED codebooks is
    bit-identical to encoding with the in-session frame (centroid
    arrays round-trip parquet exactly — they are doubles, not
    re-derived), asserted in tests."""
    return store.read(name).select("m", "cid", "cv", "ncv")


def save_ivf_centroids(store, name: str, cent: DataFrame) -> None:
    """Persist trained IVF centroids as a table (atomic swap), closing
    the artifact-lifecycle asymmetry the round-5 verdict flagged: PQ
    codebooks persisted while IVF centroids were session-memoized only.
    Same contract as :func:`save_pq_codebooks` — train once on a sample
    batch, every later assign/search job reads the table instead of
    re-running Lloyd."""
    store.overwrite(name, cent.select("cid", "cv", "ncv"))


def load_ivf_centroids(store, name: str) -> DataFrame:
    """Read persisted IVF centroids back in the exact shape
    _assign_cells expects. Parquet round-trips the exact-BIGINT-derived
    centroid doubles bit-for-bit, so assignment with reloaded centroids
    equals assignment with the in-session frame (asserted in tests)."""
    return store.read(name).select("cid", "cv", "ncv")
