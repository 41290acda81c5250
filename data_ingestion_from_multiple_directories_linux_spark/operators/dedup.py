"""Near-duplicate detection over ``documents`` (LLM-pipeline operators).

Two scalable near-dup designs, both avoiding any all-pairs join:

* **MinHash + banded LSH** — shingle → 64-hash MinHash signature → 32
  bands × 2 rows → candidate pairs only within band buckets → exact
  Jaccard verification of candidates. The banded join touches only
  colliding documents; with r=2/b=32 the probability of missing a pair
  with Jaccard >= 0.7 is (1-0.49)^32 ~= 4e-10, so the output equals the
  exact all-pairs answer (which is what the DuckDB oracle computes
  ground-truth-style via an inverted index).
* **n-gram Jaccard via inverted index** — explode distinct 4-gram
  shingles, self-join on the shingle (documents sharing at least one),
  count intersections per pair, filter by Jaccard. The join key is the
  shingle, so only documents sharing content ever meet. Shingle width is
  the selectivity lever: the test corpus draws from a ~30-word
  vocabulary, so bigrams are stop-shingles (every document collides with
  every other — measured 48s at sf0.1) while 4-grams are selective; at
  100 TB the same role is played by a document-frequency cap that drops
  shingles with df > ~10k before the join — standard inverted-index
  pruning.

The corpus has no near-duplicates by construction, so both queries first
synthesize them deterministically (doc_id % 7 == 0 → a copy at
doc_id + 10000 with 4 tokens appended); Spark plan and DuckDB oracle
build the same corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import band_buckets, minhash_signature_aggs, shingles, tokens
from .registry import query
from .text_analysis import TOK_SQL

#: near-dup corpus: every 7th doc gets a mutated copy (4 appended tokens)
NEAR_DUP_CORPUS_SQL = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 10000 AS doc_id, text || ' zz yy xx qq' AS text
    FROM documents WHERE doc_id % 7 = 0
"""

JACCARD_MINHASH_THRESHOLD = 0.7
JACCARD_NGRAM_THRESHOLD = 0.6


def _near_dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mut = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz yy xx qq")).alias("text"),
    )
    return d.unionByName(mut)


def _shingle_sets(corpus: DataFrame, n: int) -> DataFrame:
    """(doc_id, sh: array<string> distinct shingles, n_sh) — docs shorter
    than n tokens have no shingles and drop out (same WHERE in oracle).

    The corpus is hash-repartitioned on doc_id first: the test parquet is
    one small file → one input partition, and shingling is the expensive
    per-row expression (higher-order functions are interpreted, not
    codegen'd) — without the repartition the whole pass runs on a single
    core (measured 15s vs <1s at sf0.1). At 100 TB the scan has thousands
    of partitions and this is a cheap narrow re-balance."""
    tokd = (
        corpus.repartition(F.col("doc_id"))
        .select("doc_id", tokens("text").alias("toks"))
        .filter(F.size("toks") >= n)
    )
    return tokd.select("doc_id", shingles("toks", n).alias("sh")).withColumn(
        "n_sh", F.size("sh")
    )


def _explode_shingles(sh: DataFrame, extra: list[str]) -> DataFrame:
    """(doc_id, *extra, s) — one row per shingle.

    Uses explode_outer, not explode: for a plain explode Catalyst's
    InferFiltersFromGenerate adds ``size(sh) > 0 AND isnotnull(sh)`` and
    pushes it through the exchange into the scan, substituting the whole
    (interpreted, HOF-based) shingle expression into a pre-shuffle filter
    — evaluated ~3× per row, partly on the scan's single input partition
    (measured 20s vs 1s at sf0.1). Every doc here has >= 1 shingle, so
    outer semantics are identical; the isNotNull guard keeps the schema
    non-null without being pushable below the generate."""
    return (
        sh.select("doc_id", *extra, F.explode_outer("sh").alias("s"))
        .filter(F.col("s").isNotNull())
    )


def _jaccard_inverted_index_sql(corpus_sql: str, n: int, threshold: float) -> str:
    """Exact pairwise Jaccard >= threshold via an inverted index (DuckDB)."""
    parts = " || ' ' || ".join(f"toks[i+{k + 1}]" for k in range(n))
    return f"""
    WITH corpus AS ({corpus_sql}),
    tok AS (
        SELECT doc_id, {TOK_SQL.format(c='text')} AS toks FROM corpus
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(len(toks) - {n - 1}),
                                            i -> {parts})) AS sh
        FROM tok WHERE len(toks) >= {n}
    ),
    ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM sh),
    pair AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               COUNT(*) AS inter,
               any_value(a.n) AS n_a, any_value(b.n) AS n_b
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, inter / (n_a + n_b - inter) AS jaccard
    FROM pair
    WHERE inter / (n_a + n_b - inter) >= {threshold}
    """


# ---------------------------------------------------------------------------
# MinHash + banded LSH
# ---------------------------------------------------------------------------


@query(
    "minhash_lsh_near_dup",
    oracle=_jaccard_inverted_index_sql(
        NEAR_DUP_CORPUS_SQL, 3, JACCARD_MINHASH_THRESHOLD
    ),
)
def minhash_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-duplicate pairs (3-word shingles, Jaccard >= 0.7).

    Pipeline: distinct shingles → explode → one groupBy builds the 64-MIN
    signature (map-side partial MINs; shuffle = (doc, 64 longs)) → 32
    band buckets of 2 rows → posexplode → self-equi-join on
    (band, bucket) generates candidates *within buckets only* → exact
    Jaccard verification on candidates via array_intersect.

    At 100 TB: signature + banding cost is linear; the quadratic term is
    confined to same-bucket groups (true near-dups plus ~4e-10 noise).
    Hot buckets (mass-duplicated boilerplate) are the known skew risk —
    AQE skew-join handles moderate cases; pathological ones cap bucket
    size upstream. The DuckDB oracle computes ground truth exactly, so
    this entry verifies recall, not just plumbing.
    """
    corpus = _near_dup_corpus(spark, sf_dir)
    # sh feeds three plan branches (signature build + both sides of the
    # verification join) — persist the small (doc_id, shingles) frame so
    # the shingle pipeline runs once, not 3x (LRU-evicted, ~MBs here;
    # at 100 TB this is the materialized shingle table between stages)
    sh = _shingle_sets(corpus, 3).persist()

    ex = _explode_shingles(sh, [])
    sig = ex.groupBy("doc_id").agg(*minhash_signature_aggs("s", 64))
    bands = sig.select(
        "doc_id", F.posexplode(band_buckets(32, 2)).alias("band", "bucket")
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )

    sa = sh.select(
        F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"), F.col("n_sh").alias("n_a")
    )
    sb = sh.select(
        F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"), F.col("n_sh").alias("n_b")
    )
    pairs = cand.join(sa, "id_a").join(sb, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.col("n_a") + F.col("n_b") - inter)
    return pairs.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= JACCARD_MINHASH_THRESHOLD
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard via inverted index (exact, bucketed by shingle)
# ---------------------------------------------------------------------------


@query(
    "ngram_jaccard_pairs",
    oracle=_jaccard_inverted_index_sql(
        NEAR_DUP_CORPUS_SQL, 4, JACCARD_NGRAM_THRESHOLD
    ),
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 4-gram-shingle Jaccard pairs (>= 0.6) via inverted index.

    explode distinct shingles → self-join on the shingle (only documents
    sharing content meet) → per-pair intersection counts → Jaccard
    filter. The join is hash-partitioned on the shingle; intersection
    counting is a partial-agg groupBy on (id_a, id_b). At 100 TB a
    document-frequency cap (drop shingles with df > ~10k) bounds the
    per-shingle fan-out — standard stop-shingle pruning (see module
    docstring on shingle-width selectivity).
    """
    corpus = _near_dup_corpus(spark, sf_dir)
    sh = _shingle_sets(corpus, 4).withColumnRenamed("n_sh", "n")
    # both sides of the self-join read ex — persist so shingling runs once
    ex = _explode_shingles(sh, ["n"]).persist()
    a, b = ex.alias("a"), ex.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(
            F.count("*").alias("inter"),
            F.first("a.n").alias("n_a"),
            F.first("b.n").alias("n_b"),
        )
    )
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return pair.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= JACCARD_NGRAM_THRESHOLD
    )
