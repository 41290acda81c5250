"""Cross-lingual near-deduplication.

A document and its translation share essentially NO surface n-grams,
so every text-shingle dedup path (L2 MinHash, L3 Jaccard, L45
incremental) is structurally blind to translated duplicates — a real
gap at corpus scale, where the same article crawled from two language
editions double-counts in the mixture. The industrial fix is to
normalize into a language-neutral CONCEPT space first (machine
translation into a pivot language, or cross-lingual embeddings), then
run the ordinary near-dup machinery there.

This operator implements that composition with a deterministic
translation stand-in (the sandbox has no MT model): documents in the
synthetic pivot language ``xx`` are token-wise mapped back to the
pivot (``reverse(token)`` — a stand-in with exactly the properties of
a dictionary-lookup translation: token-aligned, order-preserving,
vocabulary-bijective), every other language passes through. The
pipeline after normalization IS L2's: concept shingles → 64-hash
MinHash signature → 32×2 banded LSH buckets → in-bucket candidate
pairs → exact concept-Jaccard verification (``minhash_pairs``,
operators/dedup.py, reused not re-implemented) — finally restricted
to pairs whose LANGUAGES DIFFER (same-language near-dups already
belong to L2; this operator reports only what L2 cannot see).

A real deployment swaps ``_concept_text`` for an Arrow-batched
translation/embedding UDF over ``mapInPandas`` and nothing else
changes: bucketing, skew guards (bucket_cap), the banded-join
recall bound, and the persistable band index all carry over.

The corpus plants a translated twin (lang ``xx``, token-reversed
text) for every fifth document, so cross-lingual duplicates of known
identity exist at every SF; the DuckDB oracle computes exact
concept-shingle Jaccard over an inverted index (the L2 oracle
convention — no xxhash64 in DuckDB, and exact-recall banding makes
the LSH result equal the exact pair set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import tokens
from .dedup import minhash_pairs
from .registry import query
from .text_analysis import TOK_SQL

#: every Nth document gets a translated twin.
TWIN_MOD = 5
#: planted twin ids live above this offset.
TWIN_OFFSET = 1_000_000_000
#: concept-shingle width and the near-dup threshold (L2's settings).
XLING_NGRAM = 3
XLING_THRESHOLD = 0.7

_TOK = TOK_SQL.format(c="text")

#: the "translation" stand-in, SQL side: token-wise reverse, joined by
#: single spaces (tokenization is whitespace-splitting, so the joined
#: form shingles identically to the token array).
_XLATE_SQL = f"array_to_string(list_transform({_TOK}, t -> reverse(t)), ' ')"

#: corpus with planted translated twins (both engines build the same).
XLING_CORPUS_SQL = f"""
    SELECT doc_id, lang, text FROM documents WHERE text IS NOT NULL
    UNION ALL
    SELECT doc_id + {TWIN_OFFSET} AS doc_id, 'xx' AS lang,
           {_XLATE_SQL} AS text
    FROM documents WHERE text IS NOT NULL AND doc_id % {TWIN_MOD} = 0
"""


def _xlate(text: F.Column) -> F.Column:
    return F.array_join(F.transform(tokens(text), F.reverse), " ")


def _xling_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    base = d.select("doc_id", "lang", "text")
    twins = d.filter(F.col("doc_id") % TWIN_MOD == 0).select(
        (F.col("doc_id") + TWIN_OFFSET).alias("doc_id"),
        F.lit("xx").alias("lang"),
        _xlate(F.col("text")).alias("text"),
    )
    return base.unionByName(twins)


def concept_normalize(corpus: DataFrame) -> DataFrame:
    """Map every document into the language-neutral concept space:
    pivot-language (``xx``) texts are token-wise mapped back, all
    others pass through. The seam a real pipeline replaces with an
    Arrow-batched translation/embedding UDF."""
    return corpus.select(
        "doc_id",
        "lang",
        F.when(F.col("lang") == "xx", _xlate(F.col("text")))
        .otherwise(F.col("text"))
        .alias("text"),
    )


def crosslingual_pairs(
    corpus: DataFrame,
    n: int = XLING_NGRAM,
    threshold: float = XLING_THRESHOLD,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Cross-language near-dup pairs over ``corpus(doc_id, lang,
    text)``: concept-normalize, run the L2 MinHash-LSH + exact-verify
    pipeline, keep pairs whose languages differ. Columns: id_a, id_b,
    lang_a, lang_b, jaccard (id_a < id_b)."""
    concept = concept_normalize(corpus)
    pairs = minhash_pairs(
        concept.select("doc_id", "text"), n, threshold, bucket_cap
    )
    langs = corpus.select("doc_id", "lang")
    return (
        pairs.join(
            langs.select(
                F.col("doc_id").alias("id_a"), F.col("lang").alias("lang_a")
            ),
            "id_a",
        )
        .join(
            langs.select(
                F.col("doc_id").alias("id_b"), F.col("lang").alias("lang_b")
            ),
            "id_b",
        )
        .filter(F.col("lang_a") != F.col("lang_b"))
        .select("id_a", "id_b", "lang_a", "lang_b", "jaccard")
    )


@query(
    "crosslingual_near_dup",
    oracle=f"""
    WITH corpus AS ({XLING_CORPUS_SQL}),
    concept AS (
        SELECT doc_id, lang,
               CASE WHEN lang = 'xx' THEN {_XLATE_SQL} ELSE text END AS text
        FROM corpus
    ),
    tok AS (
        SELECT doc_id, {_TOK} AS toks FROM concept
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(len(toks) - {XLING_NGRAM - 1}),
                   i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS sh
        FROM tok WHERE len(toks) >= {XLING_NGRAM}
    ),
    ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM sh),
    pair AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               COUNT(*) AS inter,
               any_value(a.n) AS n_a, any_value(b.n) AS n_b
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, la.lang AS lang_a, lb.lang AS lang_b,
           inter / (n_a + n_b - inter) AS jaccard
    FROM pair
    JOIN corpus la ON la.doc_id = id_a
    JOIN corpus lb ON lb.doc_id = id_b
    WHERE inter / (n_a + n_b - inter) >= {XLING_THRESHOLD}
      AND la.lang <> lb.lang
    """,
)
def crosslingual_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-language near-duplicate pairs over the twin-planted corpus
    (concept Jaccard >= XLING_THRESHOLD, languages differ) — every
    planted translated twin must pair with its original at jaccard 1.0
    (no-false-negatives pytest-pinned), and nothing same-language is
    reported."""
    return crosslingual_pairs(_xling_corpus(spark, sf_dir))
