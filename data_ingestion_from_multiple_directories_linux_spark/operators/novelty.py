"""Per-document shingle novelty: the memorization-risk / uniqueness score.

Dedup asks "which documents repeat each other"; curation also needs the
inverse signal per document — how much of THIS document's content
appears nowhere else in the corpus. A document whose shingles are
mostly corpus-unique is novel (high training value, higher
memorization risk if sensitive); one whose shingles are mostly shared
is boilerplate even when no single near-dup partner exists (template
farms, license headers spread across many pages — invisible to
pairwise dedup below its threshold, visible here).

Score: novelty_permille = 1000 · |shingles with df == 1| / |shingles|,
over the distinct 4-gram token shingles the exact-Jaccard machinery
already defines (operators/dedup.py ``_shingle_sets`` — imported, so
this scorer and the dedup family can never disagree on tokenization).

Scale shape — LINEAR, no self-join: one shingling pass, one groupBy on
shingle for document frequency, one join back, one per-doc aggregate.
The df table is the same inverted index the Jaccard pair generation
builds; a pipeline computing both shares it. Integer permille with
truncating div over non-negative counts (cross-engine exact).

Reference parity: none; SURVEY §2.12a additive (L167).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .dedup import _explode_shingles, _shingle_sets
from .registry import query
from .text_analysis import TOK_SQL

#: shingle width for the novelty score (the exact-Jaccard width).
NOVELTY_NGRAM = 4


@query(
    "shingle_novelty_scores",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id IS NOT NULL
    ),
    tok AS (
        SELECT doc_id, {TOK_SQL.format(c='text')} AS toks FROM corpus
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(len(toks) - {NOVELTY_NGRAM - 1}),
                   i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                        || ' ' || toks[i+4])) AS sh
        FROM tok WHERE len(toks) >= {NOVELTY_NGRAM}
    ),
    ex AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM sh),
    dfq AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS df FROM ex GROUP BY s)
    SELECT e.doc_id,
           CAST(MAX(e.n_sh) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unique,
           CAST((1000 * SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END))
                // MAX(e.n_sh) AS BIGINT) AS novelty_permille
    FROM ex e JOIN dfq d ON e.s = d.s
    GROUP BY e.doc_id
    """,
)
def shingle_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_shingles, n_unique, novelty_permille) for every
    document with ≥ {NOVELTY_NGRAM} tokens: the permille share of its
    distinct 4-gram shingles that occur in NO other document. 1000 =
    fully novel; 0 = pure boilerplate (every shingle shared somewhere).
    Shingles are distinct per document (``_shingle_sets``), so df is a
    document count and df == 1 means corpus-unique. NULL doc_ids are
    filtered (they cannot carry a per-doc score)."""
    corpus = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id", "text")
    )
    sh = _shingle_sets(corpus, NOVELTY_NGRAM)
    # explode_outer via the dedup helper: a plain explode lets Catalyst
    # push the inferred size(sh)>0 filter into the scan, evaluating the
    # shingle expression on rows the size(toks)>=n filter should have
    # removed (ANSI element_at crash on short docs + the 3x-eval perf
    # trap documented at _explode_shingles)
    ex = _explode_shingles(sh, ["n_sh"])
    dfq = ex.groupBy("s").agg(F.count("*").cast("long").alias("df"))
    return (
        ex.join(dfq, "s")
        .groupBy("doc_id")
        .agg(
            F.max("n_sh").cast("long").alias("n_shingles"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_unique"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_unique",
            F.expr("CAST((1000 * n_unique) DIV n_shingles AS BIGINT)").alias(
                "novelty_permille"
            ),
        )
    )
