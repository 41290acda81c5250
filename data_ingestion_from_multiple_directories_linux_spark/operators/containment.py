"""Asymmetric shingle containment — the near-dup case Jaccard misses.

Broder's containment C(A→B) = |A∩B| / |A| detects INCLUSION: a page
that quotes another wholesale (aggregators, mirrors-with-chrome,
quote-heavy forums) contains ~all of the source's shingles, yet the
pair's Jaccard is low because the container is much larger. A dedup
stack keyed only on symmetric similarity ships both copies into
training; the containment pass is the standard companion (Broder '97
uses exactly this pair of resemblance/containment estimators).

Pipeline: the SAME inverted-index self-join as ngram_jaccard_pairs
(operators/dedup.py — shingle sets, explode, equi-join on the shingle,
per-pair intersection counts), then BOTH scores from the same counts:
jaccard = inter/(n_a+n_b−inter) and containment = inter/min(n_a,n_b).
The registered corpus plants a container twin for every 9th document
(original text + a fixed 120-token passage), so the planted pairs score
containment 1.0 while sitting far BELOW the Jaccard dedup threshold —
the blind spot, demonstrated in the result and pytest-pinned.

Scale shape is inherited: the only quadratic is within inverted-index
buckets, bounded in production by the df-cap guard (jaccard_pairs'
df_cap argument applies unchanged — same index); everything else is
aggregate-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .dedup import _explode_shingles, _shingle_sets
from .registry import query
from .text_analysis import TOK_SQL

#: containment report threshold (≥, on the smaller set).
CONTAINMENT_THRESHOLD = 0.9
#: shingle width (the ngram_jaccard_pairs convention).
SHINGLE_N = 4
#: the fixed passage appended to every 9th doc's container twin —
#: 120 filler tokens (vocabulary disjoint from the corpus), long enough
#: to dilute even the longest documents' Jaccard below the 0.6 dedup
#: threshold while containment stays exactly 1.0.
_FILLER = " ".join(f"pad{i:03d}" for i in range(120))

#: corpus with planted container twins (both engines build it). Twin
#: ids start at max(doc_id)+1 — derived from the corpus, not a fixed
#: offset, so they can never collide with real doc_ids at any scale.
CONTAINMENT_CORPUS_SQL = f"""
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents) AS doc_id,
           text || ' {_FILLER}' AS text
    FROM documents WHERE doc_id % 9 = 0
"""


def containment_pairs(
    corpus: DataFrame, n: int, threshold: float
) -> DataFrame:
    """(id_a, id_b, inter, n_a, n_b, containment, jaccard) for pairs
    whose smaller-set containment ≥ threshold. Same inverted index as
    jaccard_pairs; both scores are fixed-shape double projections of
    the exact integer counts."""
    sh = _shingle_sets(corpus, n).withColumnRenamed("n_sh", "n")
    ex = _explode_shingles(sh, ["n"]).persist()
    a, b = ex.alias("a"), ex.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(
            F.count("*").cast("long").alias("inter"),
            F.first("a.n").cast("long").alias("n_a"),
            F.first("b.n").cast("long").alias("n_b"),
        )
    )
    cont = F.col("inter").cast("double") / F.least("n_a", "n_b").cast("double")
    jac = F.col("inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("inter")
    ).cast("double")
    return pair.select(
        "id_a",
        "id_b",
        "inter",
        "n_a",
        "n_b",
        cont.alias("containment"),
        jac.alias("jaccard"),
    ).filter(F.col("containment") >= threshold)


@query(
    "shingle_containment_pairs",
    oracle=f"""
    WITH corpus AS ({CONTAINMENT_CORPUS_SQL}),
    tok AS (
        SELECT doc_id, {TOK_SQL.format(c='text')} AS toks FROM corpus
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(len(toks) - {SHINGLE_N - 1}),
                   i -> {" || ' ' || ".join(f"toks[i+{k + 1}]" for k in range(SHINGLE_N))}
               )) AS sh
        FROM tok WHERE len(toks) >= {SHINGLE_N}
    ),
    ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM sh),
    pair AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS inter,
               CAST(any_value(a.n) AS BIGINT) AS n_a,
               CAST(any_value(b.n) AS BIGINT) AS n_b
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, inter, n_a, n_b,
           CAST(inter AS DOUBLE) / CAST(least(n_a, n_b) AS DOUBLE)
               AS containment,
           CAST(inter AS DOUBLE) / CAST(n_a + n_b - inter AS DOUBLE)
               AS jaccard
    FROM pair
    WHERE CAST(inter AS DOUBLE) / CAST(least(n_a, n_b) AS DOUBLE)
          >= {CONTAINMENT_THRESHOLD}
    """,
)
def shingle_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment-≥-0.9 pairs over the planted-container corpus, with
    the Jaccard column alongside — the planted (original, container)
    pairs show containment 1.0 at Jaccard far below the 0.6 dedup
    threshold, the inclusion blind spot this operator closes."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # twin ids start past the corpus max — a 1-row broadcast, same
    # pattern as the n_docs scalar joins elsewhere; no fixed offset
    # that a >20k-doc corpus could collide with.
    off = d.agg((F.max("doc_id") + F.lit(1)).alias("_off"))
    twins = (
        d.filter(F.col("doc_id") % 9 == 0)
        .crossJoin(F.broadcast(off))
        .select(
            (F.col("doc_id") + F.col("_off")).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" " + _FILLER)).alias("text"),
        )
    )
    corpus = d.unionByName(twins)
    return containment_pairs(corpus, SHINGLE_N, CONTAINMENT_THRESHOLD)
