"""Corpus-level statistical audits (vocabulary growth / Heaps' law).

Tokenizer-budget planning for a training corpus needs the vocabulary
growth curve: how many DISTINCT tokens (and total tokens) the corpus
contains at each ingest prefix. Sub-linear growth (Heaps' law) is the
healthy shape; a near-linear distinct-token curve is the classic
symptom of an ID-like / junk token stream that will blow up a learned
tokenizer's merge table.

Exact and one-pass at any scale: the corpus collapses to TWO tiny
aggregates — per-term first-appearance doc (vocabulary-sized) and
per-doc token counts (document-sized) — and the 10-row decile table
broadcasts onto both for conditional sums. No corpus-sized window, no
global sort; prefix boundaries are exact integer arithmetic
((n_docs·d) div 10), so Spark's truncating `div` equals DuckDB's
flooring `//` on these non-negative values and the driver can
hash-compare the curve bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import BPE_RE, tokens
from .registry import query
from .text_analysis import TOK_SQL, _en_bigram_sql

#: curve resolution: prefixes at n·d/DECILES for d = 1..DECILES.
DECILES = 10


@query(
    "vocab_growth_curve",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({TOK_SQL.format(c='text')}) AS term FROM documents
    ),
    firsts AS (
        SELECT term, CAST(MIN(doc_id) AS BIGINT) AS first_doc
        FROM tok GROUP BY term
    ),
    dtok AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok
        FROM tok GROUP BY doc_id
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    dec AS (
        SELECT CAST(d AS BIGINT) AS decile,
               (nd.n_docs * d) // {DECILES} AS prefix_docs
        FROM range(1, {DECILES} + 1) t(d), nd
    ),
    vocab AS (
        SELECT dec.decile,
               CAST(SUM(CASE WHEN f.first_doc < dec.prefix_docs
                             THEN 1 ELSE 0 END) AS BIGINT) AS distinct_terms
        FROM dec CROSS JOIN firsts f GROUP BY dec.decile
    ),
    toks AS (
        SELECT dec.decile,
               CAST(dec.prefix_docs AS BIGINT) AS docs_prefix,
               CAST(SUM(CASE WHEN t.doc_id < dec.prefix_docs
                             THEN t.n_tok ELSE 0 END) AS BIGINT) AS total_tokens
        FROM dec CROSS JOIN dtok t GROUP BY dec.decile, dec.prefix_docs
    )
    SELECT t.decile, t.docs_prefix, v.distinct_terms, t.total_tokens
    FROM toks t JOIN vocab v USING (decile)
    """,
)
def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(decile, docs_prefix, distinct_terms, total_tokens) — the
    vocabulary growth curve at 10 ingest prefixes (docs ordered by
    doc_id, the ingest order of the synthetic corpus). distinct_terms
    counts terms whose first appearance falls inside the prefix;
    total_tokens sums token counts of prefix docs."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode_outer(tokens("text")).alias("term")
    ).filter(F.col("term").isNotNull())
    firsts = tok.groupBy("term").agg(F.min("doc_id").cast("long").alias("first_doc"))
    dtok = tok.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_tok"))
    nd = d.select(F.count("*").cast("long").alias("n_docs"))
    dec = (
        spark.range(1, DECILES + 1)
        .select(F.col("id").cast("long").alias("decile"))
        .crossJoin(F.broadcast(nd))
        .select(
            "decile",
            F.expr(f"(n_docs * decile) div {DECILES}").cast("long").alias(
                "prefix_docs"
            ),
        )
    )
    vocab = (
        firsts.crossJoin(F.broadcast(dec))
        .groupBy("decile")
        .agg(
            F.sum(
                F.when(F.col("first_doc") < F.col("prefix_docs"), 1).otherwise(0)
            )
            .cast("long")
            .alias("distinct_terms")
        )
    )
    toks = (
        dtok.crossJoin(F.broadcast(dec))
        .groupBy("decile", "prefix_docs")
        .agg(
            F.sum(
                F.when(F.col("doc_id") < F.col("prefix_docs"), F.col("n_tok"))
                .otherwise(0)
            )
            .cast("long")
            .alias("total_tokens")
        )
    )
    return toks.join(vocab, "decile").select(
        "decile",
        F.col("prefix_docs").alias("docs_prefix"),
        "distinct_terms",
        "total_tokens",
    )


# ---------------------------------------------------------------------------
# Per-source token drift (chi-square contributions)
# ---------------------------------------------------------------------------

#: divergent cells reported per source.
DRIFT_TOP_K = 10


@query(
    "source_token_drift",
    oracle=f"""
    WITH tok AS (
        SELECT source, unnest({TOK_SQL.format(c='text')}) AS term
        FROM documents WHERE source IS NOT NULL
    ),
    cells AS (
        SELECT source, term, CAST(COUNT(*) AS BIGINT) AS o
        FROM tok GROUP BY source, term
    ),
    rows_ AS (SELECT source, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY source),
    cols_ AS (SELECT term, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY term),
    grand AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
    full_grid AS (
        SELECT rw.source, cl.term, rw.r, cl.c, COALESCE(ce.o, 0) AS o
        FROM rows_ rw CROSS JOIN cols_ cl
        LEFT JOIN cells ce ON ce.source = rw.source AND ce.term = cl.term
    ),
    scored AS (
        SELECT source, term, o, r, c, g.n,
               CAST(floor(((CAST(o * g.n - r * c AS DOUBLE)
                            * CAST(o * g.n - r * c AS DOUBLE))
                           / CAST(r * c AS DOUBLE)) / CAST(g.n AS DOUBLE)
                          * 1000000.0) AS BIGINT) AS contrib_micro
        FROM full_grid, grand g
    )
    SELECT source, term, o, r, c, n, contrib_micro, CAST(rn AS BIGINT) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY source ORDER BY contrib_micro DESC, term
        ) AS rn FROM scored
    ) WHERE rn <= {DRIFT_TOP_K}
    """,
)
def source_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 drifting tokens per source by exact chi-square
    contribution: contrib = (o·N − r·c)² / (r·c·N), the homogeneity
    test's per-cell term, floor-quantized to micros on the 10^6 grid
    (the numerator difference is an exact BIGINT; the two divisions are
    fixed-shape double ops). Zero cells (a source never emitting a
    corpus term) are INCLUDED via the sources×vocab grid — they are
    drift evidence, and the grid is (n_sources · vocabulary) rows, tiny
    at any corpus size. This is the content-drift dashboard a mixture
    pipeline watches when a crawl source changes character: the
    shuffle is vocabulary-keyed partial aggregation; the grid and
    ranking windows run on aggregate-sized frames only."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("source").isNotNull())
    return drift_from_cells(token_cells(d))


def token_cells(docs: DataFrame) -> DataFrame:
    """(source, term, o) token-frequency cells of ``docs(source, text)``
    — the mergeable statistic behind the drift audit: cells of disjoint
    data slices MERGE BY ADDITION, which is what lets the streaming
    monitor (streaming/drift_monitor.py) keep them current per
    micro-batch and recompute the identical dashboard."""
    tok = docs.select(
        "source", F.explode_outer(tokens("text")).alias("term")
    ).filter(F.col("term").isNotNull())
    return tok.groupBy("source", "term").agg(
        F.count("*").cast("long").alias("o")
    )


def drift_from_cells(cells: DataFrame, persist: bool = True) -> DataFrame:
    """The chi-square drift dashboard computed from (source, term, o)
    cells — shared verbatim by the batch query and the streaming
    monitor, so the two surfaces cannot disagree about the scoring.

    ``persist=False`` skips the internal cache for callers that hand in
    an already-persisted/materialized cells frame and manage its
    lifetime themselves (the streaming monitor — a long-lived process
    where leaked caches accumulate across dashboard refreshes)."""
    if persist:
        cells = cells.persist()
    rows_ = cells.groupBy("source").agg(F.sum("o").cast("long").alias("r"))
    cols_ = cells.groupBy("term").agg(F.sum("o").cast("long").alias("c"))
    grand = cells.select(F.sum("o").cast("long").alias("n"))
    grid = (
        rows_.crossJoin(F.broadcast(cols_))
        .join(cells, ["source", "term"], "left")
        .select(
            "source",
            "term",
            "r",
            "c",
            F.coalesce("o", F.lit(0)).cast("long").alias("o"),
        )
        .crossJoin(F.broadcast(grand))
    )
    diff = (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast("double")
    chi = (diff * diff / (F.col("r") * F.col("c")).cast("double")) / F.col(
        "n"
    ).cast("double")
    scored = grid.select(
        "source",
        "term",
        "o",
        "r",
        "c",
        "n",
        F.floor(chi * F.lit(1000000.0)).cast("long").alias("contrib_micro"),
    )
    rn = F.row_number().over(
        W.partitionBy("source").orderBy(F.desc("contrib_micro"), F.asc("term"))
    )
    return (
        scored.withColumn("rank", rn.cast("long"))
        .filter(F.col("rank") <= DRIFT_TOP_K)
    )


# ---------------------------------------------------------------------------
# Language-ID confusion + tokenizer fertility by language
# ---------------------------------------------------------------------------


@query(
    "langid_confusion",
    oracle=f"""
    WITH pred AS (
        SELECT doc_id, lang,
               CASE WHEN ({_en_bigram_sql()})
                         / CAST(greatest(length(coalesce(text, '')), 1)
                                AS DOUBLE) >= 0.02
                    THEN 'en' ELSE 'und' END AS predicted
        FROM documents
    )
    SELECT lang, predicted, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY lang, predicted
    """,
)
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the L10 language-ID heuristic against the
    corpus's ground-truth ``lang`` column: (lang, predicted, n_docs).
    The predictor is language_id_ngram CALLED, not re-derived — the two
    surfaces share one implementation, so this eval can never audit a
    drifted copy. Label-space-sized output; one projection + one
    aggregation."""
    from .text_analysis import language_id_ngram

    pred = language_id_ngram(spark, sf_dir)
    return pred.groupBy("lang", "predicted").agg(
        F.count("*").cast("long").alias("n_docs")
    )


@query(
    "tokenizer_fertility_by_lang",
    oracle=f"""
    WITH t AS (
        SELECT lang,
               CAST(length(coalesce(text, '')) AS BIGINT) AS n_chars_t,
               CAST(len(regexp_extract_all(lower(coalesce(text, '')),
                                           '{BPE_RE}')) AS BIGINT) AS n_bpe
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars_t) AS BIGINT) AS total_chars,
           CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
           CAST((SUM(n_chars_t) * 1000000) // greatest(SUM(n_bpe), 1)
                AS BIGINT) AS chars_per_token_micro
    FROM t GROUP BY lang
    """,
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (chars per BPE-ish token, micro fixed point)
    per language — the multilingual-pipeline budget metric: a language
    whose fertility is far off the fleet average is paying more tokens
    per unit text, which skews both mixture weights (L41) and packing
    density (L39). Exact integers end to end: char/token counts are
    BIGINT sums and the ratio is one integer div on the 10^6 grid.
    Map-only scan + a language-count-sized aggregation."""
    d = load_table(spark, sf_dir, "documents")
    t = F.coalesce(F.col("text"), F.lit(""))
    from ..functions.text import bpe_tokens

    base = d.select(
        "lang",
        F.length(t).cast("long").alias("n_chars_t"),
        F.size(bpe_tokens(t)).cast("long").alias("n_bpe"),
    )
    return base.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars_t").cast("long").alias("total_chars"),
        F.sum("n_bpe").cast("long").alias("total_bpe_tokens"),
        F.expr(
            "(sum(n_chars_t) * 1000000) div greatest(sum(n_bpe), 1)"
        )
        .cast("long")
        .alias("chars_per_token_micro"),
    )
