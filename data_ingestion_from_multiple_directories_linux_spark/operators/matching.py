"""Approximate-matching operators: blocked fuzzy string match + token
co-occurrence lift (SURVEY.md §2.12a L59/L60).

Entity resolution and collocation mining are the two classic
"all-pairs-but-not-really" problems; both are made scale-safe here the
same way the dedup family is (operators/dedup.py): a cheap blocking key
bounds the candidate set BEFORE any pairwise work, and the expensive
comparison (edit distance / lift) runs only inside blocks.

Determinism: edit distances are integers; lift is surfaced as an
integer-DIV permille ratio, never a float log — so both engines
hash-compare exactly (same device as operators/corpus.py's integer
arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query
from .text_analysis import TOK_SQL

__all__ = ["fuzzy_part_match", "token_cooccurrence_lift"]

#: max edit distance for a fuzzy name match
FUZZY_MAX_DIST = 3


@query(
    "fuzzy_part_match",
    oracle=f"""
    WITH names AS (SELECT DISTINCT p_name FROM part),
    keyed AS (
        SELECT p_name, split_part(p_name, ' ', 2) AS block FROM names
    )
    SELECT a.block AS block,
           a.p_name AS name_a,
           b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
    FROM keyed a
    JOIN keyed b ON a.block = b.block AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
    ORDER BY block, name_a, name_b
    """,
)
def fuzzy_part_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy part-name matching: candidate near-identical name pairs
    within a blocking key, scored by edit distance.

    The blocking key (the name's noun token) turns the quadratic
    all-pairs levenshtein into per-block pair enumeration — the same
    candidate-bounding move MinHash banding makes for documents
    (operators/dedup.py), here in its entity-resolution form. Plan:
    DISTINCT names first (the pair space is over distinct strings, and
    on a real catalog that's orders of magnitude smaller than rows),
    one hash shuffle on the block key, pairs + levenshtein codegen'd
    inside each block, `name_a < name_b` kills mirrors and self-pairs.
    At 100 TB the block key would be (length bucket, first char,
    phonetic key) — the guard rails are the block-size cap pattern
    already contract-verified by ngram_jaccard_capped.

    NULL/short-name contract: ``F.get`` (not ``getItem``) — under ANSI
    mode ``getItem(1)`` ABORTS the whole query on any single-token
    name, where the oracle's ``split_part(..., 2)`` returns ``''``
    (review finding, confirmed by run). ``F.get`` yields NULL
    out-of-bounds; the coalesce maps that to ``''`` so single-token
    names block together exactly as in DuckDB, while a NULL name stays
    NULL-blocked (and is killed by the ``<`` predicate either way).

    Distance contract: edit distance counts UTF-8 BYTES, not
    codepoints — DuckDB's (and PostgreSQL fuzzystrmatch's) levenshtein
    is byte-based, while Spark's is codepoint-based ('café'→'cafe' is
    2 vs 1; found by the unicode-zoo parity sweep as a 2-row count
    drift). Spark computes the byte distance by running its
    levenshtein over a latin-1 view of the UTF-8 bytes
    (decode(encode(s,'UTF-8'),'ISO-8859-1') — one char per byte, and
    latin-1 decodes every byte, so the view is total). Identical to
    character distance on ASCII catalogs; on multibyte names a byte
    edit is an upper bound of the character edit."""
    names = (
        load_table(spark, sf_dir, "part").select("p_name").distinct()
    )
    keyed = names.select(
        "p_name",
        F.when(
            F.col("p_name").isNotNull(),
            F.coalesce(
                F.get(F.split(F.col("p_name"), " "), 1), F.lit("")
            ),
        ).alias("block"),
    )
    a = keyed.alias("a")
    b = keyed.alias("b")

    def _bytes_view(col):  # one latin-1 char per UTF-8 byte
        return F.decode(F.encode(col, "UTF-8"), "ISO-8859-1")

    dist = F.levenshtein(
        _bytes_view(F.col("a.p_name")), _bytes_view(F.col("b.p_name"))
    )
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .filter(dist <= FUZZY_MAX_DIST)
        .select(
            F.col("a.block").alias("block"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.cast("long").alias("edit_dist"),
        )
        .orderBy("block", "name_a", "name_b")
    )


#: vocabulary cap: pairs are enumerated only among the top-V tokens by
#: document frequency — bounds the pair space to V² regardless of corpus
COOC_VOCAB = 40
#: minimum co-occurring documents for a pair to be reported
COOC_MIN_PAIR = 5


@query(
    "token_cooccurrence_lift",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_distinct({TOK_SQL.format(c='text')})) AS token
        FROM documents
    ),
    df AS (
        SELECT token, COUNT(*) AS n_docs FROM toks GROUP BY token
    ),
    vocab AS (
        SELECT token, n_docs
        FROM df ORDER BY n_docs DESC, token LIMIT {COOC_VOCAB}
    ),
    vt AS (
        SELECT t.doc_id, t.token, v.n_docs
        FROM toks t JOIN vocab v ON t.token = v.token
    ),
    pairs AS (
        SELECT a.token AS token_a, b.token AS token_b,
               a.n_docs AS df_a, b.n_docs AS df_b,
               COUNT(*) AS n_both
        FROM vt a JOIN vt b
          ON a.doc_id = b.doc_id AND a.token < b.token
        GROUP BY 1, 2, 3, 4
    ),
    n AS (SELECT COUNT(*) AS n_corpus FROM documents)
    SELECT token_a, token_b,
           CAST(n_both AS BIGINT) AS n_both,
           CAST(df_a AS BIGINT) AS df_a,
           CAST(df_b AS BIGINT) AS df_b,
           CAST((1000 * n_both * n_corpus) // (df_a * df_b) AS BIGINT)
               AS lift_permille
    FROM pairs, n
    WHERE n_both >= {COOC_MIN_PAIR}
    ORDER BY token_a, token_b
    """,
)
def token_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token collocation mining: document-level co-occurrence counts and
    lift (observed/expected ratio) for pairs of high-frequency tokens.

    The pair space is capped to the top-{COOC_VOCAB} tokens by document
    frequency — the stop-vocabulary trick that keeps collocation mining
    linear: the doc×token explode is bounded by V tokens per doc after
    the vocab semi-join, so the per-doc pair join does ≤V²/2 work per
    document instead of (tokens/doc)². Plan: doc-distinct tokens (one
    explode + list_distinct), document frequencies (one groupBy), vocab
    top-V (TakeOrderedAndProject, alpha tiebreak), vocab BROADCAST onto
    the token stream, then the within-doc pair self-join on doc_id.
    Lift = P(a,b)/(P(a)P(b)) surfaced as integer permille
    ((1000·n_both·N) DIV (df_a·df_b)) — no float log, engines agree
    exactly. Corpus size joins in as a 1-row broadcast scalar (same
    pattern as tf_idf's)."""
    from ..functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("token")
    )
    df = toks.groupBy("token").agg(F.count("*").alias("n_docs"))
    vocab = df.orderBy(F.desc("n_docs"), "token").limit(COOC_VOCAB)
    # vt feeds BOTH sides of the within-doc pair self-join — persist so
    # the corpus tokenize+explode runs once, not once per alias (the
    # same device as dedup.jaccard_pairs' shingle frame; LRU-evicted,
    # bounded: ≤COOC_VOCAB rows per doc after the vocab semi-join)
    vt = (
        toks.join(F.broadcast(vocab), "token")
        .select("doc_id", "token", "n_docs")
        .persist()
    )
    a = vt.alias("a")
    b = vt.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.token") < F.col("b.token")),
        )
        .groupBy(
            F.col("a.token").alias("token_a"),
            F.col("b.token").alias("token_b"),
            F.col("a.n_docs").alias("df_a"),
            F.col("b.n_docs").alias("df_b"),
        )
        .agg(F.count("*").alias("n_both"))
        .filter(F.col("n_both") >= COOC_MIN_PAIR)
    )
    n = d.agg(F.count("*").alias("n_corpus"))
    return (
        pairs.crossJoin(F.broadcast(n))
        .select(
            "token_a",
            "token_b",
            F.col("n_both").cast("long").alias("n_both"),
            F.col("df_a").cast("long").alias("df_a"),
            F.col("df_b").cast("long").alias("df_b"),
            F.expr("(1000 * n_both * n_corpus) DIV (df_a * df_b)")
            .cast("long")
            .alias("lift_permille"),
        )
        .orderBy("token_a", "token_b")
    )
