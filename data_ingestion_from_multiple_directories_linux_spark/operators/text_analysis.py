"""LLM-pipeline text operators over the ``documents`` table.

The reference is a relational ETL system with no text analytics; these are
the additive training-data-pipeline operators the north star requires
(BASELINE.json): exact dedup, token statistics, quality scoring,
language-ID, SimHash fingerprinting, and binary/multimodal plumbing.

Scale design notes (100 TB):
* exact dedup groups on a 256-bit content digest — the shuffle carries
  (digest, id), never document bodies; one hash partitioning, map-side
  partial MIN/COUNT.
* all token statistics are per-row projections (zero shuffle) built from
  split/filter/transform/regexp — whole-stage codegen, no Python UDFs.
* SimHash is explode → one hash-partitioned groupBy with 16 partial SUM
  aggregates — one shuffle of (doc_id, 16 ints).

The documents corpus has no exact duplicates by construction, so dedup
queries first synthesize duplicates deterministically (doc_id % 7 == 0 →
a copy at doc_id + 10000) — both the Spark plan and the DuckDB oracle
build the same corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import (
    BPE_RE,
    EN_BIGRAMS,
    STOPWORDS,
    bigram_count,
    bpe_tokens,
    punct_count,
    simhash16_aggs,
    simhash16_assemble,
    stopword_hits,
    token_char_sum,
    tokens,
)
from .registry import query

#: DuckDB twin of functions.text.tokens()
TOK_SQL = "list_filter(string_split_regex(lower({c}), '\\s+'), x -> x <> '')"

#: corpus with synthesized exact duplicates (both engines build the same)
DUP_CORPUS_SQL = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
"""


def _dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    return d.unionByName(dup)


# ---------------------------------------------------------------------------
# Exact deduplication (hash-groupBy — never a self-join)
# ---------------------------------------------------------------------------


@query(
    "exact_dedup_documents",
    oracle=f"""
    SELECT sha256(text) AS digest,
           MIN(doc_id) AS keeper_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM ({DUP_CORPUS_SQL})
    GROUP BY sha256(text)
    """,
)
def exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: group on sha2(text) keeping the smallest id.

    At 100 TB this is THE scalable exact-dedup shape: one groupBy on a
    256-bit digest (collision-free in practice). The shuffle moves
    (digest, doc_id) pairs — 40 bytes/row — not document text; partial
    MIN/COUNT run map-side. Never expressed as a self-join (quadratic on
    duplicate-heavy corpora).
    """
    corpus = _dup_corpus(spark, sf_dir)
    return corpus.groupBy(F.sha2(F.col("text"), 256).alias("digest")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count("*").alias("n_copies"),
    )


# ---------------------------------------------------------------------------
# Token statistics
# ---------------------------------------------------------------------------


@query(
    "token_frequency_topk",
    oracle=f"""
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest({TOK_SQL.format(c='text')}) AS token FROM documents)
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 50
    """,
)
def token_frequency_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequency, top-50 tokens.

    explode → groupBy(token) → TakeOrderedAndProject. Partial counts
    combine map-side, so the shuffle carries one row per distinct token
    per partition; top-k is a per-partition heap + driver merge, no
    global sort.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(50)
    )


@query(
    "doc_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({TOK_SQL.format(c='text')}) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '{BPE_RE}')) AS BIGINT)
               AS n_bpe_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_measured
    FROM documents
    """,
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens (letter
    runs / digit runs / single symbols) + characters. Pure projection —
    zero shuffle, codegen'd regex."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(tokens("text")).cast("long").alias("n_ws_tokens"),
        F.size(bpe_tokens("text")).cast("long").alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
    )


@query(
    "text_quality_scores",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, text, {TOK_SQL.format(c='text')} AS toks FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CASE WHEN len(toks) > 0 THEN
               CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                   / len(toks) ELSE 0.0 END AS avg_token_len,
           CASE WHEN len(toks) > 0 THEN
               CAST(len(list_filter(toks, x -> x IN {STOPWORDS!r})) AS DOUBLE)
                   / len(toks) ELSE 0.0 END AS stopword_ratio,
           CASE WHEN length(text) > 0 THEN
               CAST(length(text)
                    - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))
                    AS DOUBLE) / length(text) ELSE 0.0 END AS punct_ratio
    FROM t
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality heuristics: mean token length, stopword ratio,
    punctuation ratio — the standard pre-training filters (length /
    symbol / stopword gates). Each ratio is a single double division of
    exact integers, so values are engine-portable. Zero shuffle."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    withs = d.select("doc_id", "text", toks.alias("toks"))
    n_tok = F.size("toks")
    # zero-denominator guards, IDENTICAL on both engines: an empty or
    # whitespace-only document yields 0.0 ratios — unguarded, Spark's
    # Divide returns NULL while DuckDB returns NaN, an engine
    # divergence waiting for the first empty doc (review finding)
    def ratio(num, den):
        return F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))

    return withs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        ratio(token_char_sum("toks"), n_tok).alias("avg_token_len"),
        ratio(stopword_hits("toks"), n_tok).alias("stopword_ratio"),
        ratio(punct_count("text"), F.length("text")).alias("punct_ratio"),
    )


# ---------------------------------------------------------------------------
# Language ID (character-n-gram heuristic)
# ---------------------------------------------------------------------------


def _en_bigram_sql() -> str:
    t = "coalesce(text, '')"
    terms = [
        f"(length(lower({t})) - length(replace(lower({t}), '{b}', ''))) / 2"
        for b in EN_BIGRAMS
    ]
    return " + ".join(terms)


@query(
    "language_id_ngram",
    oracle=f"""
    SELECT doc_id, lang,
           ({_en_bigram_sql()})
               / CAST(greatest(length(coalesce(text, '')), 1) AS DOUBLE)
               AS en_score,
           CASE WHEN ({_en_bigram_sql()})
                     / CAST(greatest(length(coalesce(text, '')), 1) AS DOUBLE)
                     >= 0.02
                THEN 'en' ELSE 'und' END AS predicted
    FROM documents
    """,
)
def language_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via character-bigram frequency (th/he/er/an density) —
    the classic n-gram-profile heuristic reduced to marker bigrams.
    Counting is replace-length arithmetic (portable, codegen'd); one
    projection, zero shuffle. At scale the marker table extends per
    language; the plan shape is unchanged.

    The score is UNCONDITIONAL on purpose: NULL text is coalesced to ''
    at the leaf and the zero-denominator guard is greatest(len, 1)
    (0/1 = 0.0, the same result the old CASE WHEN produced) — a
    conditional branch around the 4-bigram sum disables whole-stage
    codegen's subexpression elimination, so the sum was evaluated TWICE
    (en_score + predicted), 2.4x the runtime at sf0.1 (r07 finding)."""
    d = load_table(spark, sf_dir, "documents")
    t = F.coalesce(F.col("text"), F.lit(""))
    score = None
    for b in EN_BIGRAMS:
        c = bigram_count(t, b)
        score = c if score is None else score + c
    en_score = score / F.greatest(F.length(t), F.lit(1)).cast("double")
    return d.select(
        "doc_id",
        "lang",
        en_score.alias("en_score"),
        F.when(en_score >= 0.02, "en").otherwise("und").alias("predicted"),
    )


# ---------------------------------------------------------------------------
# SimHash fingerprint (document fingerprinting)
# ---------------------------------------------------------------------------


def _simhash_oracle() -> str:
    votes = ",\n           ".join(
        "SUM(((strpos('0123456789abcdef', substring(md5(t), "
        f"{j + 1}, 1)) - 1) % 2) * 2 - 1) AS s{j}"
        for j in range(16)
    )
    fp = " + ".join(f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(16))
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest(list_distinct({TOK_SQL.format(c='text')})) AS t
        FROM documents
    ),
    votes AS (
        SELECT doc_id,
           {votes}
        FROM tok GROUP BY doc_id
    )
    SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM votes
    """


@query("simhash_fingerprint", oracle=_simhash_oracle())
def simhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash document fingerprint.

    Per distinct token, each bit votes ±1 by the parity of an md5 nibble;
    the fingerprint sets bits with positive vote sums. Near-duplicate
    documents differ in few bits (Hamming distance), so at scale dedup
    groups fingerprints by a handful of rotated prefixes instead of
    comparing pairs. Plan: explode(distinct tokens) → one groupBy with 16
    partial SUMs — a single shuffle of (doc_id, 16 ints). md5-nibble
    parity keeps the function reproducible in any SQL engine (the
    oracle recomputes it exactly). Repartitioned on doc_id first: the
    tokenizer is an interpreted higher-order expression and the test
    parquet is one file — one task otherwise runs the whole explode."""
    d = load_table(spark, sf_dir, "documents").repartition(F.col("doc_id"))
    tok = d.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("t")
    )
    votes = tok.groupBy("doc_id").agg(*simhash16_aggs("t"))
    return votes.select("doc_id", simhash16_assemble().alias("simhash"))


# ---------------------------------------------------------------------------
# Multimodal / binary column plumbing
# ---------------------------------------------------------------------------


@query(
    "media_binary_stats",
    oracle="""
    SELECT doc_id,
           'text/plain' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS content_sha256
    FROM documents
    """,
)
def media_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column handling: payload bytes + typed metadata.

    Multimodal assets (image/audio/video) ride through the engine as
    ``binary`` columns with typed metadata; this query exercises the
    JVM-side binary path — encode to bytes, byte length, content digest —
    the same projection a 100 TB media table would run for integrity
    checks. Decode/feature-extraction lives in operators/multimodal.py
    (Arrow-batched mapInPandas)."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("content_sha256"),
    )


# ---------------------------------------------------------------------------
# TF-IDF term relevance
# ---------------------------------------------------------------------------


@query(
    "tf_idf_scores",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({TOK_SQL.format(c='text')}) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok GROUP BY doc_id, term
    ),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.term, tf.tf, df.df,
           tf.tf * (n.n_docs + 1.0) / (df.df + 1.0) AS score
    FROM tf JOIN df USING (term) CROSS JOIN n
    """,
)
def tf_idf_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF term relevance per (document, term).

    tf = term occurrences in the doc; df = documents containing the term;
    score = tf · (N+1)/(df+1) — a *rational* idf (no logarithm) so Spark
    and the oracle produce bit-identical doubles: each score is one
    multiply + one divide in a fixed order, whereas ln() implementations
    may differ in the last ulp across engines. Monotone in 1/df, so
    ranking behavior matches the textbook form.

    Scale shape: explode → partial-agg groupBy (doc_id, term) for tf →
    groupBy(term) for df. The df table is vocabulary-sized — tiny next to
    the corpus — so it joins back as a BROADCAST, and the N scalar is a
    1-row broadcast cross join; the only data-sized shuffle is the tf
    aggregation."""
    d = load_table(spark, sf_dir, "documents").repartition(F.col("doc_id"))
    tok = d.select(
        "doc_id", F.explode_outer(tokens("text")).alias("term")
    ).filter(F.col("term").isNotNull())
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = d.select(F.countDistinct("doc_id").alias("n_docs"))
    return (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (
                F.col("tf") * (F.col("n_docs") + F.lit(1.0))
                / (F.col("df") + F.lit(1.0))
            ).alias("score"),
        )
    )


@query(
    "rolling_hash_fingerprint",
    oracle="""
    SELECT doc_id,
           CAST(length(w) AS BIGINT) AS n_windows,
           CAST(length(list_distinct(w)) AS BIGINT) AS n_distinct,
           list_min(w) AS fingerprint
    FROM (
        SELECT doc_id,
               CASE WHEN text IS NOT NULL THEN list_transform(
                   generate_series(1, greatest(length(text) - 15, 1), 4),
                   i -> md5(substr(text, i, 16))
               ) END AS w
        FROM documents
    )
    """,
)
def rolling_hash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting via rolling window hashes (winnowing-lite,
    MOSS-style): hash every 4th 16-char window of the text, keep the
    minimum hash as the document fingerprint plus window/distinct counts.
    Two documents sharing any long run of text will frequently share the
    min-hash window, so equal fingerprints are near-dup candidates —
    grouping by ``fingerprint`` is the candidate-generation step, exactly
    the banded-bucket idea of [[L2]] minhash but content-positional.

    md5 is bit-identical across engines (unlike the engines' native
    ``hash``), making the oracle exact. All JVM-side expressions — the
    higher-order ``transform`` is interpreted per element but the md5 is
    JVM bytes — and a pure projection: zero shuffles, the scan's splits
    parallelize it. The stride (4) bounds cost to len/4 hashes per doc;
    at 100 TB this runs as a map-only stage whose output (one 32-char
    fingerprint per doc) is 100× smaller than the corpus.

    NULL contract (adversarial-corpus finding): a NULL text has NULL
    windows/counts/fingerprint on BOTH sides — stated explicitly
    because the engines' ``greatest`` disagree (Spark SKIPS NULL args
    and would fabricate one md5(NULL) window; DuckDB propagates).
    """
    d = load_table(spark, sf_dir, "documents", spread=True)
    w = F.expr(
        "CASE WHEN text IS NOT NULL THEN"
        " transform(sequence(1, greatest(length(text) - 15, 1), 4),"
        " i -> md5(substring(text, i, 16))) END"
    )
    # materialize the window array once per row; referencing `w` three
    # times in one projection would re-run the interpreted transform 3×
    return d.select("doc_id", w.alias("w")).select(
        "doc_id",
        F.size("w").cast("bigint").alias("n_windows"),
        F.size(F.array_distinct("w")).cast("bigint").alias("n_distinct"),
        F.array_min("w").alias("fingerprint"),
    )


@query(
    "quality_filter_pipeline",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, text, {TOK_SQL.format(c='text')} AS toks FROM documents
    ),
    m AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CASE WHEN len(toks) > 0 THEN
                   CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                       / len(toks) ELSE 0.0 END AS avg_token_len,
               CASE WHEN len(toks) > 0 THEN
                   CAST(len(list_filter(toks, x -> x IN {STOPWORDS!r})) AS DOUBLE)
                       / len(toks) ELSE 0.0 END AS stopword_ratio,
               CASE WHEN length(text) > 0 THEN
                   CAST(length(text)
                        - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))
                        AS DOUBLE) / length(text) ELSE 0.0 END AS punct_ratio
        FROM scored
    )
    SELECT doc_id, n_tokens, avg_token_len, stopword_ratio, punct_ratio
    FROM m
    WHERE n_tokens >= 20
      AND avg_token_len BETWEEN 3.0 AND 12.0
      AND stopword_ratio >= 0.05
      AND punct_ratio <= 0.2
    """,
)
def quality_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end pre-training quality gate: compute the L9 quality
    heuristics and KEEP only documents passing all thresholds (min
    length, sane token shape, enough stopwords to look like prose, low
    symbol noise) — i.e. the corpus-filtering step a training-data
    pipeline actually runs, composed from the same expressions as
    ``text_quality_scores``.

    Zero shuffle: score + filter is a map-only pipeline, so at 100 TB
    it streams through the scan's splits; the retained subset writes
    straight to the sink with no repartition unless the caller asks for
    output file sizing."""
    scored = text_quality_scores(spark, sf_dir)
    return scored.filter(
        (F.col("n_tokens") >= 20)
        & F.col("avg_token_len").between(3.0, 12.0)
        & (F.col("stopword_ratio") >= 0.05)
        & (F.col("punct_ratio") <= 0.2)
    )


# ---------------------------------------------------------------------------
# Normalization-keyed exact dedup (case/punctuation-invariant)
# ---------------------------------------------------------------------------


@query(
    "normalized_exact_dedup",
    oracle="""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 30000 AS doc_id, upper(text) || ' !!' AS text
        FROM documents WHERE doc_id % 9 = 0
    ),
    normed AS (
        SELECT doc_id,
               md5(trim(regexp_replace(regexp_replace(lower(text),
                        '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_key
        FROM corpus
    )
    SELECT norm_key,
           CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM normed GROUP BY norm_key
    """,
)
def normalized_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a NORMALIZED key: lowercase, strip non-alphanumerics,
    collapse whitespace, then hash — catching the case/punctuation
    variants plain byte-exact dedup misses (the first normalization pass
    of CCNet/RefinedWeb-style pipelines). Variants are synthesized
    deterministically (every 9th doc gets an uppercased copy with
    punctuation noise at doc_id+30000) so groups of ≥2 exist; both
    engines run the identical normalize → md5 → groupBy.

    Scale: map-only normalization; the shuffle carries (16-byte hash,
    id) — never text — and the groupBy partial-aggregates map-side,
    exactly the L1 exact-dedup shape."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    variants = d.filter(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 30000).alias("doc_id"),
        F.concat(F.upper("text"), F.lit(" !!")).alias("text"),
    )
    corpus = d.unionByName(variants)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    return (
        corpus.select("doc_id", F.md5(norm.cast("binary")).alias("norm_key"))
        .groupBy("norm_key")
        .agg(
            F.min("doc_id").cast("long").alias("canonical_id"),
            F.count("*").cast("long").alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# BPE merge statistics (tokenizer-training pair counts)
# ---------------------------------------------------------------------------

BPE_PAIR_TOP_K = 30


@query(
    "bpe_merge_pair_counts",
    oracle=f"""
    WITH tok AS (
        SELECT regexp_extract_all(lower(text), '{{bpe_re}}') AS tk
        FROM documents
    ),
    idx AS (
        SELECT tk, unnest(range(1, len(tk))) AS i
        FROM tok WHERE len(tk) >= 2
    )
    SELECT tk[i] AS a, tk[i+1] AS b, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM idx
    GROUP BY tk[i], tk[i+1]
    ORDER BY n_pairs DESC, a, b
    LIMIT {BPE_PAIR_TOP_K}
    """.replace("{bpe_re}", BPE_RE),
)
def bpe_merge_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The statistic that drives one BPE tokenizer-training merge step:
    corpus-wide counts of ADJACENT token pairs, top-{BPE_PAIR_TOP_K} —
    the arg-max pair is the next merge rule (Sennrich '16; GPT/Llama
    tokenizers train on exactly this loop).

    Plan: map-only pair generation (codegen'd transform/sequence over
    the token array — the same zero-join adjacency device as
    document_chunks), explode, then ONE partial-agg groupBy on the pair
    and a TakeOrderedAndProject. The shuffle carries (pair, partial
    count) — vocabulary-sized, not corpus-sized — so a full BPE
    training loop is this query iterated with a merge applied between
    rounds; each round is one linear pass."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(bpe_tokens("text").alias("tk")).filter(F.size("tk") >= 2)
    pairs = t.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(tk) - 2),"
                " i -> struct(tk[i] AS a, tk[i+1] AS b))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    return (
        pairs.groupBy("a", "b")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), "a", "b")
        .limit(BPE_PAIR_TOP_K)
    )


def train_bpe_merges(
    docs: DataFrame, n_merges: int, min_pair_count: int = 2
) -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merge rules on ``docs.text`` — the actual
    tokenizer-training loop, each round one distributed pass:

    1. count adjacent token pairs (the `bpe_merge_pair_counts` shape);
    2. the arg-max pair (count, then lexicographic — deterministic)
       becomes the next merge rule;
    3. apply the rule corpus-wide: a single left-to-right greedy fold
       per document (``F.aggregate`` — JVM-side, no Python), replacing
       each adjacent (a, b) with the concatenation.

    Only the ≤``n_merges`` winning rules ever reach the driver (one
    2-string row per round); token arrays stay distributed. The fold
    rebuilds the accumulator array per element — O(len²) copying per
    document per round — acceptable because BPE training conventionally
    runs on a bounded SAMPLE of the corpus (pass one in here), not the
    full 100 TB; the pair-count pass, which IS corpus-sized, stays
    linear. Stops early when no pair reaches ``min_pair_count``.

    Returns the merge rules in training order (the tokenizer's merge
    table, highest priority first).
    """
    t = docs.select(bpe_tokens("text").alias("tk")).persist()
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            best = (
                t.filter(F.size("tk") >= 2)
                .select(
                    F.explode(
                        F.expr(
                            "transform(sequence(0, size(tk) - 2),"
                            " i -> struct(tk[i] AS a, tk[i+1] AS b))"
                        )
                    ).alias("p")
                )
                .groupBy("p.a", "p.b")
                .agg(F.count("*").alias("n"))
                .orderBy(F.desc("n"), "a", "b")
                .limit(1)
                .collect()
            )
            if not best or best[0]["n"] < min_pair_count:
                break
            a, b = best[0]["a"], best[0]["b"]
            merges.append((a, b))
            merged = t.select(
                F.aggregate(
                    "tk",
                    F.expr("CAST(array() AS array<string>)"),
                    lambda acc, x: F.when(
                        (F.size(acc) > 0)
                        & (F.element_at(acc, -1) == F.lit(a))
                        & (x == F.lit(b)),
                        F.concat(
                            F.slice(acc, 1, F.size(acc) - 1),
                            F.array(F.lit(a + b)),
                        ),
                    ).otherwise(F.concat(acc, F.array(x))),
                ).alias("tk")
            ).persist()
            merged.count()  # materialize before dropping the parent
            t.unpersist()
            t = merged
        return merges
    finally:
        t.unpersist()


def apply_bpe_merges(
    docs: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Encode ``docs.text`` with a trained merge table: the merge rules
    from :func:`train_bpe_merges` applied in priority order, each as
    the same JVM-side greedy left-to-right fold the trainer used — the
    TOKENIZE step of the pipeline (train once on a sample, encode the
    full corpus).

    Returns (original columns..., tokens array<string>, n_tokens). The
    encode pass is map-only — |merges| chained fold expressions inside
    one projection, zero shuffles; at 100 TB this is a scan."""
    def fold_rule(a: str, b: str):
        # a closure, not lambda default args: pyspark reads the
        # lambda's arity and HOF merge functions must take exactly 2
        def merge(acc, x):
            return F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
                ),
            ).otherwise(F.concat(acc, F.array(x)))

        return merge

    tk = bpe_tokens("text")
    for a, b in merges:
        tk = F.aggregate(
            tk, F.expr("CAST(array() AS array<string>)"), fold_rule(a, b)
        )
    return docs.withColumn("tokens", tk).withColumn(
        "n_tokens", F.size("tokens").cast("long")
    )


# ---------------------------------------------------------------------------
# Character-LM surprise (the perplexity-style quality filter, integer-exact)
# ---------------------------------------------------------------------------


@query(
    "char_lm_surprise",
    oracle="""
    WITH t AS (SELECT doc_id, lower(text) AS txt FROM documents),
    bg AS (
        SELECT doc_id, substr(txt, CAST(i AS INT), 2) AS b
        FROM (
            SELECT doc_id, txt, unnest(range(1, length(txt))) AS i
            FROM t WHERE length(txt) >= 2
        )
    ),
    model AS (SELECT b, COUNT(*) AS c FROM bg GROUP BY b),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM model),
    surp AS (
        SELECT b,
               length(bin(n)) - length(bin(CAST(c AS BIGINT))) AS s
        FROM model, tot
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST((1000 * SUM(s)) // COUNT(*) AS BIGINT) AS surprise_permille
    FROM bg JOIN surp USING (b)
    GROUP BY doc_id
    """,
)
def char_lm_surprise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-LM quality scoring (the CCNet/Gopher perplexity
    filter, reduced to its engine-expressible core): train a character-
    bigram model on the corpus, score each document by its mean Shannon
    code length under that model — gibberish and boilerplate-free
    natural text separate cleanly on this axis, and the real pipeline
    thresholds on exactly such a score.

    Cross-engine exactness is the trick: code length uses INTEGER
    bit-length arithmetic, ``bitlen(total) - bitlen(count)`` =
    floor-log2 surprise per bigram (``length(bin(n))`` in both
    engines) — no float log anywhere, so the score is bit-identical
    and integer-permille. Plan: one explode+groupBy trains the model
    (vocabulary-sized: ≤ charset², broadcast back), one partial-agg
    groupBy scores documents; two shuffles total, both
    vocabulary/doc-count sized — at 100 TB the model trains on a
    sample and the scoring pass is a scan."""
    # repartition before the per-row bigram explode: the test parquet is
    # one small file → one input partition, and the explode is the
    # expensive interpreted expression — without this the whole pass
    # runs on a single core (the _shingle_sets lesson, dedup.py)
    d = (
        load_table(spark, sf_dir, "documents")
        .repartition(F.col("doc_id"))
        .select("doc_id", F.lower("text").alias("txt"))
    )
    # explode positions THEN slice with a top-level substring: the
    # position generator and the slice both stay in whole-stage codegen
    # (a transform(..., i -> substring(...)) HOF evaluates interpreted
    # per element — measured ~3x slower on this pass)
    bg = (
        d.filter(F.length("txt") >= 2)
        .select(
            "doc_id",
            "txt",
            F.explode(F.expr("sequence(1, length(txt) - 1)")).alias("i"),
        )
        .select("doc_id", F.expr("substring(txt, i, 2)").alias("b"))
        # both the model branch and the scoring branch consume bg —
        # persist so the explode runs once (the jaccard_pairs pattern)
        .persist()
    )
    model = bg.groupBy("b").agg(F.count("*").alias("c"))
    tot = model.agg(F.sum("c").cast("long").alias("n"))
    surp = model.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.length(F.expr("bin(n)")) - F.length(F.expr("bin(c)"))
        ).alias("s"),
    )
    return (
        bg.join(F.broadcast(surp), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.expr("(1000 * sum(s)) DIV count(*)")
            .cast("long")
            .alias("surprise_permille"),
        )
    )


# ---------------------------------------------------------------------------
# Vocabulary building (dense token ids)
# ---------------------------------------------------------------------------


@query(
    "vocab_dense_ids",
    oracle=f"""
    WITH tf AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest({TOK_SQL.format(c='text')}) AS token
              FROM documents)
        GROUP BY token
    )
    SELECT token, n,
           CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token) - 1 AS BIGINT)
               AS token_id
    FROM tf
    """,
)
def vocab_dense_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary construction: every distinct token assigned a dense
    contiguous id, most-frequent-first — the id space an embedding
    table indexes by, and the frequency order that puts hot tokens in
    the low ids (cache/compression-friendly; every tokenizer ships
    exactly this table).

    Plan: one explode + partial-agg groupBy collapses the corpus to
    the VOCABULARY (the shuffle carries per-partition token partials,
    never positions), then the rank window runs over vocabulary-sized
    data — bounded by V, not corpus size, the same deliberately-small
    ordered tail as key_skew_profile. For open-web vocabularies too
    big for one partition, the two-phase bucketed-prefix rank of
    global_shuffle_rank applies verbatim (hash-prefix buckets →
    broadcast exclusive prefixes)."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.desc("n"), "token")
    return tf.select(
        "token",
        "n",
        (F.row_number().over(w) - 1).cast("long").alias("token_id"),
    )
