"""Training-corpus governance operators (LLM-pipeline family).

The steps between "cleaned documents" and "training mixture" that a
large-scale pipeline runs on every refresh:

* **Dataset splitting** — deterministic hash-based train/val/test
  assignment (no RNG state, reproducible across engines and re-runs);
* **Benchmark decontamination** — drop training documents sharing long
  n-gram shingles with an evaluation set (inverted-index semi-join —
  the same bucketed shape as near-dup detection, so no all-pairs);
* **Repetition ratio** — Gopher-style intra-document repetition signal
  (most-frequent n-gram share of all n-gram occurrences);
* **PII text redaction** — regex scrubbing of emails/phones inside the
  text column (map-only), the text-side sibling of the reference's
  column-level PII masking (file_loader.py:523-536);
* **Per-source capped sampling** — bound any single source's document
  count in the mixture (window rank by content hash, deterministic).

All are registered queries with DuckDB oracles; determinism comes from
md5 hashes (identical string arithmetic in both engines) — the same
trick the IVF seeding and exact-dedup operators use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import tokens
from .registry import query
from .text_analysis import TOK_SQL

# ---------------------------------------------------------------------------
# Deterministic train/val/test split
# ---------------------------------------------------------------------------

#: hex-prefix split boundaries: 0-b → train (12/16), c-d → val (2/16),
#: e-f → test (2/16)
SPLIT_TRAIN_BELOW = "c"
SPLIT_VAL_BELOW = "e"


@query(
    "dataset_split_assign",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '{SPLIT_TRAIN_BELOW}'
                THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '{SPLIT_VAL_BELOW}'
                THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def dataset_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 75/12.5/12.5 train/val/test assignment by md5 hex
    prefix of the document id: reproducible across runs, engines and
    cluster sizes (no RNG, no shuffle — a pure projection), and stable
    under corpus growth (a document's split never changes when others
    are added — the property random splits lack)."""
    h = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1)
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(h < SPLIT_TRAIN_BELOW, "train")
        .when(h < SPLIT_VAL_BELOW, "val")
        .otherwise("test")
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap vs an eval set)
# ---------------------------------------------------------------------------

#: every 31st document plays the benchmark/eval set
DECON_EVAL_MOD = 31
DECON_NGRAM = 8

#: DuckDB whitespace tokenizer — the SHARED definition (text_analysis.
#: TOK_SQL), not a local copy, so corpus-governance oracles can never
#: drift from the dedup/text-analysis family's tokenization
_TOK = TOK_SQL.format(c="text")
_SH8 = " || ' ' || ".join(f"toks[i+{k + 1}]" for k in range(DECON_NGRAM))


@query(
    "benchmark_decontamination",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, {_TOK} AS toks FROM documents
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(len(toks) - {DECON_NGRAM - 1}),
                                            i -> {_SH8})) AS sh
        FROM tok WHERE len(toks) >= {DECON_NGRAM}
    ),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    eval_sh AS (
        SELECT DISTINCT s FROM ex WHERE doc_id % {DECON_EVAL_MOD} = 0
    ),
    hits AS (
        SELECT ex.doc_id, COUNT(*) AS n_shared
        FROM ex JOIN eval_sh USING (s)
        WHERE ex.doc_id % {DECON_EVAL_MOD} <> 0
        GROUP BY ex.doc_id
    )
    SELECT doc_id, CAST(n_shared AS BIGINT) AS n_shared FROM hits
    """,
)
def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs contaminated by the eval set: documents (outside
    the eval slice) sharing at least one 8-gram shingle with any eval
    document, with the shared-shingle count.

    Shape: distinct eval shingles form the (small) build side of an
    equi-join on the shingle — an inverted-index SEMI join plus count,
    never doc×doc pairs. At 100 TB the eval side is benchmarks (MBs):
    it broadcasts, and decontamination is a map-side hash probe per
    shingle — the standard industrial design (e.g. GPT-3's 13-gram
    overlap filter)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens("text")
    tokd = d.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") >= DECON_NGRAM
    )
    # the ONE shared shingle definition (functions.text.shingles — the
    # same expression the dedup family uses), not a private re-derivation
    # that could drift from it (review finding); explode_outer for the
    # InferFiltersFromGenerate reason dedup._explode_shingles documents
    from ..functions.text import shingles

    sh = tokd.select("doc_id", shingles("toks", DECON_NGRAM).alias("sh"))
    ex = sh.select("doc_id", F.explode_outer("sh").alias("s")).filter(
        F.col("s").isNotNull()
    )
    eval_sh = (
        ex.filter(F.col("doc_id") % DECON_EVAL_MOD == 0).select("s").distinct()
    )
    return (
        ex.filter(F.col("doc_id") % DECON_EVAL_MOD != 0)
        .join(F.broadcast(eval_sh), "s")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )


# ---------------------------------------------------------------------------
# Repetition ratio (Gopher-style quality rule)
# ---------------------------------------------------------------------------

REP_NGRAM = 4


@query(
    "repetition_ratio",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, {_TOK} AS toks FROM documents
    ),
    sh AS (
        SELECT doc_id,
               list_transform(range(len(toks) - {REP_NGRAM - 1}),
                              i -> {" || ' ' || ".join(f"toks[i+{k + 1}]" for k in range(REP_NGRAM))})
                   AS sh
        FROM tok WHERE len(toks) >= {REP_NGRAM}
    ),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    per AS (
        SELECT doc_id, s, COUNT(*) AS c FROM ex GROUP BY doc_id, s
    )
    SELECT doc_id,
           CAST(MAX(c) AS BIGINT) AS top_ngram_count,
           CAST(SUM(c) AS BIGINT) AS n_ngrams,
           CAST(MAX(c) AS DOUBLE) / SUM(c) AS repetition_ratio
    FROM per GROUP BY doc_id
    """,
)
def repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition: the most frequent 4-gram's share of
    all 4-gram occurrences (Gopher repetition rules family). High values
    flag boilerplate/spam for removal before training.

    Two-level aggregation — (doc, ngram) counts then per-doc max/sum —
    both stages partial-aggregating, keys never leave their doc's hash
    partition on the second stage (it groups a subset of the first
    stage's key), so the heavy explode output is reduced map-side."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens("text")
    tokd = d.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") >= REP_NGRAM
    )
    sh = tokd.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - REP_NGRAM),
            lambda i: F.concat_ws(
                " ", *[F.col("toks")[i + k] for k in range(REP_NGRAM)]
            ),
        ).alias("sh"),
    )
    ex = sh.select("doc_id", F.explode_outer("sh").alias("s")).filter(
        F.col("s").isNotNull()
    )
    per = ex.groupBy("doc_id", "s").agg(F.count("*").alias("c"))
    return per.groupBy("doc_id").agg(
        F.max("c").cast("long").alias("top_ngram_count"),
        F.sum("c").cast("long").alias("n_ngrams"),
        (F.max("c").cast("double") / F.sum("c")).alias("repetition_ratio"),
    )


# ---------------------------------------------------------------------------
# PII text redaction (map-only scrub)
# ---------------------------------------------------------------------------

#: synthesized PII tail appended per doc (both engines build the same)
PII_CORPUS_SQL = """
    SELECT doc_id,
           text || ' contact u' || CAST(doc_id AS VARCHAR)
                || '@example.com or +1-555-' || CAST(doc_id AS VARCHAR) AS text
    FROM documents
"""
#: subset regex syntax identical in Java (Spark) and RE2 (DuckDB)
EMAIL_RE = "[a-z0-9._]+@[a-z0-9]+[.][a-z]+"
PHONE_RE = "[+]1-555-[0-9]+"


@query(
    "pii_redact_text",
    oracle=f"""
    WITH corpus AS ({PII_CORPUS_SQL}),
    red AS (
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(text, '{EMAIL_RE}', '[EMAIL]', 'g'),
                   '{PHONE_RE}', '[PHONE]', 'g') AS redacted
        FROM corpus
    )
    SELECT doc_id, redacted,
           CAST(len(regexp_extract_all(redacted, '\\[EMAIL\\]|\\[PHONE\\]'))
                AS BIGINT) AS n_redactions
    FROM red
    """,
)
def pii_redact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email/phone redaction inside the text column — the text-side
    sibling of the reference's column-level PII masking (P4/C10/C11;
    file_loader.py:523-536 masks whole columns, a training pipeline must
    also scrub free text). Pure projection: two codegen'd regexp_replace
    passes and a count, zero shuffle at any scale; the synthesized PII
    tail makes the redaction observable and oracle-checkable."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    red = d.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", EMAIL_RE, "[EMAIL]"),
            PHONE_RE,
            "[PHONE]",
        ).alias("redacted"),
    )
    return red.select(
        "doc_id",
        "redacted",
        F.size(
            F.expr(r"regexp_extract_all(redacted, '\\[EMAIL\\]|\\[PHONE\\]', 0)")
        ).cast("long").alias("n_redactions"),
    )


# ---------------------------------------------------------------------------
# Per-source capped sampling
# ---------------------------------------------------------------------------

SOURCE_CAP = 10


@query(
    "source_capped_sample",
    oracle=f"""
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                   AS rn
        FROM documents)
    WHERE rn <= {SOURCE_CAP}
    """,
)
def source_capped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture balancing: keep at most SOURCE_CAP documents per source,
    chosen by md5 rank (a deterministic uniform sample — same documents
    every run, regardless of partitioning). One window partitioned by
    source; at 100 TB sources are coarse (hundreds), so the rank runs
    per-source-partition with no global sort — and a two-phase
    rank-then-filter over pre-aggregated per-source counts is the
    fallback if a single source dwarfs executor memory."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id"
        )
    )
    return d.withColumn("rn", rn).filter(F.col("rn") <= SOURCE_CAP).select(
        "doc_id", "source"
    )


# ---------------------------------------------------------------------------
# Context-window chunking + sequence packing
# ---------------------------------------------------------------------------

CHUNK_W = 32  #: tokens per chunk
CHUNK_S = 24  #: stride (CHUNK_W - CHUNK_S = 8 tokens of overlap)
PACK_BUDGET = 512  #: tokens per packed training sequence
PACK_NBUCKETS = 256  #: range buckets for the two-phase prefix sum


@query(
    "document_chunks",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, {_TOK} AS toks FROM documents
    ),
    t AS (SELECT doc_id, toks, len(toks) AS n FROM tok WHERE len(toks) >= 1),
    ch AS (
        SELECT doc_id, n, chunk_idx, chunk_idx * {CHUNK_S} AS st FROM (
            SELECT doc_id, n,
                   unnest(range((n - 1) // {CHUNK_S} + 1)) AS chunk_idx
            FROM t)
    )
    SELECT ch.doc_id,
           CAST(ch.chunk_idx AS BIGINT) AS chunk_idx,
           CAST(LEAST({CHUNK_W}, ch.n - ch.st) AS BIGINT) AS n_chunk_tokens,
           array_to_string(list_slice(t.toks, ch.st + 1, ch.st + {CHUNK_W}), ' ')
               AS chunk_text
    FROM ch JOIN t ON ch.doc_id = t.doc_id
    """,
)
def document_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding context-window chunking: every document becomes
    overlapping CHUNK_W-token chunks at stride CHUNK_S (8-token overlap
    preserves cross-boundary context) with positional lineage — the step
    that turns cleaned documents into model-ingestible windows.

    Plan: tokenization + chunk-index explode + slice are all narrow
    (scan-parallel, no shuffle); output rows ≈ n_tokens/stride per doc.
    At 100 TB chunking is embarrassingly parallel and the only knob is
    output file sizing."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens("text")
    t = d.select("doc_id", toks.alias("toks")).withColumn(
        "n", F.size("toks")
    ).filter(F.col("n") >= 1)
    ch = t.select(
        "doc_id",
        "n",
        "toks",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.floor((F.col("n") - 1) / CHUNK_S).cast("long"),
                ),
                lambda i: i * CHUNK_S,
            )
        ).alias("chunk_idx", "st"),
    )
    return ch.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.least(F.lit(CHUNK_W), F.col("n") - F.col("st")).cast("long").alias(
            "n_chunk_tokens"
        ),
        F.concat_ws(" ", F.slice("toks", F.col("st") + 1, CHUNK_W)).alias(
            "chunk_text"
        ),
    )


@query(
    "sequence_packing",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, len({_TOK}) AS n_tokens FROM documents
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS start_offset,
           CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                // {PACK_BUDGET} AS BIGINT) AS seq_id
    FROM tok
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-split sequence packing: documents are laid out on a
    global token tape (cumulative offset in doc_id order) and assigned
    to the PACK_BUDGET-token training sequence their start offset lands
    in — the standard packing that wastes no pad tokens.

    The global cumulative sum runs as a TWO-PHASE PREFIX SUM, never a
    single-partition window:

    1. deterministic range-bucket doc_id into PACK_NBUCKETS buckets
       (boundaries from exact min/max — no sampling, so every pass
       agrees on the assignment);
    2. per-bucket token subtotals (one groupBy → ≤ PACK_NBUCKETS rows,
       a bounded metadata collect) → exclusive bucket prefixes,
       broadcast back as a tiny join side;
    3. within-bucket exclusive cumsum via a window PARTITIONED by
       bucket (hash-shuffled across the cluster, ~1/PACK_NBUCKETS of
       the data per window partition); start_offset = bucket prefix +
       within-bucket cumsum.

    Identical output to the naive global-order window (the oracle is
    unchanged), but the heaviest per-task slice is a bucket, not the
    whole table — the plan contains no ``Exchange SinglePartition``
    (asserted in tests/test_plans.py)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens("text")
    # persist: the interpreted tokenize projection feeds THREE jobs
    # (bounds, bucket subtotals, the final join) — unpersisted it would
    # re-tokenize the corpus per job (review finding; the same
    # run-once discipline char_lm_surprise documents)
    t = d.select("doc_id", F.size(toks).alias("n_tokens")).persist()

    empty_shape = (
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.lit(0).cast("long").alias("start_offset"),
        F.lit(0).cast("long").alias("seq_id"),
    )
    bounds = t.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")).collect()[0]
    if bounds["lo"] is None:  # empty corpus: schema-stable empty result
        return t.select(*empty_shape)
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    width = (hi - lo) // PACK_NBUCKETS + 1  # ≥1; exact integer arithmetic
    bucket = F.expr(f"CAST((doc_id - {lo}) DIV {width} AS BIGINT)")
    t = t.withColumn("_b", bucket)

    # Phase 2: bucket subtotals — ≤ PACK_NBUCKETS rows of metadata.
    subs = t.groupBy("_b").agg(F.sum("n_tokens").alias("s")).collect()
    running = 0
    prefix_rows = []
    for row in sorted(subs, key=lambda r: r["_b"]):
        prefix_rows.append((int(row["_b"]), running))
        running += int(row["s"])
    pref = spark.createDataFrame(prefix_rows, "_b bigint, _pref bigint")

    # Phase 3: within-bucket exclusive cumsum, bucket-partitioned.
    w = (
        Window.partitionBy("_b")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.col("_pref") + F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return t.join(F.broadcast(pref), "_b").select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        off.cast("long").alias("start_offset"),
        F.floor(off / PACK_BUDGET).cast("long").alias("seq_id"),
    )


# ---------------------------------------------------------------------------
# Deterministic global shuffle rank (two-phase, no global sort)
# ---------------------------------------------------------------------------


@query(
    "global_shuffle_rank",
    oracle="""
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                   doc_id) - 1 AS BIGINT) AS shuffle_rank
    FROM documents
    """,
)
def global_shuffle_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle: every document gets a global 0-based
    position in md5(doc_id) order — reproducible across engines, runs
    and cluster sizes (no RNG state), the standard way a training
    pipeline fixes its epoch order without materializing a shuffled
    copy.

    A global ROW_NUMBER is the textbook single-partition trap; here it
    runs as the same TWO-PHASE shape as sequence_packing: the first hex
    byte of the hash is a 256-way ORDERED bucketing, so per-bucket
    counts (one tiny groupBy → broadcast exclusive prefixes) plus a
    within-bucket row_number (window PARTITIONED by bucket) compose the
    exact global rank — no ``Exchange SinglePartition`` anywhere
    (asserted in tests/test_plans.py)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    t = d.select("doc_id", h.alias("h"), F.substring(h, 1, 2).alias("_b"))

    counts = t.groupBy("_b").agg(F.count("*").alias("c")).collect()
    running = 0
    prefix_rows = []
    for row in sorted(counts, key=lambda r: r["_b"]):
        prefix_rows.append((row["_b"], running))
        running += int(row["c"])
    if not prefix_rows:  # empty corpus: schema-stable empty result
        return t.select("doc_id", F.lit(0).cast("long").alias("shuffle_rank"))
    pref = spark.createDataFrame(prefix_rows, "_b string, _pref bigint")

    rn = F.row_number().over(Window.partitionBy("_b").orderBy("h", "doc_id"))
    return (
        t.join(F.broadcast(pref), "_b")
        .select(
            "doc_id",
            (F.col("_pref") + rn - 1).cast("long").alias("shuffle_rank"),
        )
    )


# ---------------------------------------------------------------------------
# Span-level exact dedup with document reassembly (Dolma/RefinedWeb-style)
# ---------------------------------------------------------------------------

SPAN_W = 16  #: tokens per dedup span (non-overlapping)


@query(
    "span_dedup_reassemble",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, {_TOK} AS toks FROM documents
    ),
    t AS (SELECT doc_id, toks, len(toks) AS n FROM tok WHERE len(toks) >= 1),
    sp AS (
        SELECT doc_id, span_idx,
               array_to_string(list_slice(toks, span_idx * {SPAN_W} + 1,
                                          span_idx * {SPAN_W} + {SPAN_W}),
                               ' ') AS span_text
        FROM (SELECT doc_id, toks,
                     unnest(range((n - 1) // {SPAN_W} + 1)) AS span_idx
              FROM t)
    ),
    kept AS (
        SELECT doc_id, span_idx, span_text FROM (
            SELECT doc_id, span_idx, span_text,
                   ROW_NUMBER() OVER (PARTITION BY span_text
                                      ORDER BY doc_id, span_idx) AS rn
            FROM sp)
        WHERE rn = 1
    ),
    reasm AS (
        SELECT doc_id,
               array_to_string(list(span_text ORDER BY span_idx), ' ')
                   AS clean_text,
               COUNT(*) AS n_kept
        FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           COALESCE(r.clean_text, '') AS clean_text,
           CAST((t.n - 1) // {SPAN_W} + 1 AS BIGINT) AS n_spans,
           CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_spans_kept
    FROM t LEFT JOIN reasm r ON t.doc_id = r.doc_id
    """,
)
def span_dedup_reassemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact dedup with reassembly — the Dolma/RefinedWeb
    paragraph-dedup shape for corpora without structural delimiters:
    documents split into non-overlapping SPAN_W-token spans, every
    later copy of a span already seen anywhere in the corpus dropped
    (first occurrence by (doc_id, span_idx) wins), surviving spans
    reassembled in order into the cleaned document. Output keeps every
    document with its span bookkeeping, so the drop rate is auditable
    per doc.

    Scale shape: the only wide stages are one hash shuffle on the span
    text (the first-occurrence window — at 100 TB partition on a span
    digest instead of the raw text so the shuffle carries 16 bytes per
    span, the sha-groupBy trick exact_dedup_documents uses) and the
    per-document regroup for reassembly. Both are plain hash
    partitions; no global order anywhere."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens("text")
    t = (
        d.select("doc_id", toks.alias("toks"))
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") >= 1)
    )
    spans = t.select(
        "doc_id",
        "toks",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.floor((F.col("n") - 1) / SPAN_W).cast("long"),
                ),
                lambda i: i * SPAN_W,
            )
        ).alias("span_idx", "st"),
    ).select(
        "doc_id",
        "span_idx",
        F.concat_ws(" ", F.slice("toks", F.col("st") + 1, SPAN_W)).alias(
            "span_text"
        ),
    )
    first = F.row_number().over(
        Window.partitionBy("span_text").orderBy("doc_id", "span_idx")
    )
    kept = spans.withColumn("rn", first).filter(F.col("rn") == 1)
    reasm = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("span_idx", "span_text"))),
                lambda s: s["span_text"],
            ),
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    return (
        t.select(
            "doc_id",
            (F.floor((F.col("n") - 1) / SPAN_W) + 1).cast("long").alias("n_spans"),
        )
        .join(reasm, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            "n_spans",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias(
                "n_spans_kept"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Mixture scheduling + length-bucketed batching
# ---------------------------------------------------------------------------

BATCH_SIZE = 8  #: docs per length-bucketed batch
LEN_BUCKET = 16  #: tokens per length bucket


@query(
    "mixture_schedule",
    oracle="""
    SELECT doc_id, source,
           CAST(rk AS BIGINT) AS rank_in_source,
           CAST(w AS BIGINT) AS weight,
           CAST(rk AS DOUBLE) / w AS virtual_time
    FROM (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                           doc_id) AS rk,
               1 + length(source) % 3 AS w
        FROM documents)
    """,
)
def mixture_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stride-scheduled source mixing: each source gets a weight, each
    document a deterministic within-source rank (md5 order), and
    virtual_time = rank/weight — consuming documents in virtual_time
    order yields the weighted interleave (a source with weight 2 appears
    twice as often), the standard way training mixtures are scheduled
    without materializing a shuffled copy.

    Scale shape: ONE window partitioned by source (hash-partitioned, no
    global sort — the consumer sorts by virtual_time only within the
    batches it draws). Weights here derive arithmetically from the
    source name so the oracle reproduces them; production supplies a
    weights table and broadcast-joins it."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id"
        )
    )
    w = 1 + F.length("source") % 3
    return d.select(
        "doc_id",
        "source",
        rk.cast("long").alias("rank_in_source"),
        w.cast("long").alias("weight"),
        (rk.cast("double") / w).alias("virtual_time"),
    )


@query(
    "length_bucketed_batches",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, len({_TOK}) AS n_tokens FROM documents
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_tokens // {LEN_BUCKET} AS BIGINT) AS bucket,
           CAST((ROW_NUMBER() OVER (PARTITION BY n_tokens // {LEN_BUCKET}
                                    ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                             doc_id) - 1)
                // {BATCH_SIZE} AS BIGINT) AS batch_idx
    FROM tok
    """,
)
def length_bucketed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching: documents are grouped into
    LEN_BUCKET-token length buckets and assigned batch indices within
    their bucket (BATCH_SIZE docs per batch, md5-shuffled order) — the
    padding-minimization step before collation (batchmates have similar
    length, so pad waste is bounded by the bucket width).

    Integer bucket arithmetic (n // 16), not log2: float log2 can differ
    in the last ulp across engines and flip a floor at power-of-two
    boundaries. One window partitioned by bucket — hash-partitioned,
    no global sort, scale-safe."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens("text")
    t = d.select("doc_id", F.size(toks).alias("n_tokens"))
    bucket = F.floor(F.col("n_tokens") / LEN_BUCKET)
    rk = F.row_number().over(
        Window.partitionBy(bucket).orderBy(
            F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id"
        )
    )
    return t.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        bucket.cast("long").alias("bucket"),
        F.floor((rk - 1) / BATCH_SIZE).cast("long").alias("batch_idx"),
    )


# ---------------------------------------------------------------------------
# Weighted (probability-proportional-to-size) corpus sampling
# ---------------------------------------------------------------------------

WEIGHTED_K = 50  #: sample size


@query(
    "weighted_sample_docs",
    oracle=f"""
    SELECT doc_id, source,
           CAST(n_chars AS BIGINT) AS weight,
           CAST(CAST('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 15)
                     AS BIGINT) // n_chars AS BIGINT) AS priority
    FROM documents
    WHERE n_chars > 0
    ORDER BY priority, doc_id
    LIMIT {WEIGHTED_K}
    """,
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted document sample: the {WEIGHTED_K} docs with the
    smallest ``hash(id) DIV n_chars`` priority — sequential Poisson
    sampling (Ohlsson '98; a.k.a. priority sampling) with inclusion odds
    proportional to document length, which is the per-TOKEN-uniform
    sample a mixture builder actually wants (uniform per-doc sampling
    under-represents long documents' tokens).

    Determinism: the uniform variate is the 60-bit md5 prefix of the
    doc id (the fixed-hash device shared with dataset_split_assign);
    the classic u/w priority is taken in INTEGER division — u ≈ 1e18,
    w ≤ 1e5, so the quantization error is ~w/u ≈ 1e-13 relative while
    the key stays exact-comparable across engines (float division is
    ULP-ambiguous at order boundaries, integer DIV is not). Zero-weight
    docs are excluded (they can never be sampled).

    Plan: pure projection → TakeOrderedAndProject (per-partition heaps
    of k, driver merge of k·partitions rows) — one scan, zero shuffle
    of the table, the identical shape to top_k_orders. At 100 TB the
    weighted sample of a trillion-doc corpus costs one pass."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit("ws:"), F.col("doc_id").cast("string")).cast(
                    "binary"
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return (
        d.select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("weight"),
            u.alias("_u"),
        )
        .select(
            "doc_id",
            "source",
            "weight",
            F.expr("_u DIV weight").cast("long").alias("priority"),
        )
        .orderBy("priority", "doc_id")
        .limit(WEIGHTED_K)
    )


# ---------------------------------------------------------------------------
# UDTF chunking (the SQL-surface table-function escape hatch)
# ---------------------------------------------------------------------------

UDTF_CHUNK_W = 80  #: characters per chunk


@query(
    "udtf_char_chunks",
    oracle=f"""
    SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
           substr(text, CAST(i * {UDTF_CHUNK_W} + 1 AS INT), {UDTF_CHUNK_W})
               AS chunk
    FROM (
        SELECT doc_id, text,
               unnest(range((length(text) + {UDTF_CHUNK_W} - 1)
                            // {UDTF_CHUNK_W})) AS i
        FROM documents
    )
    """,
)
def udtf_char_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width character chunks via a registered Python UDTF under a
    correlated LATERAL join — the table-function escape hatch
    (functions/udfs.py CharChunkUDTF) exercised through its SQL surface,
    value-checked against a pure-SQL oracle.

    This is the API-parity twin of `document_chunks` (native
    sequence/explode — the hot-path shape): same fan-out semantics, but
    as the form a SQL user reaches for (`FROM docs, LATERAL
    char_chunks(text, w)`). Plan: the UDTF runs scan-parallel per input
    partition (BatchEvalPython over the generator) — no shuffle; the
    cost vs the native path is Python row transfer, which is the
    documented trade of this surface."""
    from ..functions.udfs import char_chunk_udtf

    spark.udtf.register("char_chunks", char_chunk_udtf())
    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_idx, c.chunk
        FROM __udtf_docs d, LATERAL char_chunks(d.text, {UDTF_CHUNK_W}) c
        """
    )
