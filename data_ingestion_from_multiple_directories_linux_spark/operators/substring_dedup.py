"""Suffix-window exact-substring dedup (Lee et al. '22 shape).

`span_dedup_reassemble` (operators/corpus.py, L44) dedups FIXED
non-overlapping 16-token spans — cheap, but a repeated passage that
straddles a span boundary is invisible to it. The deduplicate-
text-datasets family (Lee et al., "Deduplicating Training Data Makes
Language Models Better", ACL '22) instead finds EVERY repeated
substring of length ≥ k via a suffix array. The distributed
equivalent implemented here is the standard windowed reduction: slide
a k-char window over every document (stride 1), mark windows whose
content occurs ≥ 2 times corpus-wide, and merge overlapping/adjacent
duplicated window positions per document into maximal duplicated
SPANS — a substring of length ≥ k occurs twice iff all of its k-char
windows do, so the merged islands are exactly the ≥ k-char repeated
regions a suffix array would report (over the window grid).

Plan shape and the 100 TB story:

* window generation is map-only (codegen'd ``transform(sequence(...))``
  + explode — the document_chunks device); the frequency pass is one
  groupBy on the window content with map-side partials;
* the dup-window set joins back to the positions frame on the window
  key — a sort-merge join on a short fixed-width key. At 100 TB the
  key should be the 64-bit ROLLING HASH of the window (the machinery
  of `rolling_hash_fingerprint`, ops/text_analysis.py — incremental
  per position, shuffles 8-byte digests instead of k-char strings);
  here the key is the window text itself so the DuckDB oracle is
  exact rather than collision-probabilistic — the swap changes the
  shuffle payload, not the algorithm;
* pathological windows (whitespace boilerplate repeated millions of
  times) are the skew risk: the frequency pass bounds them — the join
  probe side carries each DISTINCT duplicated window once, and the
  ``occ_cap`` guard (drop windows with count > cap from the REPORT,
  they are dedup'd unconditionally anyway) caps any residual hot key
  exactly like the Jaccard df_cap (ops/dedup.py) — contract-tested.
* island merging is a per-document window function — partitioned by
  doc_id, no global sort.

The registered query plants an ~80-char boilerplate sentence on every
third document (synthesized identically in both engines, the
canonical_url_dedup convention) so the corpus is GUARANTEED to carry
cross-document repeats of arbitrary alignment; natural repeats in the
synthetic text count too, identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

#: window width in characters — the "k" of the ≥ k-char repeated
#: substring guarantee.
WIN = 40

#: minimum corpus-wide occurrences for a window to count as repeated
#: (2 = Lee et al.'s "occurs more than once", within-doc repeats
#: included).
MIN_OCC = 2

#: planted boilerplate (> WIN chars so its windows are guaranteed
#: duplicated across every third document).
BOILER = (
    " Subscribe to our newsletter for the latest updates"
    " and exclusive offers every week."
)


def repeated_window_spans(
    docs: DataFrame,
    win: int = WIN,
    min_occ: int = MIN_OCC,
    occ_cap: int | None = None,
) -> DataFrame:
    """Per-document maximal repeated-span report over ``docs(doc_id,
    text)``: ``n_dup_windows`` (stride-1 ``win``-char windows whose
    content occurs ≥ ``min_occ`` times corpus-wide), ``n_spans``
    (overlapping/adjacent dup positions merged into islands) and
    ``dup_chars`` (characters covered by the merged spans). Documents
    with no duplicated window are absent from the result.

    ``occ_cap`` is the hot-window skew guard (the Jaccard df_cap
    convention): a window occurring > ``occ_cap`` times is
    mass-duplicated boilerplate whose positions-frame join fan-out is
    occ-sized PER OCCURRENCE — with the cap set such windows are
    dropped from the REPORT before the join (their content belongs to
    the exact-dedup path, not span accounting). Default ``None`` keeps
    exact parity with the oracle."""
    # hash-repartition first: the test parquet is ONE input partition
    # and the window transform is the expensive interpreted expression
    # (the dedup._shingle_sets lesson — without this the whole explode
    # runs on a single core); at 100 TB the scan already has thousands
    # of partitions and this is a cheap narrow re-balance.
    wins = (
        docs.filter(F.length("text") >= win)
        .repartition(F.col("doc_id"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(text) - {win} + 1),"
                    f" i -> struct(i AS pos,"
                    f" substring(text, i, {win}) AS w))"
                )
            ).alias("pw"),
        )
        .select("doc_id", "pw.pos", "pw.w")
    )
    # two-phase frequency pass: an 8-byte xxhash64 prefilter does the
    # corpus-sized shuffle (hash count >= string count, so no true dup
    # can be lost), then the EXACT string groupBy + join run only over
    # the surviving candidates (~15% here) — the shuffle payload drop
    # the module docstring promises, without giving up oracle-exact
    # results (a hash collision can only ADD a candidate, which the
    # string verify then rejects).
    #
    # wins feeds both phase-1 sides, and the stride-1 window transform
    # is the expensive interpreted expression — persist so it runs
    # ONCE, not once per plan branch (the minhash_pairs device;
    # LRU-evicted, ~100 MB at sf0.1 — at 100 TB this is the
    # materialized window table between stages, or a recompute if
    # storage is tighter than CPU). Measured 8.4 -> 4.3 s at sf0.1.
    wins_h = wins.withColumn("h", F.xxhash64("w")).persist()
    hot_h = (
        wins_h.groupBy("h")
        .agg(F.count("*").alias("occ"))
        .filter(F.col("occ") >= min_occ)
        .select("h")
    )
    cand = wins_h.join(hot_h, "h").select("doc_id", "pos", "w")
    occ_ok = F.col("occ") >= min_occ
    if occ_cap is not None:
        occ_ok = occ_ok & (F.col("occ") <= occ_cap)
    dup_w = (
        cand.groupBy("w")
        .agg(F.count("*").alias("occ"))
        .filter(occ_ok)
        .select("w")
    )
    dup_pos = cand.join(dup_w, "w").select("doc_id", "pos")
    by_doc = Window.partitionBy("doc_id").orderBy("pos")
    islands = dup_pos.withColumn(
        "new_island",
        F.when(
            F.col("pos") - F.lag("pos").over(by_doc) > win, F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "island",
        F.sum("new_island").over(
            by_doc.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    per_island = islands.groupBy("doc_id", "island").agg(
        F.count("*").alias("n_win"),
        (F.max("pos") - F.min("pos") + win).alias("chars"),
    )
    return per_island.groupBy("doc_id").agg(
        F.sum("n_win").cast("long").alias("n_dup_windows"),
        F.count("*").cast("long").alias("n_spans"),
        F.sum("chars").cast("long").alias("dup_chars"),
    )


#: boilerplate-planted corpus, both engines (every third doc).
_PLANTED_SQL = f"""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN text || '{BOILER}'
                ELSE text END AS text
    FROM documents
    WHERE text IS NOT NULL
"""


def _planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    return d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(BOILER))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


@query(
    "repeated_substring_spans",
    oracle=f"""
    WITH docs AS ({_PLANTED_SQL}),
    wins AS (
        SELECT doc_id, unnest(range(1, length(text) - {WIN} + 2)) AS pos,
               text
        FROM docs WHERE length(text) >= {WIN}
    ),
    pw AS (SELECT doc_id, pos, substr(text, pos, {WIN}) AS w FROM wins),
    dup_w AS (
        SELECT w FROM pw GROUP BY w HAVING COUNT(*) >= {MIN_OCC}
    ),
    dup_pos AS (
        SELECT pw.doc_id, pw.pos FROM pw JOIN dup_w USING (w)
    ),
    isl AS (
        SELECT doc_id, pos,
               SUM(CASE WHEN pos - prev_pos > {WIN} THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS island
        FROM (SELECT doc_id, pos,
                     lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                         AS prev_pos
              FROM dup_pos)
    ),
    per_island AS (
        SELECT doc_id, island, COUNT(*) AS n_win,
               MAX(pos) - MIN(pos) + {WIN} AS chars
        FROM isl GROUP BY doc_id, island
    )
    SELECT doc_id,
           CAST(SUM(n_win) AS BIGINT) AS n_dup_windows,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(chars) AS BIGINT) AS dup_chars
    FROM per_island
    GROUP BY doc_id
    """,
)
def repeated_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document report of maximal ≥ WIN-char repeated regions over
    the boilerplate-planted corpus: duplicated-window count, merged
    span count, and characters covered — the exact statistic the
    Lee et al. suffix-window dedup removes. Every third document
    carries the planted boilerplate, so its spans (and any natural
    repeats in the synthetic text) surface identically in both
    engines."""
    return repeated_window_spans(_planted(spark, sf_dir))
