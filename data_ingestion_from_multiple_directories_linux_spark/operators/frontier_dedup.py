"""Frontier dedup batch twin: canonicalize → Bloom probe → exact rescue.

The streaming crawl frontier (streaming/frontier.py, SURVEY §2.12a
L140) emits first-seen-only resources per micro-batch through exactly
three stages: canonicalize raw spellings and collapse the batch to one
row per canonical key, probe the persisted Bloom filter (negatives are
provably new), and exact-rescue the positives against the emitted
table (a Bloom hit is a true dup OR a false positive — skipping the
rescue would silently drop one-in-FP-rate genuinely-new pages
forever). The politeness half of that lifecycle got its oracle-checked
batch twin in round 11 (``frontier_dispatch_tick``); this module gives
the DEDUP half its own: one deterministic batch, built from the same
shared machinery the stream runs — :func:`urlnorm.url_canonicalize`,
:func:`bloomdedup.bloom_bits`, :func:`bloomdedup.probe_bloom` — so a
green driver row here verifies the streamed composition by proxy (the
``click_attribution_batch`` / ``frontier_dispatch_tick`` precedent).

Corpus: raw URLs synthesized from documents with BOTH hazards the
stream faces — four spelling families per page (mixed-case host,
utm-tracking query, default port + trailing slash, fragment + mid-query
utm: the urlnorm families, which canonicalization must collapse) over
an md5-folded page id (the bloomdedup device: no residue structure to
correlate with the seen/incoming split, so new/dup/false-positive are
all populated at every SF). History ("seen") is doc_id % 3 != 0 —
their canonical URLs stand in for the emitted-output table and the
persisted filter bits; the incoming batch is doc_id % 3 = 0.

Scale shape: identical to the stream's — the filter is ONE broadcast
array row, bloom-negatives never join anything, and only the
bloom-positive sliver pays the exact-rescue shuffle (bounded by the
positive count, not the batch volume).

Reference parity: none (the reference has no crawl surface); additive
§2.12a (L171).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .bloomdedup import K_HASH, URL_MOD, _sql_bit, bloom_bits, probe_bloom
from .registry import query
from .urlnorm import _sql_canonicalize, url_canonicalize

#: md5-folded page id shared with bloomdedup (both engines build it).
_PAGE_SQL = (
    "CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT)"
    f" % {URL_MOD} AS VARCHAR)"
)

#: raw-spelling synthesis, DuckDB side (Spark twin below): the four
#: urlnorm families over the md5-folded page. Families 0-2 collapse to
#: the bare resource; family 3 canonicalizes to the page's ``?x=1``
#: sibling resource (the global-utm-strip + fragment rules).
_RAW_SQL = f"""CASE doc_id % 4
    WHEN 0 THEN 'https://example.com/p/' || {_PAGE_SQL}
    WHEN 1 THEN 'https://EXAMPLE.com/p/' || {_PAGE_SQL}
                || '?utm_source=feed&utm_medium=rss'
    WHEN 2 THEN 'HTTPS://example.com:443/p/' || {_PAGE_SQL} || '/'
    ELSE 'https://Example.COM/p/' || {_PAGE_SQL}
         || '?x=1&utm_a=2&utm_b=3#section-2'
    END"""


def _raw_col() -> Column:
    page = (
        F.conv(
            F.substring(
                F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 7
            ),
            16,
            10,
        ).cast("long")
        % URL_MOD
    ).cast("string")
    return (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("https://example.com/p/"), page),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.lit("https://EXAMPLE.com/p/"),
                page,
                F.lit("?utm_source=feed&utm_medium=rss"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("HTTPS://example.com:443/p/"), page, F.lit("/")),
        )
        .otherwise(
            F.concat(
                F.lit("https://Example.COM/p/"),
                page,
                F.lit("?x=1&utm_a=2&utm_b=3#section-2"),
            )
        )
    )


@query(
    "frontier_dedup_batch",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_RAW_SQL} AS raw_url FROM documents
    ),
    seen AS (
        SELECT DISTINCT {_sql_canonicalize('raw_url')} AS url
        FROM d WHERE doc_id % 3 <> 0
    ),
    inc AS (
        SELECT {_sql_canonicalize('raw_url')} AS url,
               CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id,
               CAST(COUNT(DISTINCT raw_url) AS BIGINT) AS n_raw_spellings
        FROM d WHERE doc_id % 3 = 0
        GROUP BY 1
    ),
    bits AS (
        SELECT DISTINCT {_sql_bit('s.url', 'CAST(t.j AS VARCHAR)')} AS bit
        FROM seen s CROSS JOIN (SELECT unnest(range({K_HASH})) AS j) t
    ),
    probe AS (
        SELECT i.url, i.keeper_doc_id, i.n_raw_spellings,
               COUNT(b.bit) = {K_HASH} AS hit
        FROM inc i
        CROSS JOIN (SELECT unnest(range({K_HASH})) AS j) t
        LEFT JOIN bits b
          ON b.bit = {_sql_bit('i.url', 'CAST(t.j AS VARCHAR)')}
        GROUP BY i.url, i.keeper_doc_id, i.n_raw_spellings
    )
    SELECT p.url, p.keeper_doc_id, p.n_raw_spellings,
           CAST(CASE WHEN p.hit THEN 1 ELSE 0 END AS INT) AS bloom_hit,
           CASE WHEN NOT p.hit THEN 'new'
                WHEN s.url IS NOT NULL THEN 'dup'
                ELSE 'rescued_fp' END AS verdict,
           CAST(CASE WHEN p.hit AND s.url IS NOT NULL THEN 0 ELSE 1 END
                AS INT) AS emitted
    FROM probe p LEFT JOIN seen s ON p.url = s.url
    """,
)
def frontier_dedup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One crawl-frontier dedup batch, end to end: (url, keeper_doc_id,
    n_raw_spellings, bloom_hit, verdict, emitted) per canonical
    incoming resource.

    The three streamed stages, replayed on shared machinery:

    1. **canonicalize + in-batch collapse** — raw spellings →
       :func:`url_canonicalize`, one row per canonical key with the
       min-doc_id keeper (``n_raw_spellings`` counts the spellings the
       collapse merged — what raw-string dedup would have missed);
    2. **Bloom probe** — :func:`probe_bloom` against
       :func:`bloom_bits` over the seen set (one broadcast array row);
       negatives emit as ``new`` without touching corpus-sized state;
    3. **exact rescue** — positives alone join the seen table: a match
       is a true ``dup`` (suppressed, ``emitted = 0``), a miss is a
       Bloom ``rescued_fp`` that the rescue join saves from being
       silently dropped (``emitted = 1``).

    Plan shape: the emitted frame is negatives ∪ rescued — exactly what
    streaming/frontier.py:_process_batch writes per micro-batch."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", _raw_col().alias("raw_url")
    )
    seen = (
        d.filter(F.col("doc_id") % 3 != 0)
        .select(url_canonicalize("raw_url").alias("url"))
        .distinct()
    )
    inc = (
        d.filter(F.col("doc_id") % 3 == 0)
        .select(url_canonicalize("raw_url").alias("url"), "doc_id", "raw_url")
        .groupBy("url")
        .agg(
            F.min("doc_id").cast("long").alias("keeper_doc_id"),
            F.countDistinct("raw_url").cast("long").alias("n_raw_spellings"),
        )
    )
    probed = probe_bloom(inc, bloom_bits(seen))

    negatives = probed.filter(~F.col("hit")).select(
        "url",
        "keeper_doc_id",
        "n_raw_spellings",
        F.lit(0).alias("bloom_hit"),
        F.lit("new").alias("verdict"),
        F.lit(1).alias("emitted"),
    )
    positives = (
        probed.filter(F.col("hit"))
        .join(seen.withColumn("_seen", F.lit(True)), "url", "left")
        .select(
            "url",
            "keeper_doc_id",
            "n_raw_spellings",
            F.lit(1).alias("bloom_hit"),
            F.when(F.col("_seen").isNotNull(), F.lit("dup"))
            .otherwise(F.lit("rescued_fp"))
            .alias("verdict"),
            F.when(F.col("_seen").isNotNull(), F.lit(0))
            .otherwise(F.lit(1))
            .alias("emitted"),
        )
    )
    return negatives.unionByName(positives)
