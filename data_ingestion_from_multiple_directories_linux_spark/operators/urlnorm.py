"""URL canonicalization — the prerequisite of every crawl-dedup path.

Raw crawl URLs arrive in trivially-distinct spellings of the same
resource: mixed-case scheme/host, default ports, tracking parameters,
fragments, trailing slashes. Deduplicating raw strings (exact, Bloom,
or MinHash alike) silently under-merges unless the keys are
canonicalized first, so the rules live in ONE expression both the
batch and streaming paths share.

Rules applied (the conservative, loss-free subset):

1. drop the fragment (``#…`` is client-side only);
2. drop ``utm_*`` tracking parameters — scoped to the QUERY STRING
   (after the first ``?``) only, so a literal ``&utm_`` in a
   query-less path is untouched; dangling ``?``/``&`` separators the
   strip leaves behind are removed without ever rewriting a path
   character (a legal literal ``&`` in a path stays a ``&``);
3. lowercase the scheme and host — and ONLY those: path and query are
   case-significant per RFC 3986;
4. drop the default port (``:443`` for https, ``:80`` for http;
   non-default ports are kept — a different port IS a different
   resource);
5. drop one trailing slash from a non-root PATH (the rule sees only
   the path component, so a ``/`` ending a query value is preserved).

Scheme differences are NOT folded (http vs https may serve different
content). Everything is codegen'd regexp/case arithmetic — a pure
projection, zero shuffle, identical in the DuckDB oracle (the
patterns use the RE2/Java-regex common subset: character classes,
anchors, ``[^&]*`` — no lookaround, no backrefs; the one pattern that
must replace EVERY occurrence, ``&utm_[^&]*``, carries DuckDB's
``'g'`` option to match Spark's always-global ``regexp_replace`` —
all other patterns are ``^``/``$``-anchored and can match at most
once in either engine).

The registered query synthesizes a deterministic messy-variant corpus
from documents (four spelling families keyed on doc_id mod 4, page
identity keyed on doc_id mod 211 so several docs share a resource),
canonicalizes, and groups by the canonical key — the count of raw
spellings collapsed per resource is exactly what raw-string dedup
would have missed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

#: resource-space fold for the synthesized corpus.
PAGE_MOD = 211


def url_canonicalize(col: Column | str) -> Column:
    """Apply the five canonicalization rules to a URL string column.
    NULL passes through (regexp_replace of NULL is NULL).

    The URL is split at the FIRST ``?`` into path-part and query-part
    before rules 2 and 5 run, so utm-stripping can never eat a literal
    ``&``/``utm_`` spelled inside a path and the trailing-slash rule
    can never eat a ``/`` ending a query value. Query cleanup order
    (each pattern ``^``-anchored except the global ``&utm_`` strip):

    a. ``^\\?(utm_[^&]*&)+`` → ``?``   — a leading RUN of utm params
       followed by a kept param (``?utm_a=1&utm_b=2&q=3`` → ``?q=3``);
    b. ``&utm_[^&]*`` → '' (GLOBAL)    — every non-leading utm param;
    c. ``^\\?utm_[^&]*$`` → ''         — the query was utm-only;
    d. ``^\\?$`` → ''                  — a bare dangling ``?``.
    """
    u = F.col(col) if isinstance(col, str) else col
    # 1. fragment
    u = F.regexp_replace(u, "#.*$", "")
    # split at the first '?': path-part (may be the whole string) and
    # query-part ('?...' or '')
    path = F.regexp_extract(u, r"^([^?]*)", 1)
    q = F.regexp_replace(u, r"^[^?]*", "")
    # 2. utm params, query-scoped (order documented above)
    q = F.regexp_replace(q, r"^\?(utm_[^&]*&)+", "?")
    q = F.regexp_replace(q, "&utm_[^&]*", "")
    q = F.regexp_replace(q, r"^\?utm_[^&]*$", "")
    q = F.regexp_replace(q, r"^\?$", "")
    # 3. lowercase scheme + authority only
    scheme = F.lower(F.regexp_extract(path, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = F.lower(
        F.regexp_extract(path, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)", 1)
    )
    port = F.regexp_extract(
        path, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/:?#]*:([0-9]+)", 1
    )
    rest = F.regexp_replace(path, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    # 4. default ports
    keep_port = ~(
        ((scheme == "https") & (port == "443"))
        | ((scheme == "http") & (port == "80"))
        | (port == "")
    )
    authority = F.concat(
        host, F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit(""))
    )
    # 5. one trailing slash off a non-root path (path component only)
    rest = F.regexp_replace(rest, "(.)/$", "$1")
    return F.when(
        scheme == "", F.concat(path, q)  # not scheme://…: rules 1-2 only
    ).otherwise(F.concat(scheme, F.lit("://"), authority, rest, q))


def _sql_canonicalize(u: str) -> str:
    """DuckDB twin of :func:`url_canonicalize` (same regexps; the one
    pattern Spark replaces globally, ``&utm_[^&]*``, carries DuckDB's
    ``'g'`` option — every other pattern is anchored/single-match)."""
    defrag = f"regexp_replace({u}, '#.*$', '')"
    path = f"regexp_extract({defrag}, '^([^?]*)', 1)"
    q = (
        f"regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        f"regexp_replace({defrag}, '^[^?]*', ''),"
        f" '^\\?(utm_[^&]*&)+', '?'),"
        f" '&utm_[^&]*', '', 'g'),"
        f" '^\\?utm_[^&]*$', ''),"
        f" '^\\?$', '')"
    )
    scheme = (
        f"lower(regexp_extract({path},"
        f" '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))"
    )
    host = (
        f"lower(regexp_extract({path},"
        f" '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)', 1))"
    )
    port = (
        f"regexp_extract({path},"
        f" '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/:?#]*:([0-9]+)', 1)"
    )
    rest = (
        f"regexp_replace(regexp_replace({path},"
        f" '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', ''), '(.)/$', '\\1')"
    )
    keep_port = (
        f"NOT (({scheme} = 'https' AND {port} = '443')"
        f" OR ({scheme} = 'http' AND {port} = '80') OR {port} = '')"
    )
    return (
        f"CASE WHEN {scheme} = '' THEN {path} || {q} "
        f"ELSE {scheme} || '://' || {host} || "
        f"(CASE WHEN {keep_port} THEN ':' || {port} ELSE '' END)"
        f" || {rest} || {q} "
        f"END"
    )


#: messy-variant synthesis, DuckDB side (Spark twin inside the query):
#: four spelling families keyed on doc_id mod 4. Families 0-2 collapse
#: to the same bare resource (family 1 carries a MULTI-utm, utm-only
#: query — the leading-run + utm-only rules); family 3 keeps a real
#: ``x=1`` param behind two mid-query utm params plus a fragment (the
#: GLOBAL ``&utm_`` strip — one non-global replace would leave
#: ``utm_b`` behind), so it canonicalizes to the page's ``?x=1``
#: sibling resource.
_RAW_URL_SQL = f"""CASE doc_id % 4
    WHEN 0 THEN 'https://example.com/p/' || CAST(doc_id % {PAGE_MOD} AS VARCHAR)
    WHEN 1 THEN 'https://EXAMPLE.com/p/' || CAST(doc_id % {PAGE_MOD} AS VARCHAR)
                || '?utm_source=feed&utm_medium=rss'
    WHEN 2 THEN 'HTTPS://example.com:443/p/'
                || CAST(doc_id % {PAGE_MOD} AS VARCHAR) || '/'
    ELSE 'https://Example.COM/p/' || CAST(doc_id % {PAGE_MOD} AS VARCHAR)
         || '?x=1&utm_a=2&utm_b=3#section-2'
    END"""


def _raw_url_col() -> Column:
    page = (F.col("doc_id") % PAGE_MOD).cast("string")
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
    "canonical_url_dedup",
    oracle=f"""
    WITH raw AS (
        SELECT doc_id, {_RAW_URL_SQL} AS raw_url FROM documents
    ),
    canon AS (
        SELECT doc_id, raw_url,
               {_sql_canonicalize('raw_url')} AS canonical_url
        FROM raw
    )
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT raw_url) AS BIGINT) AS n_raw_spellings,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
    FROM canon
    GROUP BY 1
    """,
)
def canonical_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize the messy-variant corpus and group by the
    canonical key: documents per resource, DISTINCT raw spellings
    collapsed (the merges raw-string dedup would have missed), and the
    min-doc_id keeper (the exact-dedup convention). Pure projection +
    one groupBy; at scale the canonical key is what feeds the Bloom /
    MinHash paths, so this runs as their prologue in the same stage."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", _raw_url_col().alias("raw_url")
    )
    c = d.select(
        "doc_id", "raw_url", url_canonicalize("raw_url").alias("canonical_url")
    )
    return c.groupBy("canonical_url").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("raw_url").cast("long").alias("n_raw_spellings"),
        F.min("doc_id").cast("long").alias("keeper_doc_id"),
    )
