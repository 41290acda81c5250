"""Semi-structured analytics over the VARIANT type (SURVEY.md §2.12a).

The engine already parses ``events.props`` with a DECLARED schema
(``from_json`` — operators/relational.py ``json_extract_props``, C10
parity with the reference's mask-and-reserialize path). VARIANT is the
schema-LESS alternative Spark 4 added for exactly the
semi-structured-lake case: JSON is parsed once into a binary-encoded
value, fields are extracted by path with per-access type coercion, and
no column schema has to be maintained as producers add keys.

At 100 TB the difference is material: a string JSON column re-parses on
EVERY access (each extraction walks the text), while VARIANT parses once
at ingest and every downstream ``variant_get`` is a binary offset walk —
the same reason the warehouses that pioneered the type (Snowflake's
VARIANT, BigQuery JSON) store shredded binary, not text. The 2024
"Variant data type" Spark improvement proposal documents 8×+ speedups
over string JSON for exactly this access pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query


@query(
    "variant_props_metrics",
    oracle="""
    SELECT event_type,
           CAST(COUNT(k) AS BIGINT) AS n_with_k,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(MIN(k) AS BIGINT) AS min_k,
           CAST(MAX(k) AS BIGINT) AS max_k
    FROM (
        SELECT event_type,
               CASE WHEN json_valid(props) THEN
                 CASE json_type(json_extract(props, '$.k'))
                   WHEN 'BIGINT' THEN
                     TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                   WHEN 'UBIGINT' THEN
                     TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                   WHEN 'DOUBLE' THEN
                     TRY_CAST(trunc(TRY_CAST(
                         json_extract_string(props, '$.k') AS DOUBLE))
                       AS BIGINT)
                   WHEN 'VARCHAR' THEN
                     CASE WHEN regexp_matches(
                              trim(json_extract_string(props, '$.k')),
                              '^[+-]?[0-9]+$')
                          THEN TRY_CAST(
                              trim(json_extract_string(props, '$.k'))
                              AS BIGINT) END
                   WHEN 'BOOLEAN' THEN
                     CASE json_extract_string(props, '$.k')
                       WHEN 'true' THEN 1 WHEN 'false' THEN 0 END
                 END
               END AS k
        FROM events
    )
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def variant_props_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metrics off a schema-less JSON property bag: ``props``
    parses to VARIANT once, ``$.k`` extracts as long (NULL when the key
    is absent or non-numeric — ``try``-semantics, so a single malformed
    producer can't fail the pipeline), aggregated per event type.

    Try-semantics contract (two review findings, both confirmed by
    run): the Spark side uses ``try_parse_json`` (strict
    ``parse_json`` ABORTS the query on one malformed producer,
    contradicting the paragraph above) and the oracle emulates the
    variant→long cast TYPE BY TYPE via ``json_type`` — DuckDB's
    untyped ``json_extract_string`` path cannot do it in one cast:
    integers stay exact int64 (a DOUBLE round-trip loses >2^53),
    doubles truncate toward zero (2.5→2/-2.5→-2 where VARCHAR→BIGINT
    rounds half away, and TRY_CAST — not CAST — absorbs the 1e20
    overflow Spark returns NULL for), strings convert only on the
    integral grammar (trimmed ``[+-]?digits``: "007"→7 but "2.5"/
    "1e3"→NULL), booleans map to 1/0, and objects/arrays/JSON-null
    yield NULL. The probe matrix lives in the parity test's
    adversarial corpus.

    Scale plan: parse + extract are map-side expressions fused into the
    scan's codegen stage; the single shuffle is the tiny event_type
    rollup. In a persisted-lake layout the VARIANT parse happens once at
    ingest and this query starts from the binary column — the text walk
    never re-runs."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.try_variant_get(
                F.try_parse_json("props"), "$.k", "long"
            ).alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("k").cast("long").alias("n_with_k"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
        )
        .orderBy("event_type")
    )
