"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in the package's operator registry
(data_ingestion_from_multiple_directories_linux_spark/operators/*);
this module only exposes them.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

# Importing the operator modules populates the registry.
from data_ingestion_from_multiple_directories_linux_spark.operators import (  # noqa: E402
    asof,  # noqa: F401
    attribution,  # noqa: F401
    corpus,  # noqa: F401
    dedup,  # noqa: F401
    graphs,  # noqa: F401
    grouping,  # noqa: F401
    maintenance,  # noqa: F401
    matching,  # noqa: F401
    multimodal,  # noqa: F401
    profiling,  # noqa: F401
    relational,  # noqa: F401
    semistructured,  # noqa: F401
    similarity,  # noqa: F401
    sketches,  # noqa: F401
    text_analysis,  # noqa: F401
    timeseries,  # noqa: F401
    tpch,  # noqa: F401
    tpch_final,  # noqa: F401
    warehouse,  # noqa: F401
    windows,  # noqa: F401
)
from data_ingestion_from_multiple_directories_linux_spark.operators.registry import (  # noqa: E402
    ORACLES,
    QUERIES,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver caps how many entries get a correctness row per round
# (50 of 74+ in rounds 2-4, in registration order). Entries listed here
# are emitted FIRST. The list rotates each round so every query's newest
# driver row stays at most one round old. Round-5 allocation of the 50
# slots, per the round-4 verdict ("renewals, not new surface"):
# (a) the 31 queries that have NEVER had a driver CORRECTNESS row
#     (the round-4 tail the cap displaced: histogram_quantiles …
#     user_value_outliers, kmv_distinct_by_day, q7/q8/q17/q22,
#     first-batch block),
# (b) peak_concurrency_daily — its r04 row is invalidated this round by
#     the advisor-mandated ('us','event_id') tiebreak fix in
#     timeseries.py (semantics touched ⇒ must re-sample),
# (c) maintenance_report_tables — the one NEW query this round (verdict
#     task 7), never sampled,
# (d) the r02-stale relational renewals (three rounds old; their file
#     gained TPC-H code in round 4) — first 17 fit the cap.
# Everything past the cap is re-verified at HEAD by the fresh-process
# VERIFY_LOCAL_r05.txt record and the pytest oracle-parity suite.
_PRIORITY_FIRST = [
    # (a) never driver-sampled — round-4 second-batch tail
    "histogram_quantiles",
    "count_min_heavy_hitters",
    "cluster_size_histogram",
    "table_profile_orders",
    "join_cardinality_estimate",
    "incremental_rollup_merge",
    "top_parts_per_brand",
    "event_transition_matrix",
    "cross_source_overlap",
    "rolling_active_users",
    "quantiles_by_event_type",
    "top_event_paths",
    "kmv_distinct_by_day",
    "q7_nation_volume",
    "q8_market_share",
    "q17_small_quantity_revenue",
    "q22_idle_customers",
    # (a) never driver-sampled — round-4 first batch
    "media_pixel_stats",
    "span_dedup_reassemble",
    "minhash_incremental_near_dup",
    "ivf_topk_neighbors",
    "global_shuffle_rank",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "dedup_materialize_canonical",
    "hard_negative_mining",
    "moving_avg_user_value",
    "funnel_conversion",
    "normalized_exact_dedup",
    "user_value_outliers",
    # (b) semantics touched this round (tiebreak fix) — re-sample
    "peak_concurrency_daily",
    # (c) new this round (maintenance telemetry surface)
    "maintenance_report_tables",
    # (d) r02-stale relational renewals (first 17 fit the 50-slot cap)
    "update_join_propagate",
    "count_distinct_users",
    "minmax_priority_window",
    "top_spender_subquery_agg",
    "top_k_orders",
    "union_pipeline_summary",
    "distinct_status_priority",
    "salted_skew_counts",
    "except_open_not_failed",
    "intersect_repeat_customers",
    "rollup_status_priority",
    "cube_status_priority",
    "notin_priority_counts",
    "regex_part_filter",
    "filename_parse_lineage",
    "null_normalization",
    "date_validation_split",
    # --- positions 51+ (beyond the 50-slot cap; round 6 front-loads
    # these): the remaining r02-stale masking/string renewals, then the
    # r03-era entries in files appended-to during round 4, then the
    # r04-green blocks (newest evidence, rotate last)
    "pii_mask_constant",
    "json_extract_props",
    "struct_field_mask",
    "struct_to_json",
    "substring_truncate",
    "concat_runid_format",
    "session_duration_secs",
    "sequence_packing",
    "cosine_topk",
    "embedding_near_dup_ivf",
    "embedding_near_dup_lsh",
    "minhash_lsh_near_dup",
    "ngram_jaccard_pairs",
    "ngram_jaccard_capped",
    "duplicate_clusters",
    "tumbling_window_counts",
    "event_gaps_lag",
    "multires_rollup_events",
]


def _ordered(mapping: dict) -> dict:
    head = {k: mapping[k] for k in _PRIORITY_FIRST if k in mapping}
    tail = {k: v for k, v in mapping.items() if k not in head}
    return {**head, **tail}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted ⇒ rows-only check)."""
    return _ordered(ORACLES)
