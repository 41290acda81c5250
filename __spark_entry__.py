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
# (50 of 74+ in rounds 2-3), in registration order. Entries listed here
# are emitted FIRST. The list rotates each round so every query's newest
# driver row stays at most one round old. Round-4 allocation of the 50
# slots (continuation): the 12 continuation-batch queries (weighted
# sampling, SQ8/PQ/SemDeDup, UDTF, BPE pairs, recursive spread, MinHash
# calibration, label centroids, M4, concurrency, nearest as-of — never
# driver-checked anywhere), then the round-4 final batch (TPC-H
# completion etc.), then as much of the second batch as fits; a
# never-checked query outranks renewing one that has the committed
# fresh-process 147+/151 record (VERIFY_LOCAL_r04.txt, regenerated this
# session). Everything past the cap is re-verified at HEAD by that
# record; round 5 should front-load, in order: the relational renewals
# (their newest driver rows are r02 — three rounds old), the displaced
# second-batch tail (kmv_distinct_by_day, q7/q8/q17/q22 onward), the
# first-batch entries, then the appended-file entries at the bottom.
_PRIORITY_FIRST = [
    # newest (round-4 continuation): no driver row, no prior local record
    "weighted_sample_docs",
    "sq8_quantized_topk",
    "udtf_char_chunks",
    "bpe_merge_pair_counts",
    "contamination_spread",
    "pq_topk_adc",
    "label_centroids",
    "semantic_dedup_survivors",
    "minhash_estimate_calibration",
    "m4_downsample_events",
    "peak_concurrency_daily",
    "asof_nearest_click",
    "ivfpq_topk_neighbors",
    "asof_next_click",
    "char_lm_surprise",
    "vocab_dense_ids",
    # new in round 4, final batch (tpch_final.py — completes the
    # 22-shape TPC-H spectrum; no driver row exists for any of these)
    "q2_regional_best_supplier",
    "q9_nation_year_profit",
    "q11_part_value_concentration",
    "q12_delay_priority_classes",
    "q13_customer_order_distribution",
    "q15_top_revenue_supplier",
    "q16_supplier_part_variety",
    "q20_dominant_share_suppliers",
    "q21_sole_late_suppliers",
    "ntile_customer_quartiles",
    "percent_rank_part_prices",
    "image_near_dup_ahash",
    "variant_props_metrics",
    "audio_fingerprint_classes",
    "click_attribution_batch",
    "grouping_sets_status_priority",
    "dense_rank_order_values",
    "user_event_type_arrays",
    "near_dup_triangles",
    "exact_moment_correlation",
    # new in round 4, second batch (tpch/warehouse/matching/profiling)
    "q6_forecast_revenue",
    "q14_promo_effect",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q4_late_shipment_priority",
    "scd2_user_state_intervals",
    "cohort_retention",
    "fuzzy_part_match",
    "token_cooccurrence_lift",
    "key_skew_profile",
    "stratified_sample_docs",
    "time_weighted_avg_value",
    "gap_fill_hourly_locf",
    "value_histogram_events",
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
    # new in round 4, first batch
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
    # displaced from CORRECTNESS_r03.json by the driver cap, and their
    # file (relational.py) gained the TPC-H/bulk-update code this round
    # — renew now
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
    "pii_mask_constant",
    "json_extract_props",
    "struct_field_mask",
    "struct_to_json",
    "substring_truncate",
    "concat_runid_format",
    "session_duration_secs",
    # --- positions 51+ (beyond the round-4 driver cap; round-5 should
    # front-load these): sequence_packing (plan rewritten to two-phase
    # prefix-sum this round; r03 row + local suite cover it) and the
    # r03-green entries in files that gained appended code this round
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
