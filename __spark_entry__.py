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
    corpus,  # noqa: F401
    dedup,  # noqa: F401
    multimodal,  # noqa: F401
    relational,  # noqa: F401
    similarity,  # noqa: F401
    sketches,  # noqa: F401
    text_analysis,  # noqa: F401
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
# driver row stays at most one round old: round 4 front-loads the 24
# entries displaced from CORRECTNESS_r03 (all green in r02 and in the
# local 74-way oracle-parity suite, but whose driver evidence would
# otherwise go stale), then any queries newly added this round; the tail
# is the 50 entries already green in CORRECTNESS_r03.
_PRIORITY_FIRST = [
    # displaced from CORRECTNESS_r03.json by the driver cap — renew now
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
    # new in round 4
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
    "sequence_packing",  # re-verify: plan rewritten to two-phase prefix-sum
    # r03-green entries whose implementing files CHANGED this round
    # (similarity: centroid memo; dedup/text_analysis/windows: appended
    # code; catalog: events NTZ fix) — renew their driver rows so no
    # green evidence rests on a stale file state
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
