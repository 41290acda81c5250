"""Watermarked stream-stream interval join (SURVEY.md §2.12 streaming
surface — new capability beyond the reference).

The canonical use: click attribution — join a click stream to the
impression stream that caused it, where the click must land inside an
attribution window after its impression. Batch-side the same semantics
are the as-of / range joins (operators/asof.py, both oracle-paired);
this module is their STREAMING twin, the shape the batch operators
cannot express: both inputs unbounded, matches emitted continuously,
state bounded by watermarks.

How Spark bounds the state: each side declares a watermark, and the
join condition carries an explicit event-time constraint
(``click_ts BETWEEN imp_ts AND imp_ts + window``). From those two facts
the engine derives exactly how long an impression must be buffered
(attribution window + click lateness) and how long a click must wait
for a late impression, and evicts state past that horizon — without the
time constraint a stream-stream join would buffer FOREVER, which is the
classic production OOM. At 100 TB/day the state store holds only
(attribution window + lateness) × arrival rate rows per key range,
shard-partitioned by join key across executors.

Left-outer semantics: an impression with no click inside its window
emits exactly once, with NULL click columns, when the click-side
watermark passes the end of its window — the streaming form of "the
campaign report row shows zero conversions", and it is exactly-once
because the state-store eviction IS the emission.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: how long after the impression a click still attributes to it
ATTRIBUTION_WINDOW = "30 minutes"
#: per-side lateness allowances (state horizon = window + lateness)
IMPRESSION_LATENESS = "1 hour"
CLICK_LATENESS = "1 hour"


def attribute_clicks(
    impressions: DataFrame,
    clicks: DataFrame,
    window: str = ATTRIBUTION_WINDOW,
    how: str = "inner",
) -> DataFrame:
    """Join click events to the impression that caused them.

    ``impressions``: (ad_id long, imp_ts timestamp, campaign string);
    ``clicks``: (click_ad_id long, click_ts timestamp, click_id long).
    Streaming or batch frames both work — the expression is identical;
    on streams each side gets its watermark here so callers can't
    forget them (forgetting = unbounded state, or an analysis error for
    outer joins).

    ``how='left_outer'`` additionally emits unmatched impressions (NULL
    click columns) once their attribution window is fully past the
    click watermark — use for conversion-rate reports that must count
    zero-click impressions.
    """
    imp = impressions
    clk = clicks
    if imp.isStreaming:
        imp = imp.withWatermark("imp_ts", IMPRESSION_LATENESS)
    if clk.isStreaming:
        clk = clk.withWatermark("click_ts", CLICK_LATENESS)
    cond = (
        (F.col("ad_id") == F.col("click_ad_id"))
        & (F.col("click_ts") >= F.col("imp_ts"))
        & (F.col("click_ts") <= F.col("imp_ts") + F.expr(f"INTERVAL {window}"))
    )
    return imp.join(clk, cond, how)
