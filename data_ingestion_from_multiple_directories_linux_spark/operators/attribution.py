"""Click attribution — the batch twin of the stream-stream interval
join (SURVEY.md §2.12a; streaming/stream_join.py).

``attribute_clicks`` is one join expression used in two execution modes:
under ``readStream`` it is the watermarked stream-stream join (state
bounded by the event-time constraint, e2e-tested in
tests/test_streaming.py); here the SAME function runs on batch frames
derived from the ``events`` table, which puts its join semantics under
the DuckDB oracle — the correctness evidence the streaming harness
cannot produce on its own. One definition, both arrows of the
batch/streaming duality, exactly the Structured Streaming design
pitch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..streaming.stream_join import ATTRIBUTION_WINDOW, attribute_clicks
from .registry import query


@query(
    "click_attribution_batch",
    oracle=f"""
    SELECT i.event_id AS imp_event, c.event_id AS click_event
    FROM events i
    JOIN events c
      ON i.user_id = c.user_id
     AND c.ts >= i.ts
     AND c.ts <= i.ts + INTERVAL {ATTRIBUTION_WINDOW}
    WHERE i.event_type = 'view' AND c.event_type = 'click'
    ORDER BY imp_event, click_event
    """,
)
def click_attribution_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every (view → click-within-30-min) pair per user, through the
    same :func:`attribute_clicks` join the streaming pipeline runs.

    Scale plan: the equi-key (user_id) carries the hash join; the
    interval predicate rides as a residual on the matched pairs —
    never a time-range cross join. Both sides are scan-pruned to one
    event type before the shuffle. In streaming mode the identical
    expression additionally bounds state to window+lateness per side;
    in batch mode AQE sizes the join from the pruned inputs."""
    ev = load_table(spark, sf_dir, "events")
    imp = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("ad_id"),
        F.col("ts").alias("imp_ts"),
        F.col("event_id").cast("string").alias("campaign"),
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("click_ad_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    return (
        attribute_clicks(imp, clk)
        .select(
            F.col("campaign").cast("long").alias("imp_event"),
            F.col("click_id").alias("click_event"),
        )
        .orderBy("imp_event", "click_event")
    )
