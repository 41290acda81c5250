"""Custom stateful streaming operator (SURVEY.md §2.12 escape hatch):
per-user running aggregates via ``applyInPandasWithState``.

Built-in streaming aggregation already covers windowed counts
(operators/windows.py); this module demonstrates the *arbitrary* stateful
path — the one to reach for when the per-key logic is imperative (running
counters with custom reset rules, state machines like the reference's
``sync_file`` processed-status transitions, file_loader.py:247-278, or
cross-batch sessionization with side effects).

Execution model: the stream is hash-shuffled on the key, each key group's
Arrow batches are handed to one Python worker together with that key's
state; state lives in the state store (checkpointed, recovered on
restart). At 100 TB the cost is that single shuffle plus Arrow transfer —
the same shape as a built-in streaming aggregate, with Python only
touching per-key deltas, never the corpus.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, round(total, 6)))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Running (count, sum(value)) per user, updated every micro-batch.

    Each emitted row is the user's cumulative total as of that batch —
    state carries across triggers via the checkpoint, so a restart
    resumes the counts instead of recomputing the stream.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
