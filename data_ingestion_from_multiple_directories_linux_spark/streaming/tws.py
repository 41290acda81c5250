"""Arbitrary stateful streaming via ``transformWithStateInPandas``
(Spark 4's successor to ``applyInPandasWithState`` — SURVEY.md §2.12
escape hatch, second generation).

What the new API adds over the ``GroupState`` path in
:mod:`.stateful` and why an engine at 100 TB cares:

* **Typed, composable state variables** — a key's state is no longer
  one monolithic tuple: this processor keeps a ``ValueState`` (running
  totals) *and* a ``MapState`` (per-event-type counts) side by side,
  each independently encoded in the state store. A monolithic tuple
  forces a full rewrite per batch; per-variable encoding lets RocksDB
  changelog checkpointing ship only the variables that changed.
* **State TTL** — per-variable ``ttlDurationMs`` lets the store expire
  idle keys (the unbounded-key-cardinality guard: a trillion-user
  stream cannot keep every user's state forever).
* **Timers** — ``registerTimer``/``handleExpiredTimer`` replace the
  coarse ``GroupStateTimeout`` with per-key scheduled callbacks.

Execution model is unchanged from the first-generation path: one hash
shuffle on the key, Arrow-batched per-key pandas frames into a Python
worker, state in the checkpointed state store — Python touches per-key
deltas, never the corpus.

Deployment notes:

* ``transformWithState`` requires the RocksDB state store provider
  (``spark.sql.streaming.stateStore.providerClass`` =
  ``...state.RocksDBStateStoreProvider``) — the default HDFS-backed
  provider does not implement the multi-variable column families.
* The processor class is defined INSIDE the factory function below, on
  purpose: Spark runs a dedicated *driver-side* Python worker for
  transformWithState that deserializes the processor via cloudpickle
  in a fresh interpreter whose ``sys.path`` does not include the
  application package. A module-level class pickles by REFERENCE and
  dies there with ModuleNotFoundError; a closure-defined class pickles
  by VALUE and is self-contained. (Regular executor-side UDFs don't
  hit this because their workers inherit the shipped pyFiles path.)
* The Python↔JVM state protocol is protobuf-based
  (``pyspark/sql/streaming/proto/StateMessage_pb2``) — the
  ``protobuf`` package must be installed on driver AND workers. In
  environments without it (this sandbox: no protobuf, no pip) query
  START fails with ``ImportError ... google.protobuf``; plan
  construction and the processor itself are untouched, so the e2e
  test auto-enables via ``pytest.importorskip`` where protobuf
  exists, with a construction-level test always on. The
  first-generation :mod:`.stateful` path has no such dependency and
  stays the sanctioned fallback here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, n_types bigint"
)

#: session conf required by transformWithState (see module docstring)
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def user_activity_totals(events: DataFrame) -> DataFrame:
    """Running (count, sum(value), distinct-type count) per user; state
    carries across micro-batches and restarts via the checkpoint.

    Emits one update row per user per micro-batch that touched the
    user (outputMode Update), like :func:`..streaming.stateful
    .running_user_totals` — plus the MapState-backed distinct-type
    count that the monolithic GroupState tuple could not grow without
    rewriting every key's whole state each batch.
    """
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    class UserActivityProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n bigint, total double"
            )
            self._by_type = handle.getMapState(
                "by_type", "event_type string", "cnt bigint"
            )

        def handleInputRows(
            self,
            key: tuple,
            rows: Iterator[pd.DataFrame],
            timerValues: TimerValues,
        ) -> Iterator[pd.DataFrame]:
            n, total = (
                self._totals.get() if self._totals.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
                for etype, cnt in pdf["event_type"].value_counts().items():
                    prev = (
                        self._by_type.getValue((etype,))[0]
                        if self._by_type.containsKey((etype,))
                        else 0
                    )
                    self._by_type.updateValue((etype,), (prev + int(cnt),))
            self._totals.update((n, round(total, 6)))
            n_types = sum(1 for _ in self._by_type.keys())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 6)],
                    "n_types": [n_types],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserActivityProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
