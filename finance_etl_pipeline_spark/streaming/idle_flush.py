"""Idle-timeout session flush over TWS processing-time timers.

The missing piece between windowed aggregation and hand-rolled state:
accumulate per-key aggregates while a key is active, and emit ONE
finalized row when the key goes idle — the classic sessionization
finalizer (abandoned-cart emission, device-offline rollup, end-of-
session feature write).  ``session_window`` can only emit on
watermark advance; a processing-time timer emits on IDLENESS, event
time notwithstanding.

Mechanics: every batch that sees a key updates its ValueState
aggregate and (re)registers a processing-time timer ``idle_ms`` past
the current batch timestamp.  A later batch whose processing time
passes the expiry fires ``handleExpiredTimer`` for the key: the
finalized (user_id, n_events, total_value) row is emitted and the
state cleared.  Keys still active when the stream stops simply hold
state — exactly the semantics a resumable checkpointed query wants.

Operational note: a processing-time-timer query is CONTINUOUS — the
engine keeps scheduling micro-batches so future timers can fire, so
``trigger(availableNow=True)`` does NOT self-terminate the way the
timeMode="None" operators in this package do.  Run it as a long-lived
query (or poll-and-stop, as the test does); measured behavior: after
the last timer fires the engine's expiry polls return "No expired
timer" and batches are empty.

Timer traffic (RegisterTimer / ExpiryTimerRequest /
StateResponseWithTimer paging / DeleteTimer) is the last leg of the
TWS state-server protocol, exercised end to end through
streaming/proto_shim.py where the protobuf runtime is absent
(tests/test_tws_idle_flush.py)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from finance_etl_pipeline_spark.streaming import proto_shim

proto_shim.install()

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"


class IdleFlushProcessor(StatefulProcessor):
    """Keyed by user_id; ValueState (n_events, total_value); a
    processing-time timer finalizes the key after ``idle_ms`` of
    inactivity."""

    def __init__(self, idle_ms: int = 0) -> None:
        self._idle_ms = idle_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._agg = handle.getValueState(
            "agg", "n_events long, total_value double"
        )

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        # one get() RPC; None when absent (exists()+get() would be two)
        n, total = self._agg.get() or (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._agg.update((n, total))
        # activity resets the idle clock: drop any earlier timer for
        # this key before arming the new one (a stale timer would
        # flush a still-active key early)
        for t in list(self._handle.listTimers()):
            self._handle.deleteTimer(t)
        self._handle.registerTimer(
            timerValues.getCurrentProcessingTimeInMs() + self._idle_ms
        )
        return iter([])

    def handleExpiredTimer(
        self, key: tuple, timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        got = self._agg.get()
        if got is None:
            return
        n, total = got
        self._agg.clear()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 6)],
            }
        )

    def close(self) -> None:
        pass


def stream_idle_flush(events: DataFrame, idle_ms: int = 0) -> DataFrame:
    """Finalized per-user aggregates, emitted when a user goes idle."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            IdleFlushProcessor(idle_ms),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="ProcessingTime",
        )
    )
