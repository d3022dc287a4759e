"""Watermark-driven session finalize over TWS EVENT-TIME timers.

The event-time twin of streaming/idle_flush.py, and the last leg of
the Spark-4 state API this package exercises: idle_flush's
processing-time timers fire N ms of WALL CLOCK after the last
activity, which cannot express "the session closes 30 minutes after
its last EVENT".  Every real sessionization finalizer needs the
event-time form — replaying yesterday's log at 100× speed must close
sessions at the same event-time boundaries, not 100× early.

Semantics (identical to the batch gaps-and-islands oracle
``plans/events.py::_with_session_no`` — strict ``> 30 min`` gap starts
a new session, boundary compared in exact integer microseconds):

- ``handleInputRows`` folds the batch's events (sorted by event time)
  into one open-session ValueState per user.  An in-batch or
  cross-batch gap ``> 30 min`` closes the open session INLINE (the new
  event proves the gap — no need to wait for the watermark) and opens
  a new one.
- activity re-arms a single EVENT-TIME timer at
  ``last_event_ms + gap + 1`` (strictly past the inclusive boundary:
  an event exactly 30 min later still extends the session).  When the
  WATERMARK passes that expiry, ``handleExpiredTimer`` emits the
  trailing open session and clears state — by watermark contract no
  event that could extend it can still arrive.
- a stale timer (key saw newer activity but the delete raced a
  concurrent fire) is ignored by re-checking the expiry against
  current state.

Unlike the processing-time form, an event-time query DOES
self-terminate under ``trigger(availableNow=True)``: the engine runs
watermark-advance (no-data) batches until all expirable timers have
fired, then stops — state only remains for sessions the final
watermark cannot yet prove closed.

State is O(active users) × one fixed-width tuple; timers are one per
active user.  Timer traffic (RegisterTimer / DeleteTimer / ListTimers
/ expiry iteration) plus the GetWatermark TimerValueRequest runs
through streaming/proto_shim.py where the protobuf runtime is absent.

Verified by tests/test_tws_event_session.py: availableNow drain ==
the batch ``_with_session_no`` sessionization on the same files.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from finance_etl_pipeline_spark.streaming import proto_shim

proto_shim.install()

_GAP_US = 1_800_000_000  # 30 min in microseconds (matches batch oracle)
_GAP_MS = 1_800_000

OUTPUT_SCHEMA = "user_id long, n_events long, s_start_us long, s_end_us long"


def _finalized(key: tuple, sessions: list[tuple]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [key[0]] * len(sessions),
            "n_events": [n for _, _, n in sessions],
            "s_start_us": [s for s, _, _ in sessions],
            "s_end_us": [e for _, e, _ in sessions],
        }
    )


class EventSessionProcessor(StatefulProcessor):
    """Keyed by user_id; ValueState holds the one open session
    (s_start_us, last_us, n_events); an event-time timer finalizes it
    once the watermark passes last event + gap."""

    def __init__(self, gap_us: int = _GAP_US) -> None:
        self._gap_us = gap_us

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sess = handle.getValueState(
            "sess", "s_start_us long, last_us long, n_events long"
        )

    def _expiry_ms(self, last_us: int) -> int:
        # strictly past the inclusive boundary: an event at exactly
        # last + gap still extends the session, so the timer must not
        # be able to fire until the watermark is beyond it
        return last_us // 1000 + self._gap_us // 1000 + 1

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        ts: list[int] = []
        for pdf in rows:
            ts.extend(int(t) for t in pdf["ts_us"])
        if not ts:
            return
        ts.sort()
        # single get() round trip (None when absent) — exists()+get()
        # would cost two state-server RPCs per key per batch
        state = self._sess.get()
        closed: list[tuple] = []
        for t in ts:
            if state is None:
                state = (t, t, 1)
            elif t - state[1] > self._gap_us:
                closed.append(state)
                state = (t, t, 1)
            else:
                # cross-batch stragglers may land inside the open
                # session out of order: widen both edges
                state = (min(state[0], t), max(state[1], t), state[2] + 1)
        self._sess.update(state)
        # activity moves the close boundary: one live timer per key
        for old in list(self._handle.listTimers()):
            self._handle.deleteTimer(old)
        self._handle.registerTimer(self._expiry_ms(state[1]))
        if closed:
            yield _finalized(key, closed)

    def handleExpiredTimer(
        self, key: tuple, timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        state = self._sess.get()
        if state is None:
            return
        # stale-timer guard: only finalize if this expiry really is
        # the current session's close boundary (or later)
        if expiredTimerInfo.getExpiryTimeInMs() < self._expiry_ms(state[1]):
            return
        self._sess.clear()
        yield _finalized(key, [state])

    def close(self) -> None:
        pass


def stream_event_sessions(
    events: DataFrame, gap_us: int = _GAP_US, watermark_delay: str = "30 minutes"
) -> DataFrame:
    """Finalized per-user sessions (start/end/event-count), each
    emitted exactly once: inline when a later event proves the gap,
    or by event-time timer when the watermark proves no extension can
    arrive.  ``watermark_delay`` is the allowed out-of-orderness of
    the source — it delays timer fires but never changes the emitted
    session set."""
    return (
        events.withWatermark("ts", watermark_delay)
        .select("user_id", "ts", F.unix_micros("ts").alias("ts_us"))
        .groupBy("user_id")
        .transformWithStateInPandas(
            EventSessionProcessor(gap_us),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )
