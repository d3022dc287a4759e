"""Per-key bounded recent-history buffer over TWS ListState — the
feature-store "last-k events per entity" maintenance loop.

Each micro-batch merges the batch's rows with the stored buffer,
keeps the k most recent by (ts, event_id), writes the buffer back,
and emits the post-batch buffer as ranked rows.  State is EXACTLY
k rows per key — the operator that keeps "most recent N" features
fresh without re-scanning history, which no built-in streaming
aggregation expresses (windowed aggs keep time buckets, not a
count-bounded buffer).

With a single availableNow batch the emitted buffer equals the batch
top-k-per-user by recency (row_number window), which is what
tests/test_tws_recent.py asserts.  ListState get()/put() page through
the JVM state server (StateResponseWithListGet / requireNextFetch),
completing the value/map/list state-API matrix exercised end to end
through streaming/proto_shim.py where protobuf is absent.
"""

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

RECENT_K = 5

OUTPUT_SCHEMA = "user_id long, rank long, event_id long, value double"


class RecentEventsProcessor(StatefulProcessor):
    """Keyed by user_id; ListState holds the k most recent
    (ts_micros, event_id, value) rows, newest first."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._recent = handle.getListState(
            "recent", "ts_micros long, event_id long, value double"
        )

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        buf = [tuple(r) for r in self._recent.get()] if self._recent.exists() else []
        for pdf in rows:
            # normalize to microseconds regardless of the pandas
            # datetime unit Arrow hands over (ns vs us)
            ts_us = pdf["ts"].astype("datetime64[us]").astype("int64").tolist()
            buf.extend(
                zip(ts_us, pdf["event_id"].tolist(), pdf["value"].tolist())
            )
        # newest first; event_id breaks timestamp ties deterministically
        buf.sort(key=lambda t: (t[0], t[1]), reverse=True)
        buf = buf[:RECENT_K]
        self._recent.put(buf)
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(buf),
                "rank": list(range(1, len(buf) + 1)),
                "event_id": [t[1] for t in buf],
                "value": [float(t[2]) for t in buf],
            }
        )

    def close(self) -> None:
        pass


def stream_recent_events(events: DataFrame) -> DataFrame:
    """Append changelog of each user's post-batch k-most-recent events."""
    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            RecentEventsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    )
