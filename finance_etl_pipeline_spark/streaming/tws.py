"""Spend-threshold alerting via ``transformWithStateInPandas`` —
Spark 4's arbitrary-stateful-processing API (the successor to
``applyInPandasWithState``, SPARK-49564).

Why it exists next to streaming/stateful.py: the old API exposes ONE
opaque state tuple per key; the new `StatefulProcessor` composes named
state variables (value/list/map), supports TTL and timers, and emits
any number of rows per key per batch.  The demo operator emits one
alert row each time a user's cumulative spend crosses another
``ALERT_STEP`` boundary — alerts fire mid-stream (not at end-of-data),
which plain windowed aggregation cannot express.

The final alert SET is order-independent (cumulative spend is
monotone, so the boundaries crossed are exactly 1..floor(total/step)),
which is what makes the operator testable against a batch oracle.

Requires the RocksDB state store provider (the test sets
``spark.sql.streaming.stateStore.providerClass``); at scale RocksDB
state also brings changelog checkpointing — state restore cost is
O(changed keys), not O(state).

Environment note: the TWS state-server protocol is protobuf-framed;
pyspark expects the ``protobuf`` runtime for its generated
``StateMessage_pb2``.  Where ``google.protobuf`` is absent,
``streaming/proto_shim.py`` (a pure-Python proto3 wire-format
implementation of the same public Spark message contract) is
registered in its place — the ``install()`` below runs at import
time, which is exactly when a Spark Python worker unpickles the
``SpendAlertProcessor`` defined here, i.e. before the first
state-server round trip.  With real protobuf installed the shim
stands down and the generated module is used untouched."""

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

ALERT_STEP = 1000.0

OUTPUT_SCHEMA = "user_id long, boundary long, total_at_alert double"


class SpendAlertProcessor(StatefulProcessor):
    """Keeps one ValueState (cumulative spend + boundaries already
    alerted) per user; emits a row per newly crossed boundary."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "spend", "total double, alerted long"
        )

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        total, alerted = (
            self._state.get() or (0.0, 0)  # one RPC; None when absent
        )
        out_bound: list[int] = []
        out_total: list[float] = []
        for pdf in rows:
            for v in pdf["value"]:
                total += float(v)
                while total >= (alerted + 1) * ALERT_STEP:
                    alerted += 1
                    out_bound.append(alerted)
                    out_total.append(round(total, 2))
        self._state.update((total, alerted))
        if out_bound:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out_bound),
                    "boundary": out_bound,
                    "total_at_alert": out_total,
                }
            )

    def close(self) -> None:
        pass


def spend_alerts(events: DataFrame) -> DataFrame:
    """Streaming per-user spend-boundary alerts (append output)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            SpendAlertProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    )
