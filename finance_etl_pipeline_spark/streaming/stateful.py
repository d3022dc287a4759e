"""Custom stateful streaming operator via applyInPandasWithState.

Running per-user aggregates (event count, value total, EMA) that
persist across micro-batches — the pattern for stateful logic that
``groupBy().agg()`` cannot express (here: an exponential moving
average, which is order-dependent and non-algebraic).

State is one row per user (bounded by |users|, not |events|); each
trigger touches only the keys present in the batch.  Production use
adds a timeout (``GroupStateTimeout.ProcessingTimeTimeout``) to expire
idle keys and bound state at 100 TB event volumes.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("ema_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("ema", DoubleType()),
    ]
)

EMA_ALPHA = 0.1


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, total, ema = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        ordered = pdf.sort_values(["ts", "event_id"])
        for v in ordered["value"]:
            v = float(v)
            n += 1
            total += v
            ema = v if ema is None else EMA_ALPHA * v + (1 - EMA_ALPHA) * ema
    state.update((n, total, ema))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "ema_value": [round(ema, 6) if ema is not None else None],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Streaming per-user running stats with explicit keyed state."""
    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
