"""Grouped-map Pandas operators (applyInPandas).

``applyInPandas`` is the escape hatch for per-group logic the SQL
surface can't express (model scoring, interpolation, domain
resampling).  ``per_user_trend_pandas`` deliberately implements
something SQL CAN express (an OLS slope per user) so the pytest suite
can verify the Pandas path against the builtin ``regr_slope``
aggregate — the point is a *verified* Arrow-batched grouped-map
pipeline, not the statistic itself.

Scale: one shuffle on the group key; each group must fit in one
worker's memory (groups here are per-user event sets). For giant
groups, pre-aggregate or window instead.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

TREND_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n", LongType()),
        StructField("slope", DoubleType()),
    ]
)


def _ols_slope(pdf: pd.DataFrame) -> pd.DataFrame:
    x = pdf["ts"].astype("int64") / 1e9  # seconds
    y = pdf["value"].astype("float64")
    n = len(pdf)
    if n < 2 or x.var() == 0:
        slope = None
    else:
        slope = float(((x - x.mean()) * (y - y.mean())).sum() / ((x - x.mean()) ** 2).sum())
    return pd.DataFrame(
        {"user_id": [int(pdf["user_id"].iloc[0])], "n": [n], "slope": [slope]}
    )


def per_user_trend_pandas(events: DataFrame) -> DataFrame:
    """Per-user OLS slope of value over time via grouped-map Pandas."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(_ols_slope, TREND_SCHEMA)
    )
