"""Built-in linear-regression aggregates (regr_slope / regr_intercept
/ corr) — beyond-reference statistical surface, per-user value trends
over time. The applyInPandas twin of this computation lives in
operators/grouped.py (verified equal in tests/test_grouped_pandas.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import table


@register(
    "a_regression_trend",
    """
    SELECT user_id,
           count(*) AS n,
           floor((regr_slope(value, epoch(ts))) * 1000000000000 + 0.5001) / 1000000000000 AS slope,
           floor((corr(value, epoch(ts))) * 1000000 + 0.5001) / 1000000 AS time_corr
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    "agg",
    "stats",
)
def a_regression_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS slope + correlation of value against event time.
    Spark `cast(ts as double)` == DuckDB `epoch(ts)` (epoch seconds
    with fractional microseconds). Slopes are ~1e-5 (value units per
    second), so they quantize at 1e-12; corr at 1e-6."""
    from finance_etl_pipeline_spark.functions.scalars import fround

    e = table(spark, sf_dir, "events")
    ts_sec = F.col("ts").cast("double")
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            fround(F.expr("regr_slope(value, cast(ts as double))"), 12).alias("slope"),
            fround(F.corr("value", ts_sec), 6).alias("time_corr"),
        )
        .orderBy("user_id")
    )
