"""As-of join battery (custom operator — operators/asof.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.operators.asof import asof_join_backward
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import table


@register(
    "asof_last_purchase",
    """
    WITH purchases AS (
      SELECT user_id, ts, max(value) AS pvalue
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    )
    SELECT e.event_id, e.user_id, e.ts, p.pvalue AS asof_pvalue
    FROM events e
    ASOF LEFT JOIN purchases p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    ORDER BY e.event_id
    """,
    "join",
    "asof",
    "bench",
)
def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event annotated with the same user's most recent purchase
    value at-or-before its timestamp — the canonical as-of shape
    (events × slowly-changing values).  The Spark side is the
    union+window implementation; DuckDB verifies with its native
    ASOF JOIN."""
    e = table(spark, sf_dir, "events")
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pvalue"))
    )
    joined = asof_join_backward(
        e.select("event_id", "user_id", "ts"),
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["pvalue"],
    )
    return joined.select(
        "event_id", "user_id", "ts", F.col("asof_pvalue")
    ).orderBy("event_id")
