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


@register(
    "asof_next_purchase",
    """
    WITH purchases AS (
      SELECT user_id, ts, max(value) AS pvalue
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    )
    SELECT e.event_id, e.user_id, e.ts, p.pvalue AS asof_pvalue
    FROM events e
    ASOF LEFT JOIN purchases p
      ON e.user_id = p.user_id AND e.ts <= p.ts
    ORDER BY e.event_id
    """,
    "join",
    "asof",
)
def asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each event annotated with the same user's NEXT
    purchase value at-or-after its timestamp — time-to-conversion
    attribution's building block (the mirror of asof_last_purchase).
    DuckDB verifies with native ASOF on the <= direction."""
    from finance_etl_pipeline_spark.operators.asof import asof_join_forward

    e = table(spark, sf_dir, "events")
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pvalue"))
    )
    joined = asof_join_forward(
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


@register(
    "asof_last_purchase_tolerance",
    """
    WITH purchases AS (
      SELECT user_id, ts, max(value) AS pvalue
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    )
    SELECT e.event_id, e.user_id, e.ts,
           CASE WHEN e.ts - p.ts <= INTERVAL 6 HOUR
                THEN p.pvalue END AS asof_pvalue
    FROM events e
    ASOF LEFT JOIN purchases p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    ORDER BY e.event_id
    """,
    "join",
    "asof",
)
def asof_last_purchase_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of with a 6-hour tolerance (pandas merge_asof's
    `tolerance` semantics): a match older than the tolerance is
    nulled, not carried — stale quotes must not fill forward forever.
    Implemented as the plain backward as-of (carrying the matched
    timestamp) + a gap gate; the oracle mirrors it as ASOF JOIN plus
    the same CASE."""
    from finance_etl_pipeline_spark.operators.asof import asof_join_backward

    e = table(spark, sf_dir, "events")
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pvalue"))
        .withColumn("pts", F.col("ts"))
    )
    joined = asof_join_backward(
        e.select("event_id", "user_id", "ts"),
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["pvalue", "pts"],
    )
    within = F.col("ts") - F.col("asof_pts") <= F.expr("INTERVAL 6 HOURS")
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.when(within, F.col("asof_pvalue")).alias("asof_pvalue"),
    ).orderBy("event_id")
