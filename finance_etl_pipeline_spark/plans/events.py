"""Windowed event analytics (SURVEY.md §2.10 / §7.5) — batch first.

The reference has no streaming surface; these queries define the
windowed semantics on the ``events`` table as batch DataFrame ops.
``streaming/`` wraps the exact same expressions in Structured
Streaming (readStream + watermark) without changing semantics —
the batch oracle here is what makes them verifiable.

Scale: tumbling/sliding windows are groupBy shuffles on (window, key)
— partition count rides spark.sql.shuffle.partitions + AQE; session
windows shuffle per user_id which is the natural key distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.scalars import fround
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import table


@register(
    "e_tumbling_window",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           floor((sum(value)) * 100 + 0.5001) / 100 AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
    "events",
    "window",
)
def e_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate via Spark's window() operator
    (window.start == date_trunc('hour') for hour-aligned tumbling)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            fround(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "e_sliding_window",
    """
    WITH grid AS (
      SELECT value,
             date_trunc('hour', ts)
               + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
                      ELSE INTERVAL 0 MINUTE END AS bucket30
      FROM events
    ),
    assigned AS (
      SELECT value, bucket30 AS window_start FROM grid
      UNION ALL
      SELECT value, bucket30 - INTERVAL 30 MINUTE FROM grid
    )
    SELECT window_start,
           count(*) AS n_events,
           floor((sum(value)) * 100 + 0.5001) / 100 AS total_value
    FROM assigned
    GROUP BY window_start
    ORDER BY window_start
    """,
    "events",
    "window",
)
def e_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1-hour length, 30-minute slide — each event lands
    in two windows (Spark explodes internally; the oracle materializes
    the same two bucket assignments)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            fround(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
        .orderBy("window_start")
    )


@register(
    "e_session_window",
    """
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_no
      FROM ordered
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           floor((sum(value)) * 100 + 0.5001) / 100 AS total_value
    FROM sessions
    GROUP BY user_id, session_no
    ORDER BY user_id, session_start
    """,
    "events",
    "window",
)
def e_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap via Spark's
    session_window() — the oracle is the classic gaps-and-islands SQL.
    Spark's session end = last event + gap, matching max(ts)+30min."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            fround(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "e_type_share_by_day",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT day, event_type, n,
           floor((CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY day) * 100) * 10000 + 0.5001) / 10000
             AS pct_of_day
    FROM daily
    ORDER BY day, event_type
    """,
    "events",
    "window",
    "agg",
)
def e_type_share_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition: daily counts + windowed share-of-total (aggregate
    feeding a window function — two shuffle stages, both on `day`)."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("day")
    return daily.select(
        "day",
        "event_type",
        "n",
        fround(F.col("n").cast("double") / F.sum("n").over(w) * 100, 4).alias(
            "pct_of_day"
        ),
    ).orderBy("day", "event_type")


@register(
    "e_click_purchase_attribution",
    """
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS delay_sec,
           floor((p.value) * 100 + 0.5001) / 100 AS purchase_value
    FROM events c
    JOIN events p
      ON p.user_id = c.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    ORDER BY click_id, purchase_id
    """,
    "events",
    "join",
)
def e_click_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time interval join (range join): purchases attributed to a
    same-user click within the preceding 30 minutes.  This is the batch
    twin of the stream-stream join in streaming/events.py —
    identical predicates, so availableNow drain must reproduce it
    (tests/test_streaming.py).

    Scale: the join shuffles both sides on user_id; the time-range
    predicate is evaluated post-match per user partition.  The delay is
    exact integer microseconds floor-divided to seconds — deterministic
    in both engines (no timestamp-truncation semantics involved)."""
    e = table(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value"),
    )
    return (
        c.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
            ),
        )
        .select(
            "click_id",
            "purchase_id",
            "user_id",
            F.expr(
                "(unix_micros(purchase_ts) - unix_micros(click_ts)) div 1000000"
            ).alias("delay_sec"),
            fround(F.col("value"), 2).alias("purchase_value"),
        )
        .orderBy("click_id", "purchase_id")
    )


@register(
    "e_rollup_daily_from_hourly",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
           event_type AS key,
           count(*) AS n_events,
           floor((sum(value)) * 100 + 0.5001) / 100 AS total_value,
           floor((sum(value) / count(*)) * 10000 + 0.5001) / 10000 AS avg_value
    FROM events
    GROUP BY 1, 2
    ORDER BY bucket, key
    """,
    "events",
    "rollup",
    "agg",
)
def e_rollup_daily_from_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate path: raw → hourly partial states → rerolled
    daily → finished metrics.  The oracle computes daily DIRECTLY from
    raw, so the hash match proves the two-stage partial-state
    re-aggregation is lossless (counts/sums are exactly additive; avg
    is derived at finish time as sum/count, never merged)."""
    from finance_etl_pipeline_spark.operators.rollup import (
        finish,
        reroll,
        rollup_partials,
    )

    e = table(spark, sf_dir, "events")
    hourly = rollup_partials(e, "hour")
    return finish(reroll(hourly, "day")).orderBy("bucket", "key")


@register(
    "w_trailing_range_window",
    """
    SELECT event_id, user_id,
           floor((sum(value) OVER (
             PARTITION BY user_id ORDER BY epoch(ts)
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
           )) * 100 + 0.5001) / 100 AS trailing_7d_value
    FROM events
    WHERE event_type = 'purchase'
    ORDER BY event_id
    """,
    "events",
    "window",
)
def w_trailing_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per-user 7-day trailing purchase value
    — a RANGE (value-based) frame over event-time seconds, distinct
    from the ROWS frames of w_moving_sum.  Spark range frames need a
    numeric ordering column, so event time is projected to epoch
    seconds (unix_micros div 1_000_000, exact integer — identical to
    DuckDB's epoch()).  Same-second events fall in one frame in both
    engines, so the sum is order-insensitive and cross-engine stable."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    e = e.withColumn(
        "ts_sec", F.expr("unix_micros(ts) div 1000000")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-604800, W.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        fround(F.sum("value").over(w), 2).alias("trailing_7d_value"),
    ).orderBy("event_id")
