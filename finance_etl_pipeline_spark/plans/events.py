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
from pyspark.sql.window import Window

from finance_etl_pipeline_spark.functions.scalars import igrid, sql_igrid
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import table


@register(
    "e_tumbling_window",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5001) AS BIGINT)) AS BIGINT) AS total_value_e2
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
            F.sum(igrid("value", 2)).alias("total_value_e2"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value_e2",
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
           CAST(sum(CAST(floor(value * 100 + 0.5001) AS BIGINT)) AS BIGINT) AS total_value_e2
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
            F.sum(igrid("value", 2)).alias("total_value_e2"),
        )
        .select(
            F.col("w.start").alias("window_start"), "n_events", "total_value_e2"
        )
        .orderBy("window_start")
    )


@register(
    "e_session_window",
    """
    WITH ordered AS (
      SELECT user_id, ts, value,
             -- > (strict) matches Spark session_window's INCLUSIVE
             -- merge boundary: an event at exactly lastEvent + 30min
             -- still extends the session (verified empirically in
             -- test_session_gap_exact_boundary_cross_engine — the
             -- windows are [t, t+30m] for merging, not half-open)
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
           CAST(sum(CAST(floor(value * 100 + 0.5001) AS BIGINT)) AS BIGINT) AS total_value_e2
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
            F.sum(igrid("value", 2)).alias("total_value_e2"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value_e2",
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
           CAST(floor((CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY day) * 100) * 10000 + 0.5001) AS BIGINT)
             AS pct_of_day_e4
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
        igrid(F.col("n").cast("double") / F.sum("n").over(w) * 100, 4).alias(
            "pct_of_day_e4"
        ),
    ).orderBy("day", "event_type")


@register(
    "e_click_purchase_attribution",
    """
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS delay_sec,
           CAST(floor(p.value * 100 + 0.5001) AS BIGINT) AS purchase_value_e2
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
            igrid(F.col("value"), 2).alias("purchase_value_e2"),
        )
        .orderBy("click_id", "purchase_id")
    )


@register(
    "e_multitouch_attribution",
    """
    WITH j AS (
      SELECT p.event_id AS purchase_id, c.event_id AS click_id,
             c.ts AS cts, p.value AS value
      FROM events c
      JOIN events p
        ON p.user_id = c.user_id
       AND p.ts >= c.ts
       AND p.ts <= c.ts + INTERVAL 6 HOUR
      WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    ),
    w AS (
      SELECT purchase_id, value,
             count(*) OVER (PARTITION BY purchase_id) AS n,
             row_number() OVER (PARTITION BY purchase_id
                                ORDER BY cts, click_id) AS rn
      FROM j
    )
    SELECT CASE WHEN n = 1 THEN 'only'
                WHEN rn = 1 THEN 'first'
                WHEN rn = n THEN 'last'
                ELSE 'middle' END AS touch_position,
           count(*) AS n_touchpoints,
           CAST(sum(CAST(floor(value / n * 10000 + 0.5001) AS BIGINT)) AS BIGINT) AS attributed_value_e4
    FROM w GROUP BY 1 ORDER BY touch_position
    """,
    "events",
    "join",
    "window",
)
def e_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's value is split
    equally across all same-user clicks in the preceding 6 hours,
    then rolled up by touch position (first / middle / last / only) —
    the attribution-model complement to the pairwise delay join above.

    Determinism: the touchpoint order within a purchase breaks ties by
    click_id, so position labels are bit-stable; the per-position sum
    is frounded.

    Scale: same interval join as e_click_purchase_attribution (both
    sides shuffle on user_id); the two windows re-shuffle the matched
    pairs on purchase_id — candidate-pair-sized, not event-sized —
    and the final aggregate is four rows."""
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
    j = c.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 6 HOURS")
        ),
    ).select("purchase_id", "click_id", "click_ts", "value")
    n = F.count(F.lit(1)).over(Window.partitionBy("purchase_id"))
    rn = F.row_number().over(
        Window.partitionBy("purchase_id").orderBy("click_ts", "click_id")
    )
    w = j.select(
        "purchase_id",
        "value",
        n.alias("n"),
        rn.alias("rn"),
    )
    bucket = (
        F.when(F.col("n") == 1, "only")
        .when(F.col("rn") == 1, "first")
        .when(F.col("rn") == F.col("n"), "last")
        .otherwise("middle")
    )
    return (
        w.select(bucket.alias("touch_position"), "value", "n")
        .groupBy("touch_position")
        .agg(
            F.count(F.lit(1)).alias("n_touchpoints"),
            F.sum(igrid(F.col("value") / F.col("n"), 4)).alias(
                "attributed_value_e4"
            ),
        )
        .orderBy("touch_position")
    )


@register(
    "e_rollup_daily_from_hourly",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
           event_type AS key,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5001) AS BIGINT)) AS BIGINT) AS total_value_e2,
           CAST(floor(sum(CAST(floor(value * 100 + 0.5001) AS BIGINT)) / count(*) / 100 * 10000 + 0.5001) AS BIGINT) AS avg_value_e4
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
           CAST(sum(CAST(floor(value * 100 + 0.5001) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY epoch(ts)
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS trailing_7d_value_e2
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
        F.sum(igrid("value", 2)).over(w).alias("trailing_7d_value_e2"),
    ).orderBy("event_id")


@register(
    "e_gapfill_interpolate",
    """
    WITH grid AS (
      SELECT t.event_type, CAST(d.d AS DATE) AS day
      FROM (SELECT unnest(['click', 'purchase']) AS event_type) t
      CROSS JOIN (
        SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                      INTERVAL 1 DAY)) AS d
      ) d
    ),
    obs AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(floor(sum(CAST(floor(value * 100 + 0.5001) AS BIGINT)) / count(*) / 100 * 10000 + 0.5001) AS BIGINT) AS v
      FROM events
      WHERE value > 200 AND event_type IN ('click', 'purchase')
      GROUP BY event_type, CAST(ts AS DATE)
    ),
    g AS (
      SELECT grid.event_type, grid.day, obs.v
      FROM grid LEFT JOIN obs
        ON grid.event_type = obs.event_type AND grid.day = obs.day
    ),
    ctx AS (
      SELECT event_type, day, v,
             last_value(v IGNORE NULLS) OVER w_prev AS prev_v,
             last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER w_prev AS prev_d,
             first_value(v IGNORE NULLS) OVER w_next AS next_v,
             first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
               OVER w_next AS next_d
      FROM g
      WINDOW
        w_prev AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, day, v AS v_raw_e4,
           CASE
             WHEN v IS NOT NULL THEN v
             WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
               CAST(floor(prev_v + (next_v - prev_v)
                      * date_diff('day', prev_d, day)
                      / nullif(date_diff('day', prev_d, next_d), 0)
                      + 0.5001) AS BIGINT)
             ELSE NULL
           END AS v_filled_e4
    FROM ctx
    ORDER BY event_type, day
    """,
    "events",
    "window",
    "timeseries",
)
def e_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: a dense (series, day) grid with
    missing days linearly interpolated between the nearest observed
    neighbors (endpoints stay null) — the resample/align step every
    downstream model-feature pipeline needs.

    Built entirely from window functions: last_value/first_value with
    ignorenulls over mirrored frames recover each gap's bracketing
    observations; interpolation is then one deterministic expression
    over already-fround'ed inputs.  The dense grid is generated, not
    scanned (sequence + explode) — at scale the shuffle is
    |series × days|, independent of raw event volume."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    grid = (
        spark.range(1)
        .select(
            F.explode(F.array(F.lit("click"), F.lit("purchase"))).alias(
                "event_type"
            )
        )
        .crossJoin(
            spark.range(1).select(
                F.explode(
                    F.sequence(
                        F.lit("2024-01-01").cast("date"),
                        F.lit("2024-01-30").cast("date"),
                    )
                ).alias("day")
            )
        )
    )
    obs = (
        e.filter(
            (F.col("value") > 200)
            & F.col("event_type").isin("click", "purchase")
        )
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            igrid(
                F.sum(igrid("value", 2)) / F.count(F.lit(1)) / 100, 4
            ).alias("v")
        )
    )
    g = grid.join(obs, ["event_type", "day"], "left")
    w_prev = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_next = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    day_if_obs = F.when(F.col("v").isNotNull(), F.col("day"))
    ctx = g.select(
        "event_type",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.last(day_if_obs, ignorenulls=True).over(w_prev).alias("prev_d"),
        F.first("v", ignorenulls=True).over(w_next).alias("next_v"),
        F.first(day_if_obs, ignorenulls=True).over(w_next).alias("next_d"),
    )
    interp = F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * F.datediff(
        "day", "prev_d"
    ) / F.nullif(
        F.datediff("next_d", "prev_d").cast("double"), F.lit(0.0)
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(),
            F.floor(interp + 0.5001).cast("long"),
        )
        .otherwise(F.lit(None).cast("long"))
    )
    return ctx.select(
        "event_type",
        "day",
        F.col("v").alias("v_raw_e4"),
        filled.alias("v_filled_e4"),
    ).orderBy("event_type", "day")


@register(
    "e_scd2_intervals",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      FROM events WHERE event_type IN ('signup', 'purchase')
    )
    SELECT user_id, event_type, valid_from, valid_to,
           CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current
    FROM seq
    ORDER BY user_id, valid_from
    """,
    "events",
    "window",
    "scd",
)
def e_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 construction: turn a change stream into validity
    intervals — each state row is valid from its own timestamp until
    the user's next change (open-ended for the current state).  The
    temporal-dimension build step; operators/asof.py is the matching
    point-in-time LOOKUP.  One lead() window on the natural user_id
    distribution key."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "purchase")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            "event_type",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
        .withColumn(
            "is_current",
            F.when(F.col("valid_to").isNull(), 1).otherwise(0),
        )
        .orderBy("user_id", "valid_from")
    )


@register(
    "e_interarrival_stats",
    f"""
    WITH seq AS (
      SELECT event_type,
             epoch_us(ts) // 1000000 - epoch_us(lag(ts) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
             )) // 1000000 AS gap_s
      FROM events
    )
    SELECT event_type, count(*) AS n_gaps,
           {{p50}} AS p50_gap_s_e2, {{p90}} AS p90_gap_s_e2
    FROM seq WHERE gap_s IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """.format(
        p50=sql_igrid("quantile_cont(gap_s, 0.5)", 2),
        p90=sql_igrid("quantile_cont(gap_s, 0.9)", 2),
    ),
    "events",
    "window",
    "agg",
)
def e_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time distribution per event type (median / p90
    gap between a user's consecutive same-type events, in seconds) —
    the cadence profile behind session-gap tuning and anomaly
    baselines.  Epoch seconds are exact integers (unix_micros div
    1e6), so the lag difference is integer math and only the
    percentile interpolation needs the rounding contract."""
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events").withColumn(
        "ts_sec", F.expr("unix_micros(ts) div 1000000")
    )
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        (F.col("ts_sec") - F.lag("ts_sec").over(w)).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    _pct = F.expr("percentile(gap_s, array(0.5, 0.9))")  # one buffer
    return (
        seq.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            igrid(F.element_at(_pct, 1), 2).alias("p50_gap_s_e2"),
            igrid(F.element_at(_pct, 2), 2).alias("p90_gap_s_e2"),
        )
        .orderBy("event_type")
    )


@register(
    "e_forecast_mase",
    f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    p7 AS (
      SELECT a.event_type, count(*) AS n_pairs_7d,
             {sql_igrid('sum(abs(a.n - b.n)) / count(*)', 6)} AS mae_seasonal_e6
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day = b.day + INTERVAL 7 DAY
      GROUP BY a.event_type
    ),
    p1 AS (
      SELECT a.event_type, count(*) AS n_pairs_1d,
             {sql_igrid('sum(abs(a.n - b.n)) / count(*)', 6)} AS mae_naive_e6
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day = b.day + INTERVAL 1 DAY
      GROUP BY a.event_type
    )
    SELECT p7.event_type, n_pairs_7d, mae_seasonal_e6, n_pairs_1d, mae_naive_e6,
           {sql_igrid('CAST(mae_seasonal_e6 AS DOUBLE) / mae_naive_e6', 6)} AS mase_e6
    FROM p7 JOIN p1 ON p7.event_type = p1.event_type
    ORDER BY p7.event_type
    """,
    "events",
    "agg",
    "join",
)
def e_forecast_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast evaluation: per event type, the MAE of
    the same-weekday-last-week forecast vs the MAE of the
    previous-day forecast, and their ratio (MASE — mean absolute
    scaled error; < 1 means weekly seasonality beats day-over-day
    persistence).  The standard pre-model baseline audit for any
    forecasting pipeline.

    Gap-safe by construction: predecessors come from calendar date
    self-joins (same pattern as bi_yoy_growth), not row-offset lags
    that silently misalign across missing days.  Both error means are
    integer-count sums divided once — engine-exact before the fround.

    Scale: the daily aggregate reduces events to (type × day) rows;
    everything downstream operates on that tiny grain."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))

    def _pairs(offset_days: int, n_name: str, mae_name: str) -> DataFrame:
        a = daily.alias("a")
        b = daily.select(
            F.col("event_type").alias("b_type"),
            F.col("day").alias("b_day"),
            F.col("n").alias("b_n"),
        )
        return (
            a.join(
                b,
                (F.col("a.event_type") == F.col("b_type"))
                & (
                    F.col("a.day")
                    == F.date_add(F.col("b_day"), offset_days)
                ),
            )
            .groupBy(F.col("a.event_type").alias("event_type"))
            .agg(
                F.count(F.lit(1)).alias(n_name),
                igrid(
                    F.sum(F.abs(F.col("a.n") - F.col("b_n")))
                    / F.count(F.lit(1)),
                    6,
                ).alias(mae_name),
            )
        )

    p7 = _pairs(7, "n_pairs_7d", "mae_seasonal_e6")
    p1 = _pairs(1, "n_pairs_1d", "mae_naive_e6")
    return (
        p7.join(p1, "event_type")
        .select(
            "event_type",
            "n_pairs_7d",
            "mae_seasonal_e6",
            "n_pairs_1d",
            "mae_naive_e6",
            igrid(
                F.col("mae_seasonal_e6").cast("double")
                / F.col("mae_naive_e6"),
                6,
            ).alias("mase_e6"),
        )
        .orderBy("event_type")
    )


@register(
    "e_session_conversion",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_type,
             -- > (strict) matches Spark session_window's INCLUSIVE
             -- merge boundary: an event at exactly lastEvent + 30min
             -- still extends the session (verified empirically in
             -- test_session_gap_exact_boundary_cross_engine — the
             -- windows are [t, t+30m] for merging, not half-open)
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, event_type,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_no
      FROM ordered
    ),
    per AS (
      SELECT user_id, session_no,
             count(*) AS n_events,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_p,
             (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS dur_sec
      FROM sessions GROUP BY 1, 2
    )
    SELECT count(*) AS n_sessions,
           CAST(sum(has_p) AS BIGINT) AS n_converting,
           CAST(floor((sum(has_p) / CAST(count(*) AS DOUBLE)) * 1000000 + 0.5001)
             AS BIGINT) AS conversion_rate_ppm,
           CAST(floor((avg(n_events)) * 10000 + 0.5001) AS BIGINT) AS avg_events_e4,
           CAST(floor((avg(dur_sec)) * 10000 + 0.5001) AS BIGINT) AS avg_duration_sec_e4
    FROM per
    """,
    "events",
    "window",
    "agg",
)
def e_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-grain conversion KPIs: share of 30-minute-gap sessions
    containing a purchase, plus mean session size and duration — the
    session-level complement to the user-level funnels
    (e_funnel_conversion / e_funnel_windowed).

    Built on the same session semantics the oracle-verified
    e_session_window established (Spark session_window == SQL
    gaps-and-islands; computed here via the faster `_with_session_no`
    islands helper); duration is exact integer microseconds
    floor-divided to seconds, so every per-session value is an int
    and the final means are engine-exact before the fround.

    Scale: one shuffle on user_id for sessionization, then a
    session-grain aggregate — event volume touches only the map
    side."""
    e = table(spark, sf_dir, "events")
    per = (
        _with_session_no(e.select("user_id", "ts", "event_id", "event_type"))
        .groupBy("user_id", "sno")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("has_p"),
            F.expr(
                "(unix_micros(max(ts)) - unix_micros(min(ts))) div 1000000"
            ).alias("dur_sec"),
        )
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("has_p").alias("n_converting"),
        igrid(
            F.sum("has_p") / F.count(F.lit(1)).cast("double"), 6
        ).alias("conversion_rate_ppm"),
        igrid(F.avg("n_events"), 4).alias("avg_events_e4"),
        igrid(F.avg("dur_sec"), 4).alias("avg_duration_sec_e4"),
    )


@register(
    "e_props_schema_profile",
    """
    WITH keys AS (
      SELECT event_id, unnest(json_keys(props)) AS k
      FROM events WHERE props IS NOT NULL
    ),
    vals AS (
      SELECT k, json_extract_string(e.props, '$.' || k) AS v
      FROM keys JOIN events e USING (event_id)
    ),
    tot AS (SELECT count(*) AS n_events FROM events)
    SELECT k AS key,
           count(*) AS n_present,
           CAST(sum(CASE WHEN TRY_CAST(v AS DOUBLE) IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_numeric,
           CAST(count(DISTINCT v) AS BIGINT) AS n_distinct_values,
           CAST(floor((count(*) / CAST(tot.n_events AS DOUBLE)) * 10000
                + 0.5001) AS BIGINT) AS presence_e4
    FROM vals CROSS JOIN tot
    GROUP BY k, tot.n_events
    ORDER BY k
    """,
    "events",
    "profile",
    "json",
)
def e_props_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured schema discovery over the JSON ``props``
    column: for every key that appears anywhere, how often it is
    present, how often its value parses as a number, and its distinct-
    value cardinality — the profiling pass that decides which event
    properties get promoted to real typed columns.

    Spark shape: json_object_keys + explode (narrow), value re-
    extraction by dynamic path stays codegen'd
    (get_json_object with a concat'd path), one groupBy keyed on the
    key name — cardinality = distinct keys, corpus-independent."""
    e = table(spark, sf_dir, "events")
    nn = e.filter(F.col("props").isNotNull())
    # explode keeps sibling columns — no self-join needed to re-fetch
    # props for the per-key value extraction
    vals = nn.select(
        "props", F.explode(F.json_object_keys("props")).alias("k")
    ).select(
        "k",
        F.expr("get_json_object(props, concat('$.', k))").alias("v"),
    )
    tot = e.agg(F.count(F.lit(1)).alias("n_events"))
    return (
        vals.crossJoin(F.broadcast(tot))
        .groupBy(F.col("k").alias("key"), "n_events")
        .agg(
            F.count(F.lit(1)).alias("n_present"),
            F.sum(
                F.when(F.col("v").try_cast("double").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_numeric"),
            F.count_distinct("v").cast("long").alias("n_distinct_values"),
            igrid(
                F.count(F.lit(1)) / F.col("n_events").cast("double"), 4
            ).alias("presence_e4"),
        )
        .drop("n_events")
        .orderBy("key")
    )


def _with_session_no(e: DataFrame) -> DataFrame:
    """Gaps-and-islands sessionization: adds a per-user session number
    ``sno`` (strict > 30-min gap starts a session — the same
    inclusive-boundary merge semantics e_session_window pins for
    Spark's session_window()).

    Preferred over session_window() on the hot paths: one partitioned
    sort feeds both window phases (lag + running sum), skipping
    session_window's merge machinery — measured ~30% faster at sf0.1 —
    and downstream per-session aggregates leave the map side
    pre-combined, so the (user, session) shuffle moves |sessions|,
    not |events|.  The boundary compare is exact integer
    microseconds, so engine float behavior can never move a
    boundary event across sessions."""
    from pyspark.sql.window import Window as W

    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(F.unix_micros("ts")).over(wo)
    is_new = (
        prev_us.isNull() | (F.unix_micros("ts") - prev_us > 1_800_000_000)
    ).cast("long")
    return e.withColumn("sno", F.sum(is_new).over(wo))


@register(
    "e_concurrent_sessions",
    """
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    s AS (
      SELECT user_id,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_no
             , ts
      FROM ordered
    ),
    iv AS (
      SELECT user_id, session_no,
             min(ts) AS s_start, max(ts) + INTERVAL 30 MINUTE AS s_end
      FROM s GROUP BY user_id, session_no
    ),
    ol AS (
      SELECT a.user_id AS user_a, b.user_id AS user_b
      FROM iv a JOIN iv b
        ON a.user_id < b.user_id
       AND a.s_start < b.s_end AND b.s_start < a.s_end
    )
    SELECT user_a, user_b, count(*) AS n_overlaps
    FROM ol GROUP BY user_a, user_b
    ORDER BY n_overlaps DESC, user_a, user_b
    LIMIT 50
    """,
    "events",
    "join",
    "range",
    "bench",
)
def e_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap (range) join: pairs of users whose 30-minute-
    gap sessions overlap in time, ranked by overlap count — the
    concurrency analysis shape (simultaneous usage, capacity, fraud
    rings), and the canonical range join the brief calls out.

    Spark shape — the SCALABLE range-join plan, not the naive
    inequality join: each session interval is exploded into the hour
    buckets it covers, candidate pairs come from an EQUI join on the
    bucket (co-partitioned, prunable), are deduplicated, and only then
    does the exact overlap predicate run on candidates.  Cost ∝
    overlap density × bucket width, never |sessions|²; the oracle IS
    the naive non-equi join, checkable at test SF.  Bucket width
    trades candidate count vs duplicate factor exactly like LSH band
    width (SCALE.md)."""
    e = table(spark, sf_dir, "events")
    iv = (
        _with_session_no(e.select("user_id", "ts", "event_id"))
        .groupBy("user_id", "sno")
        .agg(
            F.min("ts").alias("s_start"),
            (F.max("ts") + F.expr("INTERVAL 30 MINUTES")).alias("s_end"),
        )
        .drop("sno")
    )
    # microsecond-exact bucketing: unix_timestamp() truncates to whole
    # seconds, which loses sessions whose interval crosses an hour
    # boundary only within the fractional-second tail (every testdata
    # ts carries microseconds) — bucket on unix_micros instead
    bucket = F.explode(
        F.sequence(
            F.floor(F.unix_micros("s_start") / 3_600_000_000),
            # end is exclusive: a session ending exactly on a bucket
            # boundary must not claim the next bucket
            F.floor((F.unix_micros("s_end") - 1) / 3_600_000_000),
        )
    )
    binned = iv.select("user_id", "s_start", "s_end", bucket.alias("b"))
    # Pin the join's parallelism EXPLICITLY (numeric repartition on the
    # join key — AQE never coalesces a user-specified numbered
    # shuffle).  The bucket join is row-EXPLODING (~100× here: 145k
    # binned rows → 14.5M candidates at sf0.1); AQE's coalescing sizes
    # partitions by shuffle INPUT bytes, so it merged this join down
    # to 2 tasks and serialized the candidate generation — measured
    # 2.67 s → 1.92 s best-of-3 at sf0.1 from this line alone
    # (round-6 A/B, SCALE.md).  Same blind spot at any scale: output
    # explosion is invisible to input-sized coalescing.
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    binned = binned.repartition(n_shuffle, "b")
    a = binned.select(
        F.col("user_id").alias("user_a"),
        F.col("s_start").alias("a_start"),
        F.col("s_end").alias("a_end"),
        "b",
    )
    bb = binned.select(
        F.col("user_id").alias("user_b"),
        F.col("s_start").alias("b_start"),
        F.col("s_end").alias("b_end"),
        "b",
    )
    # bucket-ownership dedup: a pair that overlaps meets in EVERY
    # shared bucket, so count it only in the bucket containing the
    # overlap's start (= max of the two session starts — inside both
    # sessions, hence a shared bucket).  A cheap codegen'd filter
    # replaces the distinct() that used to reshuffle the whole
    # candidate set a second time — measured 11.2 s → ~2 s at sf0.1.
    own = F.floor(
        F.unix_micros(F.greatest("a_start", "b_start")) / 3_600_000_000
    )
    pairs = (
        a.join(bb, ["b"])
        .filter(F.col("user_a") < F.col("user_b"))
        .filter(
            (F.col("a_start") < F.col("b_end"))
            & (F.col("b_start") < F.col("a_end"))
        )
        .filter(F.col("b") == own)
        .select("user_a", "user_b")
    )
    return (
        pairs.groupBy("user_a", "user_b")
        .agg(F.count(F.lit(1)).alias("n_overlaps"))
        .orderBy(F.desc("n_overlaps"), "user_a", "user_b")
        .limit(50)
    )


@register(
    "j_scd2_point_lookup",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      FROM events WHERE event_type IN ('signup', 'purchase')
    ),
    clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id, c.ts,
           s.event_type AS state, s.valid_from AS state_since
    FROM clicks c
    LEFT JOIN seq s
      ON s.user_id = c.user_id
     AND s.valid_from <= c.ts
     AND (s.valid_to IS NULL OR c.ts < s.valid_to)
    ORDER BY c.event_id
    """,
    "events",
    "join",
    "scd",
)
def j_scd2_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval temporal lookup: each click enriched with the
    user's SCD2 state (last signup/purchase interval) valid AT the
    click's timestamp — the fact→temporal-dimension join every
    warehouse runs against slowly-changing dims, and the lookup the
    e_scd2_intervals docstring promises.

    Spark shape: NOT the naive range join — the SCD intervals
    partition time per user (lead-built, half-open), so containment
    equals "latest interval starting at-or-before ts", which is
    exactly one backward as-of join (operators/asof.py): a union +
    one window, no inequality join, co-partitioned on user_id.
    Zero-width intervals (two state changes at one instant) can never
    contain a point and are dropped before the as-of so right keys
    stay unique; the oracle is the naive range join, which agrees
    because those intervals match nothing there either."""
    from finance_etl_pipeline_spark.operators.asof import asof_join_backward
    from pyspark.sql import Window as W

    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    scd = (
        e.filter(F.col("event_type").isin("signup", "purchase"))
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
        .filter(
            F.col("valid_to").isNull()
            | (F.col("valid_to") != F.col("valid_from"))
        )
        .withColumn("state_since", F.col("valid_from"))
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    looked = asof_join_backward(
        clicks,
        scd,
        key="user_id",
        left_ts="ts",
        right_ts="valid_from",
        value_cols=["state", "state_since"],
    )
    return looked.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_state").alias("state"),
        F.col("asof_state_since").alias("state_since"),
    ).orderBy("event_id")


_LTV_HALFLIFE_DAYS = 30.0
_LTV_LAMBDA = 0.0231049060186648  # ln(2) / 30 — decay per day


@register(
    "e_user_ltv_decay",
    f"""
    WITH anchor AS (SELECT max(ts) AS now FROM events),
    p AS (
      SELECT user_id, value,
             (epoch_us(a.now) - epoch_us(ts)) / 86400000000.0 AS age_days
      FROM events, anchor a WHERE event_type = 'purchase'
    )
    SELECT user_id,
           count(*) AS n_purchases,
           {sql_igrid('sum(value)', 2)} AS total_value_e2,
           {sql_igrid(f'sum(value * exp(-{_LTV_LAMBDA} * age_days))', 2)}
             AS decayed_value_e2
    FROM p GROUP BY user_id
    ORDER BY user_id
    """,
    "events",
    "agg",
    "bi",
)
def e_user_ltv_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed customer value: each purchase
    weighted by exp(−λ·age) with a 30-day half-life, anchored at the
    corpus's max timestamp — the recency-weighted LTV that feeds churn
    and ranking models (a raw lifetime sum treats a 2-year-old
    purchase like yesterday's).

    Determinism: age is exact integer microseconds divided once;
    λ is one shared literal; both engines' exp agree bit-for-bit on
    this range (empirically, same as the perplexity battery) and the
    cent-grid absorbs summation order.  One map-side-combined groupBy
    on user_id; the anchor is a 1-row broadcast."""
    e = table(spark, sf_dir, "events")
    anchor = e.agg(F.max("ts").alias("now"))
    p = (
        e.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            "value",
            (
                (F.unix_micros("now") - F.unix_micros("ts"))
                / F.lit(86400000000.0)
            ).alias("age_days"),
        )
    )
    return (
        p.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            igrid(F.sum("value"), 2).alias("total_value_e2"),
            igrid(
                F.sum(
                    F.col("value")
                    * F.exp(-F.lit(_LTV_LAMBDA) * F.col("age_days"))
                ),
                2,
            ).alias("decayed_value_e2"),
        )
        .orderBy("user_id")
    )


@register(
    "e_survival_km",
    f"""
    WITH users AS (
      SELECT user_id,
             date_diff('day', CAST(min(ts) AS DATE), CAST(max(ts) AS DATE))
               AS dur,
             max(ts) AS last_ts
      FROM events GROUP BY user_id
    ),
    marked AS (
      SELECT dur,
             CASE WHEN last_ts < max(last_ts) OVER () - INTERVAL 7 DAY
                  THEN 1 ELSE 0 END AS churned
      FROM users
    ),
    grid AS (
      SELECT dur, count(*) AS n_at, sum(churned) AS n_events
      FROM marked GROUP BY dur
    ),
    km AS (
      SELECT dur, n_events,
             sum(n_at) OVER (ORDER BY dur DESC) AS n_risk
      FROM grid
    )
    SELECT dur AS dur_day,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(n_events AS BIGINT) AS n_events,
           {sql_igrid(
               'exp(sum(ln(greatest(1.0 - CAST(n_events AS DOUBLE) / n_risk,'
               ' 1e-300))) OVER (ORDER BY dur))', 6)} AS survival_e6
    FROM km ORDER BY dur_day
    """,
    "events",
    "eval",
)
def e_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier retention curve with right-censoring: a user's
    lifetime is the day span between their first and last event;
    users whose last event falls within 7 days of the corpus end are
    censored (still active — they leave the risk set without counting
    as churn).  S(t) = prod over d ≤ t of (1 − events_d / at-risk_d), the
    standard product-limit estimator, computed as exp of a cumulative
    log-sum so both engines fold it identically (with a 1e-300 floor
    so a fully-churning day yields S = 0, not an engine-specific
    ln(0)).

    Scale: one groupBy(user) pass over events, then all windows run on
    the per-duration grid (≤ observation-window days, ~30 rows) — the
    curve is corpus-size-independent after the first aggregate."""
    e = table(spark, sf_dir, "events")
    users = e.groupBy("user_id").agg(
        F.datediff(
            F.max("ts").cast("date"), F.min("ts").cast("date")
        ).alias("dur"),
        F.max("ts").alias("last_ts"),
    )
    wall = Window.partitionBy()
    marked = users.select(
        "dur",
        F.when(
            F.col("last_ts")
            < F.max("last_ts").over(wall) - F.expr("INTERVAL 7 DAYS"),
            1,
        )
        .otherwise(0)
        .alias("churned"),
    )
    grid = marked.groupBy("dur").agg(
        F.count(F.lit(1)).alias("n_at"),
        F.sum("churned").alias("n_events"),
    )
    w_desc = Window.orderBy(F.desc("dur")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    km = grid.select(
        "dur",
        "n_events",
        F.sum("n_at").over(w_desc).alias("n_risk"),
    )
    w_asc = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    logterm = F.log(
        F.greatest(
            F.lit(1.0) - F.col("n_events").cast("double") / F.col("n_risk"),
            F.lit(1e-300),
        )
    )
    return (
        km.select(
            F.col("dur").cast("long").alias("dur_day"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("n_events").cast("long").alias("n_events"),
            igrid(F.exp(F.sum(logterm).over(w_asc)), 6).alias("survival_e6"),
        )
        .orderBy("dur_day")
    )


@register(
    "e_dau_wau_mau",
    f"""
    WITH presence AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM presence),
    dau AS (SELECT day, count(*) AS dau FROM presence GROUP BY day),
    wau AS (
      SELECT d.day, count(DISTINCT p.user_id) AS wau
      FROM days d JOIN presence p
        ON p.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
      GROUP BY d.day
    ),
    mau AS (
      SELECT d.day, count(DISTINCT p.user_id) AS mau
      FROM days d JOIN presence p
        ON p.day BETWEEN d.day - INTERVAL 29 DAY AND d.day
      GROUP BY d.day
    )
    SELECT dau.day, CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
           CAST(mau AS BIGINT) AS mau,
           {sql_igrid('CAST(dau AS DOUBLE) / mau', 6)} AS stickiness_e6
    FROM dau JOIN wau USING (day) JOIN mau USING (day)
    ORDER BY day
    """,
    "events",
    "agg",
)
def e_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement triad: daily / trailing-7-day / trailing-30-day
    active users per calendar day, plus the DAU/MAU stickiness ratio —
    the growth-dashboard staple.  Exact distinct counts (not HLL — see
    ``a_hll_incremental_uniques`` for the sketch path at extreme
    cardinality).

    Scale: the event stream collapses FIRST to one row per (day, user)
    — everything after runs on presence rows (|users| × |days|), and
    the trailing windows are a bounded range join (≤ 7× / ≤ 30×
    presence), never a scan of raw events per day."""
    e = table(spark, sf_dir, "events")
    presence = e.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    days = presence.select("day").distinct()
    dau = presence.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    p = presence.select(
        F.col("day").alias("pday"), F.col("user_id")
    )
    wau = (
        days.join(
            p,
            (F.col("pday") <= F.col("day"))
            & (F.col("pday") >= F.date_sub(F.col("day"), 6)),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    mau = (
        days.join(
            p,
            (F.col("pday") <= F.col("day"))
            & (F.col("pday") >= F.date_sub(F.col("day"), 29)),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("mau"))
    )
    return (
        dau.join(wau, "day")
        .join(mau, "day")
        .select(
            "day",
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            F.col("mau").cast("long").alias("mau"),
            igrid(F.col("dau").cast("double") / F.col("mau"), 6).alias(
                "stickiness_e6"
            ),
        )
        .orderBy("day")
    )


@register(
    "e_top_paths",
    """
    WITH seq AS (
      SELECT user_id, event_type, ts,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS (
      SELECT event_type || ' > ' || e2 || ' > ' || e3 AS path
      FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    ),
    ranked AS (
      SELECT path, count(*) AS n,
             row_number() OVER (ORDER BY count(*) DESC, path) AS rk
      FROM paths GROUP BY path
    )
    SELECT path, CAST(n AS BIGINT) AS n, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 20 ORDER BY rk
    """,
    "events",
    "window",
)
def e_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step user journeys: sliding event-type trigrams
    per user (lead windows over the per-user timeline, ties broken by
    event_id) ranked by frequency — the path-analysis / Sankey feed
    that generalizes ``e_transition_matrix`` beyond first order.

    Scale: one window pass per user partition (the natural event-log
    distribution), then a count over ≤ |event_types|³ path strings —
    the rank runs on a bounded table."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    paths = seq.select(
        F.concat_ws(" > ", "event_type", "e2", "e3").alias("path")
    )
    counted = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n"))
    wr = Window.orderBy(F.desc("n"), F.col("path"))
    return (
        counted.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 20)
        .select("path", F.col("n").cast("long"), F.col("rk").cast("long"))
        .orderBy("rk")
    )


@register(
    "e_user_lifecycle",
    f"""
    WITH presence AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events
    ),
    maxw AS (SELECT max(wk) AS max_wk FROM presence),
    seq AS (
      SELECT user_id, wk,
             lag(wk)  OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
             lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk,
             min(wk)  OVER (PARTITION BY user_id) AS first_wk
      FROM presence
    ),
    active AS (
      SELECT wk,
             CAST(sum(CASE WHEN wk = first_wk THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
             CAST(sum(CASE WHEN wk != first_wk
                            AND prev_wk = wk - INTERVAL 7 DAY THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
             CAST(sum(CASE WHEN wk != first_wk
                            AND (prev_wk IS NULL OR prev_wk < wk - INTERVAL 7 DAY)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
      FROM seq GROUP BY wk
    ),
    churn AS (
      SELECT CAST(s.wk + INTERVAL 7 DAY AS DATE) AS wk, count(*) AS n_churned
      FROM seq s CROSS JOIN maxw
      WHERE (s.next_wk IS NULL OR s.next_wk > s.wk + INTERVAL 7 DAY)
        AND CAST(s.wk + INTERVAL 7 DAY AS DATE) <= maxw.max_wk
      GROUP BY 1
    )
    SELECT a.wk, a.n_new, a.n_retained, a.n_resurrected,
           coalesce(c.n_churned, 0) AS n_churned,
           CASE WHEN coalesce(c.n_churned, 0) > 0
                THEN {sql_igrid('CAST(a.n_new + a.n_resurrected AS DOUBLE) / c.n_churned', 4)}
           END AS quick_ratio_e4
    FROM active a LEFT JOIN churn c ON a.wk = c.wk
    ORDER BY a.wk
    """,
    "events",
    "window",
    "agg",
)
def e_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting: every active user classified as
    new (first-ever week), retained (also active the prior week), or
    resurrected (returning after a gap); churned counts users active
    the prior week who did not return (attributed to the week they
    went missing, clipped at the dataset's final observed week so the
    open end never fabricates churn).  The quick ratio
    (new + resurrected) / churned is the canonical growth-health
    readout.

    Scale: the event stream collapses FIRST to one (user, week)
    presence row; the lag/lead/min windows run per user on that
    reduced table (natural user_id distribution, no skew), and the
    final tables are |weeks| rows."""
    e = table(spark, sf_dir, "events")
    presence = e.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    ).distinct()
    uw = Window.partitionBy("user_id").orderBy("wk")
    seq = presence.select(
        "user_id",
        "wk",
        F.lag("wk").over(uw).alias("prev_wk"),
        F.lead("wk").over(uw).alias("next_wk"),
        F.min("wk").over(Window.partitionBy("user_id")).alias("first_wk"),
    )
    is_new = F.col("wk") == F.col("first_wk")
    active = seq.groupBy("wk").agg(
        F.sum(F.when(is_new, 1).otherwise(0)).alias("n_new"),
        F.sum(
            F.when(
                (~is_new) & (F.col("prev_wk") == F.date_add(F.col("wk"), -7)),
                1,
            ).otherwise(0)
        ).alias("n_retained"),
        F.sum(
            F.when(
                (~is_new)
                & (
                    F.col("prev_wk").isNull()
                    | (F.col("prev_wk") < F.date_add(F.col("wk"), -7))
                ),
                1,
            ).otherwise(0)
        ).alias("n_resurrected"),
    )
    maxw = presence.agg(F.max("wk").alias("max_wk"))
    churn = (
        seq.crossJoin(F.broadcast(maxw))
        .filter(
            (
                F.col("next_wk").isNull()
                | (F.col("next_wk") > F.date_add(F.col("wk"), 7))
            )
            & (F.date_add(F.col("wk"), 7) <= F.col("max_wk"))
        )
        .groupBy(F.date_add("wk", 7).alias("wk"))
        .agg(F.count(F.lit(1)).alias("n_churned"))
    )
    qr = F.when(
        F.coalesce("n_churned", F.lit(0)) > 0,
        igrid(
            (F.col("n_new") + F.col("n_resurrected")).cast("double")
            / F.col("n_churned"),
            4,
        ),
    )
    return (
        active.join(churn, "wk", "left")
        .select(
            "wk",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce("n_churned", F.lit(0).cast("long")).alias("n_churned"),
            qr.alias("quick_ratio_e4"),
        )
        .orderBy("wk")
    )


@register(
    "e_seasonal_decompose",
    f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n
      FROM events GROUP BY 1
    ),
    trend AS (
      SELECT day, n,
             sum(n) OVER w AS s7,
             count(*) OVER w AS w7
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    ratios AS (
      SELECT isodow(day) AS dow,
             {sql_igrid('n * 7.0 / s7', 6)} AS ratio_e6
      FROM trend WHERE w7 = 7
    )
    SELECT CAST(dow AS INTEGER) AS dow,
           count(*) AS n_days,
           {sql_igrid('sum(ratio_e6) / count(*) / 1000000.0', 6)}
             AS seasonal_index_e6
    FROM ratios GROUP BY dow ORDER BY dow
    """,
    "events",
    "window",
    "timeseries",
)
def e_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition, the day-of-week component:
    daily event counts de-trended by a centered 7-day moving average
    (full windows only — edges carry no trend estimate), then the
    detrended ratios averaged per ISO weekday into a seasonal index
    (1.0 = neutral; >1 = the weekday runs hot).  The additive
    residual/trend split every ops-forecasting pipeline starts from
    (e_anomaly_dow_adjusted consumes exactly this structure).

    Determinism: each day's ratio is gridded to e6 BEFORE the per-dow
    average, which then divides an exact integer sum — no float
    accumulation order anywhere in the output path.

    Scale: events collapse to |days| rows first; the moving-average
    window is a single ordered pass over that tiny series."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("day").rowsBetween(-3, 3)
    trend = daily.select(
        "day",
        "n",
        F.sum("n").over(w).alias("s7"),
        F.count(F.lit(1)).over(w).alias("w7"),
    )
    ratios = trend.filter(F.col("w7") == 7).select(
        (F.weekday("day") + 1).alias("dow"),
        igrid(F.col("n") * 7.0 / F.col("s7"), 6).alias("ratio_e6"),
    )
    return (
        ratios.groupBy("dow")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            igrid(
                F.sum("ratio_e6") / F.count(F.lit(1)) / 1000000.0, 6
            ).alias("seasonal_index_e6"),
        )
        .select(F.col("dow").cast("int").alias("dow"), "n_days", "seasonal_index_e6")
        .orderBy("dow")
    )


@register(
    "e_cumulative_unique_users",
    """
    WITH firsts AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY user_id
    ),
    daily_new AS (
      SELECT first_day AS day, count(*) AS n_new FROM firsts GROUP BY first_day
    )
    SELECT day, CAST(n_new AS BIGINT) AS n_new,
           CAST(sum(n_new) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_unique_users
    FROM daily_new ORDER BY day
    """,
    "events",
    "window",
    "agg",
)
def e_cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative unique-user acquisition curve: per day, first-time
    users and the running total of everyone ever seen — the top line
    of any growth chart.  Computed via first-seen dates (one groupBy
    per user, then a |days|-row cumulative window), NEVER a
    count(DISTINCT) per day over expanding windows — the latter
    rescans the event prefix per day and is quadratic at scale, while
    first-seen is one linear pass (same trick a_hll_incremental_uniques
    uses for the sketched variant)."""
    e = table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    daily_new = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily_new.select(
        "day",
        F.col("n_new").cast("long").alias("n_new"),
        F.sum("n_new").over(w).cast("long").alias("cum_unique_users"),
    ).orderBy("day")


@register(
    "e_markov_prediction_accuracy",
    f"""
    WITH seq AS (
      SELECT user_id, event_type AS prev,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    pairs AS (SELECT prev, nxt FROM seq WHERE nxt IS NOT NULL),
    counts AS (SELECT prev, nxt, count(*) AS n FROM pairs GROUP BY prev, nxt),
    pred AS (
      SELECT prev, nxt AS predicted FROM (
        SELECT prev, nxt,
               row_number() OVER (PARTITION BY prev
                                  ORDER BY n DESC, nxt) AS rk
        FROM counts
      ) WHERE rk = 1
    )
    SELECT p.prev AS prev_event,
           max(pr.predicted) AS predicted_next,
           count(*) AS n_transitions,
           CAST(sum(CASE WHEN p.nxt = pr.predicted THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           {sql_igrid(
               'sum(CASE WHEN p.nxt = pr.predicted THEN 1 ELSE 0 END)'
               ' / CAST(count(*) AS DOUBLE)', 6)} AS accuracy_e6
    FROM pairs p JOIN pred pr ON p.prev = pr.prev
    GROUP BY p.prev ORDER BY prev_event
    """,
    "events",
    "window",
    "eval",
)
def e_markov_prediction_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov next-event prediction accuracy: for each
    event type, the modal next type (ties break lexicographically —
    deterministic) and the fraction of transitions that prediction
    gets right — the baseline every sequence model must beat, and the
    eval loop over ``e_transition_matrix``'s structure.

    Scale: the per-user lead window runs on the natural user_id
    distribution; everything after is |event_types|²-bounded, and the
    scoring join broadcasts the ≤|types| prediction table."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("prev"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    counts = seq.groupBy("prev", "nxt").agg(F.count(F.lit(1)).alias("n"))
    wr = Window.partitionBy("prev").orderBy(F.desc("n"), "nxt")
    pred = (
        counts.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select("prev", F.col("nxt").alias("predicted"))
    )
    correct = F.sum(
        F.when(F.col("nxt") == F.col("predicted"), 1).otherwise(0)
    )
    return (
        seq.join(F.broadcast(pred), "prev")
        .groupBy(F.col("prev").alias("prev_event"))
        .agg(
            F.max("predicted").alias("predicted_next"),
            F.count(F.lit(1)).alias("n_transitions"),
            correct.cast("long").alias("n_correct"),
            igrid(
                correct / F.count(F.lit(1)).cast("double"), 6
            ).alias("accuracy_e6"),
        )
        .orderBy("prev_event")
    )


@register(
    "e_changepoint_cusum",
    f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n
      FROM events GROUP BY 1
    ),
    stats AS (SELECT sum(n) AS tot, count(*) AS days FROM daily),
    dev AS (
      SELECT day, n,
             sum(n) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
               - (row_number() OVER (ORDER BY day))
                 * (CAST(tot AS DOUBLE) / days) AS cusum
      FROM daily CROSS JOIN stats
    )
    SELECT day, CAST(n AS BIGINT) AS n,
           {sql_igrid('cusum', 2)} AS cusum_e2,
           CAST(abs({sql_igrid('cusum', 2)}) = (SELECT max(abs({sql_igrid('cusum', 2)}))
                FROM dev) AS INTEGER) AS is_changepoint
    FROM dev ORDER BY day
    """,
    "events",
    "window",
    "timeseries",
)
def e_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint screen over the daily event-count series:
    the running sum of deviations from the global mean; the day where
    |CUSUM| peaks is the classic single-changepoint estimate (Page
    1954 / binary-segmentation step 1).  Emitted per day so the full
    curve is auditable, with the argmax day flagged.

    Determinism: deviations divide exact integer totals; the flag
    compares e2-gridded values so the argmax is grid-exact in both
    engines.

    Scale: events collapse to |days| rows first; one ordered pass."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = daily.agg(
        F.sum("n").alias("tot"), F.count(F.lit(1)).alias("days")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rn = F.row_number().over(Window.orderBy("day"))
    dev = daily.crossJoin(F.broadcast(stats)).select(
        "day",
        "n",
        (
            F.sum("n").over(w)
            - rn * (F.col("tot").cast("double") / F.col("days"))
        ).alias("cusum"),
    )
    cusum_e2 = igrid(F.col("cusum"), 2)
    mx = dev.agg(
        F.max(F.abs(igrid(F.col("cusum"), 2))).alias("mx")
    )
    return (
        dev.crossJoin(F.broadcast(mx))
        .select(
            "day",
            F.col("n").cast("long").alias("n"),
            cusum_e2.alias("cusum_e2"),
            (F.abs(cusum_e2) == F.col("mx")).cast("int").alias(
                "is_changepoint"
            ),
        )
        .orderBy("day")
    )


@register(
    "w_rolling_median",
    f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n
      FROM events GROUP BY 1
    )
    SELECT day, CAST(n AS BIGINT) AS n,
           {sql_igrid('''quantile_cont(n, 0.5) OVER (ORDER BY day
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)''', 2)}
             AS rolling_median_e2
    FROM daily ORDER BY day
    """,
    "events",
    "window",
    "robust",
)
def w_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centered 7-day rolling MEDIAN of the daily event count — the
    robust smoother (one outlier day cannot move it, unlike the
    moving average trend in e_seasonal_decompose).  Exact percentile
    as a framed window aggregate in both engines; edges shrink the
    frame symmetrically rather than emitting nulls."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("day").rowsBetween(-3, 3)
    return daily.select(
        "day",
        F.col("n").cast("long").alias("n"),
        igrid(F.expr("percentile(n, 0.5)").over(w), 2).alias(
            "rolling_median_e2"
        ),
    ).orderBy("day")


@register(
    "e_bot_detection",
    f"""
    WITH seq AS (
      SELECT user_id, event_type, ts,
             epoch_us(ts) // 1000000
               - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)) // 1000000
               AS gap_s
      FROM events
    ),
    per_user AS (
      SELECT user_id,
             count(*) AS n_events,
             count(DISTINCT event_type) AS n_types,
             count(DISTINCT CAST(ts AS DATE)) AS n_days,
             {sql_igrid('stddev_samp(gap_s)', 2)} AS gap_sd_e2,
             {sql_igrid('count(*) / CAST(count(DISTINCT CAST(ts AS DATE)) AS DOUBLE)', 2)}
               AS events_per_day_e2
      FROM seq GROUP BY user_id
    )
    SELECT user_id, n_events, CAST(n_types AS BIGINT) AS n_types,
           CAST(n_days AS BIGINT) AS n_days,
           gap_sd_e2, events_per_day_e2,
           CAST(n_events >= 50
                AND (events_per_day_e2 >= 2000
                     OR (gap_sd_e2 IS NOT NULL AND gap_sd_e2 <= 100)
                     OR n_types = 1) AS INTEGER) AS is_bot_suspect
    FROM per_user
    ORDER BY user_id
    """,
    "events",
    "quality",
    "agg",
)
def e_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic bot/abuse screen per user: volume (events/active
    day), inter-event regularity (a near-zero gap stddev means
    machine-timed requests), and behavioral diversity (single-type
    streams), combined into a suspect flag — the traffic-quality gate
    run before events feed training or billing.  All rule inputs are
    integer-gridded, so the FLAG itself is grid-exact cross-engine.

    Scale: one lag window on the natural user_id distribution, one
    per-user aggregate — no cross-user shuffle beyond the groupBy."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_sec = F.expr("unix_micros(ts) div 1000000")
    seq = e.select(
        "user_id",
        "event_type",
        "ts",
        (ts_sec - F.lag(ts_sec).over(w)).alias("gap_s"),
    )
    per_user = seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
        F.countDistinct(F.col("ts").cast("date")).cast("long").alias("n_days"),
        igrid(F.stddev_samp("gap_s"), 2).alias("gap_sd_e2"),
        igrid(
            F.count(F.lit(1))
            / F.countDistinct(F.col("ts").cast("date")).cast("double"),
            2,
        ).alias("events_per_day_e2"),
    )
    flag = (
        (F.col("n_events") >= 50)
        & (
            (F.col("events_per_day_e2") >= 2000)
            | (F.col("gap_sd_e2").isNotNull() & (F.col("gap_sd_e2") <= 100))
            | (F.col("n_types") == 1)
        )
    )
    return per_user.withColumn(
        "is_bot_suspect", flag.cast("int")
    ).orderBy("user_id")


@register(
    "e_ab_test_analysis",
    """
    WITH assign AS (
      SELECT user_id,
             CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || '#ab'), 1, 15)) AS BIGINT) % 2 = 0
                  THEN 'A' ELSE 'B' END AS arm,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT arm, count(*) AS n, CAST(sum(converted) AS BIGINT) AS conv
      FROM assign GROUP BY arm
    ),
    wide AS (
      SELECT max(CASE WHEN arm = 'A' THEN n END) AS na,
             max(CASE WHEN arm = 'A' THEN conv END) AS ca,
             max(CASE WHEN arm = 'B' THEN n END) AS nb,
             max(CASE WHEN arm = 'B' THEN conv END) AS cb
      FROM arms
    )
    SELECT CAST(na AS BIGINT) AS n_a, ca AS conv_a,
           CAST(nb AS BIGINT) AS n_b, cb AS conv_b,
           CAST(floor(CAST(ca AS DOUBLE) / na * 1000000 + 0.5001) AS BIGINT) AS rate_a_e6,
           CAST(floor(CAST(cb AS DOUBLE) / nb * 1000000 + 0.5001) AS BIGINT) AS rate_b_e6,
           CAST(floor(
             (CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
             / nullif(sqrt((CAST(ca + cb AS DOUBLE) / (na + nb))
                    * (1 - CAST(ca + cb AS DOUBLE) / (na + nb))
                    * (1.0 / na + 1.0 / nb)), 0.0)
             * 10000 + 0.5001) AS BIGINT) AS zstat_e4,
           CAST(abs((CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
             / nullif(sqrt((CAST(ca + cb AS DOUBLE) / (na + nb))
                    * (1 - CAST(ca + cb AS DOUBLE) / (na + nb))
                    * (1.0 / na + 1.0 / nb)), 0.0)) > 1.96 AS INTEGER)
             AS significant_95
    FROM wide
    """,
    "events",
    "eval",
    "agg",
)
def e_ab_test_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on a hash-assigned A/B split: users land
    in arms by content hash (the '#ab' salt decorrelates from every
    other split), conversion is any purchase, and the pooled z
    statistic + 95% significance flag come out as grid integers —
    the experimentation readout, with the split itself reproducible
    across engines and reruns (the property product experimentation
    platforms get from bucketing hashes).

    Scale: one per-user aggregate (user_id-keyed), a 2-row arm table,
    one scalar expression."""
    e = table(spark, sf_dir, "events")
    from finance_etl_pipeline_spark.operators.dedup import hash60_expr

    arm = F.when(
        hash60_expr(F.concat(F.col("user_id").cast("string"), F.lit("#ab")))
        % 2
        == 0,
        "A",
    ).otherwise("B")
    assign = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).withColumn("arm", arm)
    arms = assign.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("converted").cast("long").alias("conv"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("arm") == "A", F.col("conv"))).alias("ca"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("arm") == "B", F.col("conv"))).alias("cb"),
    )
    ra = F.col("ca").cast("double") / F.col("na")
    rb = F.col("cb").cast("double") / F.col("nb")
    pooled = (F.col("ca") + F.col("cb")).cast("double") / (
        F.col("na") + F.col("nb")
    )
    # nullif'd denominator: with pooled conversion at exactly 0 or 1
    # the pooled variance is 0 and the z statistic is undefined — NULL
    # in both engines.  Also what keeps the query ANSI-safe: the
    # grading driver runs a plain session where double/0.0 is a
    # DIVIDE_BY_ZERO error, not IEEE Inf (caught by
    # tools/plain_session_sweep.py at sf0.01, where every user in both
    # arms converts).
    z = (ra - rb) / F.nullif(
        F.sqrt(
            pooled * (1 - pooled) * (1.0 / F.col("na") + 1.0 / F.col("nb"))
        ),
        F.lit(0.0),
    )
    return wide.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("ca").alias("conv_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.col("cb").alias("conv_b"),
        igrid(ra, 6).alias("rate_a_e6"),
        igrid(rb, 6).alias("rate_b_e6"),
        igrid(z, 4).alias("zstat_e4"),
        (F.abs(z) > 1.96).cast("int").alias("significant_95"),
    )


@register(
    "e_bounce_rate_daily",
    """
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_no
      FROM ordered
    ),
    per_session AS (
      SELECT user_id, session_no,
             CAST(min(ts) AS DATE) AS day,
             count(*) AS n_events
      FROM sessions GROUP BY user_id, session_no
    )
    SELECT day,
           count(*) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           CAST(floor(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE) * 1000000 + 0.5001) AS BIGINT)
             AS bounce_rate_e6
    FROM per_session GROUP BY day ORDER BY day
    """,
    "events",
    "window",
    "agg",
)
def e_bounce_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: share of 30-minute-gap sessions containing
    exactly one event, attributed to the session's start day — the
    engagement-quality counterpart of the session volume metrics
    (same session definition as e_session_window, so the two
    reconcile).  Session assembly reuses the verified
    gaps-and-islands construction; the daily rollup is |days| rows."""
    e = table(spark, sf_dir, "events")
    sessions = (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("date").alias("day"), "n_events"
        )
    )
    bounce = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return (
        sessions.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            bounce.cast("long").alias("n_bounces"),
            igrid(
                bounce / F.count(F.lit(1)).cast("double"), 6
            ).alias("bounce_rate_e6"),
        )
        .orderBy("day")
    )


@register(
    "e_cohort_ltv_curve",
    """
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_wk
      FROM events GROUP BY user_id
    ),
    purchases AS (
      SELECT e.user_id, f.cohort_wk,
             CAST(date_diff('week',
                  CAST(f.cohort_wk AS TIMESTAMP),
                  date_trunc('week', e.ts)) AS INTEGER) AS age_wk,
             CAST(floor(e.value * 100 + 0.5001) AS BIGINT) AS rev_e2
      FROM events e JOIN firsts f ON e.user_id = f.user_id
      WHERE e.event_type = 'purchase'
    ),
    sizes AS (SELECT cohort_wk, count(*) AS cohort_users FROM firsts GROUP BY cohort_wk),
    cell AS (
      SELECT cohort_wk, age_wk, sum(rev_e2) AS wk_rev_e2
      FROM purchases GROUP BY cohort_wk, age_wk
    )
    SELECT c.cohort_wk, c.age_wk,
           CAST(s.cohort_users AS BIGINT) AS cohort_users,
           CAST(sum(c.wk_rev_e2) OVER (PARTITION BY c.cohort_wk ORDER BY c.age_wk
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_rev_e2,
           CAST(floor(sum(c.wk_rev_e2) OVER (PARTITION BY c.cohort_wk ORDER BY c.age_wk
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                / CAST(s.cohort_users AS DOUBLE) + 0.5001) AS BIGINT)
             AS cum_ltv_per_user_e2
    FROM cell c JOIN sizes s ON c.cohort_wk = s.cohort_wk
    ORDER BY c.cohort_wk, c.age_wk
    """,
    "events",
    "window",
    "bi",
)
def e_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative LTV curve per signup cohort: purchase revenue
    accumulated by cohort age (weeks since the user's first-ever
    week), normalized per cohort user — the payback-period chart that
    answers 'how many weeks until a cohort earns X', complementing
    the retention matrix (users) with value.  Exact cent units end to
    end; the per-user division happens once on exact integers.

    Scale: first-week per user (one groupBy), purchases tagged by a
    broadcastable cohort map, (cohort × age) cells, then a cumulative
    window over |cohorts × ages| rows."""
    e = table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_wk")
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .select(
            "cohort_wk",
            (
                F.datediff(
                    F.date_trunc("week", "ts").cast("date"), F.col("cohort_wk")
                )
                / 7
            ).cast("int").alias("age_wk"),
            igrid("value", 2).alias("rev_e2"),
        )
    )
    sizes = firsts.groupBy("cohort_wk").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    cell = purchases.groupBy("cohort_wk", "age_wk").agg(
        F.sum("rev_e2").alias("wk_rev_e2")
    )
    wc = (
        Window.partitionBy("cohort_wk")
        .orderBy("age_wk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("wk_rev_e2").over(wc)
    return (
        cell.join(F.broadcast(sizes), "cohort_wk")
        .select(
            "cohort_wk",
            "age_wk",
            F.col("cohort_users").cast("long").alias("cohort_users"),
            cum.cast("long").alias("cum_rev_e2"),
            F.floor(cum / F.col("cohort_users").cast("double") + 0.5001)
            .cast("long")
            .alias("cum_ltv_per_user_e2"),
        )
        .orderBy("cohort_wk", "age_wk")
    )


@register(
    "e_activity_heatmap",
    """
    SELECT CAST(isodow(ts) AS INTEGER) AS iso_dow,
           CAST(hour(ts) AS INTEGER) AS hour,
           count(*) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1, 2
    ORDER BY iso_dow, hour
    """,
    "events",
    "agg",
)
def e_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday × hour activity heatmap (events and distinct users per
    cell) — the 7×24 capacity-planning grid behind shift staffing and
    maintenance-window choices.  One map-side-combined aggregate over
    a bounded 168-cell key space."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            (F.weekday("ts") + 1).cast("int").alias("iso_dow"),
            F.hour("ts").cast("int").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy("iso_dow", "hour")
    )


@register(
    "e_props_variant_stats",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN TRY_CAST(json_extract(props, '$.k') AS BIGINT)
                         IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_with_k,
           CAST(sum(TRY_CAST(json_extract(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           min(TRY_CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
           max(TRY_CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
    "events",
    "json",
    "variant",
)
def e_props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured aggregation through Spark 4's VARIANT type:
    ``parse_json`` shreds the ``props`` JSON once into the binary
    variant encoding, ``try_variant_get`` extracts the typed field —
    the modern replacement for per-access ``get_json_object`` string
    re-parsing (one parse per row instead of one per extraction, and
    the encoding is columnar-shreddable at the storage layer).

    Same aggregate as the oracle's json_extract path: missing keys and
    non-numeric payloads yield NULL (try_ semantics) in both engines.

    Scale: parse + extract are narrow per-row ops inside codegen; the
    aggregate is |event types| groups.  At 100 TB the variant column
    would be materialized once at ingest (parquet variant shredding)
    rather than re-parsed per query — this query is the read shape
    either way."""
    e = table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.when(F.col("k").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_with_k"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "e_cep_funnel_patterns",
    """
    WITH seq AS (
      SELECT user_id,
             list_reduce(
               list_prepend(0, list(
                 CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                      WHEN 'purchase' THEN 3 WHEN 'error' THEN 9
                      ELSE 0 END ORDER BY ts, event_id)),
               (acc, x) -> CASE
                 WHEN x = 1 AND acc % 10 = 0 THEN acc + 1
                 WHEN x = 2 AND acc % 10 = 1 THEN acc + 1
                 WHEN x = 3 AND acc % 10 = 2 THEN acc + 8
                 WHEN x = 9 THEN acc - (acc % 10)
                 ELSE acc END) AS m
      FROM events GROUP BY user_id
    )
    SELECT CAST(m // 10 AS BIGINT) AS completed_patterns,
           CAST(count(*) AS BIGINT) AS n_users
    FROM seq GROUP BY 1 ORDER BY 1
    """,
    "events",
    "cep",
    "hof",
    "bench",
)
def e_cep_funnel_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern matching without
    MATCH_RECOGNIZE: count non-overlapping completions of the pattern
    "view, then click, then purchase — reset on any error between" in
    each user's event-time-ordered stream, as a deterministic
    state-machine fold (higher-order ``aggregate``) over the per-user
    sequence.  The fold encodes (completions × 10 + state) in one
    integer, so both engines run the identical transition table —
    the general recipe for regex-over-events questions Spark has no
    native operator for (other events are no-ops; an error retracts
    only the in-flight partial match, not completed ones).

    Scale: one groupBy(user) with an ordered collect — per-entity CEP
    always keys state by entity, and the array is bounded by that
    user's history (the same contract as ``e_top_paths``); the fold
    itself is codegen over the array, and the final histogram is
    |distinct completion counts| rows.  For entities whose history
    cannot sit in one task, pre-filter to the pattern's alphabet
    (view/click/purchase/error) before collecting — at typical event
    mixes that alone cuts the array several-fold."""
    e = table(spark, sf_dir, "events")
    code = (
        F.when(F.col("event_type") == "view", 1)
        .when(F.col("event_type") == "click", 2)
        .when(F.col("event_type") == "purchase", 3)
        .when(F.col("event_type") == "error", 9)
        .otherwise(0)
    )
    # alphabet pre-filter INSIDE the aggregate: non-alphabet events
    # fold as no-ops (code 0 matches no transition), so collecting
    # them only inflates the shuffled arrays.  collect_list skips
    # NULLs, and its partial (map-side) aggregate drops them before
    # the exchange — every user still gets a row (the groupBy sees
    # all events), so the completed=0 bucket is unchanged.  This is
    # the docstring's "pre-filter to the pattern's alphabet" advice,
    # done without a second pass over events.
    per_user = (
        e.select(
            "user_id",
            F.when(
                code != 0,
                F.struct(F.col("ts"), F.col("event_id"), code.alias("c")),
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("s")).alias("arr"))
    )
    codes = F.transform(F.col("arr"), lambda s: s["c"])
    m = F.aggregate(
        codes,
        F.lit(0),
        lambda acc, x: (
            F.when((x == 1) & (acc % 10 == 0), acc + 1)
            .when((x == 2) & (acc % 10 == 1), acc + 1)
            .when((x == 3) & (acc % 10 == 2), acc + 8)
            .when(x == 9, acc - (acc % 10))
            .otherwise(acc)
        ),
    )
    return (
        per_user.select(m.alias("m"))
        .select(F.expr("m div 10").cast("long").alias("completed_patterns"))
        .groupBy("completed_patterns")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("completed_patterns")
    )


@register(
    "e_activity_streaks",
    """
    WITH d AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    r AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (PARTITION BY user_id
                                           ORDER BY day) AS INTEGER)
               AS anchor
      FROM d
    ),
    runs AS (
      SELECT user_id, anchor, count(*) AS len FROM r
      GROUP BY user_id, anchor
    ),
    best AS (SELECT user_id, max(len) AS streak FROM runs GROUP BY user_id)
    SELECT CAST(streak AS BIGINT) AS streak_days,
           CAST(count(*) AS BIGINT) AS n_users
    FROM best GROUP BY streak ORDER BY streak_days
    """,
    "events",
    "window",
)
def e_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user, rolled up to
    a streak-length histogram — the engagement metric behind every
    habit/retention dashboard (and the canonical gaps-and-islands
    interview question, here in its distributed form).  The island
    anchor is ``day − row_number`` (constant within a consecutive
    run), so streaks fall out of two integer groupBys.

    Scale: the distinct (user, day) grid is the only fact-sized
    shuffle; the window partitions by user (bounded by that user's
    active days), and everything after is |users| rows then
    |distinct streak lengths| rows."""
    e = table(spark, sf_dir, "events")
    d = e.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy("day")
    )
    r = d.select(
        "user_id", "day", F.date_sub(F.col("day"), rn).alias("anchor")
    )
    runs = r.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len")
    )
    best = runs.groupBy("user_id").agg(F.max("len").alias("streak"))
    return (
        best.groupBy(F.col("streak").cast("long").alias("streak_days"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("streak_days")
    )
