"""Structured Streaming wrappers over the batch event analytics.

Posture (SURVEY.md §7.5): the reference is pure batch, so streaming is
an additive surface — the SAME window expressions used by the batch
plans (plans/events.py, oracle-verified there) wrapped in readStream /
withWatermark / writeStream. Semantics parity between the two modes is
what tests/test_streaming.py asserts (availableNow drain == batch).

Scale notes: watermarks bound state (late events beyond the watermark
are dropped); ``maxFilesPerTrigger`` paces backfills; checkpointing
(not exercised in tests) goes to the lake, one dir per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_etl_pipeline_spark import schemas
from finance_etl_pipeline_spark.functions.scalars import igrid


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of events parquet.

    Streams require a declared schema, but the events files differ by
    environment (TIMESTAMP(NANOS) vs plain micro-second timestamps), so
    the actual ``ts`` type is probed with a footer-only batch read and
    the declared schema + normalization mirror sources/readers.py:
    nanos-long → exact ``div`` truncation to micros; TIMESTAMP_NTZ →
    identity cast into the session-zone TIMESTAMP (UTC session)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampNTZType,
    )

    from pyspark.errors import AnalysisException

    try:
        ts_type = spark.read.parquet(path).schema["ts"].dataType
    except AnalysisException:
        # a file-source stream may legitimately start on an empty/
        # not-yet-created directory (files arrive later); the probe
        # read cannot infer a schema then, so fall back to the
        # nanos-long layout the testdata events files use — the
        # normalization below handles either probed or assumed type
        ts_type = LongType()
    stream_schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            schemas.EVENTS["event_type"],
            schemas.EVENTS["value"],
            schemas.EVENTS["props"],
        ]
    )
    reader = spark.readStream.schema(stream_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    if isinstance(ts_type, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of plans/events.py::e_tumbling_window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
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
    )


def session_aggregates(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of plans/events.py::e_session_window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
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
    )


def click_purchase_stream_join(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of plans/events.py::e_click_purchase_attribution
    — a stream-stream inner join (clicks × purchases of the same user
    within 30 minutes).  Both sides carry a watermark and the join
    condition bounds event time in both directions, which is what lets
    Spark expire join state: a click older than watermark + 30 min can
    never match a future purchase and is dropped from state."""
    c = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value"),
    ).withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
        ),
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        F.expr(
            "(unix_micros(purchase_ts) - unix_micros(click_ts)) div 1000000"
        ).alias("delay_sec"),
        igrid(F.col("value"), 2).alias("purchase_value_e2"),
    )


def click_purchase_stream_left_join(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """LEFT OUTER variant of ``click_purchase_stream_join``: every
    click emits exactly one of (a) an attributed row per matching
    purchase as matches arrive, or (b) one NULL-purchase row once the
    watermark proves no purchase within 30 minutes can still arrive —
    the unconverted-click feed (abandonment alerting, negative
    training labels) that the inner join silently drops.

    Spark only admits an outer stream-stream join when state is
    provably expirable: both sides are watermarked and the join
    condition bounds purchase_ts to [click_ts, click_ts + 30 min], so
    a click's outer row can be emitted (and its state dropped) as
    soon as the watermark passes click_ts + 30 min.  Outer rows
    therefore trail the data by watermark delay + 30 min — under
    availableNow the final watermark position decides which trailing
    clicks get their NULL row (the parity test pushes the watermark
    past everything with a sentinel; a live deployment just keeps
    running).  Batch twin for parity: the same predicate as a batch
    left join."""
    c = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value"),
    ).withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
        ),
        "left_outer",
    ).select(
        "click_id",
        "user_id",
        "purchase_id",
        F.expr(
            "(unix_micros(purchase_ts) - unix_micros(click_ts)) div 1000000"
        ).alias("delay_sec"),
        igrid(F.col("value"), 2).alias("purchase_value_e2"),
        F.col("purchase_id").isNotNull().alias("converted"),
    )


def click_purchase_stream_full_join(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """FULL OUTER variant of the click→purchase interval join — the
    complete attribution matrix in one stream: matched rows as they
    arrive, one NULL-purchase row per unconverted click (as in the
    LEFT join), AND one NULL-click row per purchase with no click in
    the preceding 30 minutes — the "dark conversion" feed (direct /
    untracked-channel purchases) that both the inner and left joins
    drop.

    Expirability is symmetric: the condition that bounds purchase_ts
    to [click_ts, click_ts + 30 min] equally bounds click_ts to
    [purchase_ts − 30 min, purchase_ts], so with both sides
    watermarked Spark can emit either side's outer row (and drop its
    state) once the watermark clears its 30-minute horizon.  Same
    trailing-emission semantics as the LEFT variant: under
    availableNow the final watermark decides which trailing rows get
    their NULL twin; a live deployment just keeps running.  Batch
    twin for parity: the identical predicate as a batch full join."""
    c = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value"),
    ).withWatermark("purchase_ts", watermark)
    j = c.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
        ),
        "full_outer",
    )
    return j.select(
        "click_id",
        "purchase_id",
        F.coalesce(F.col("user_id"), F.col("p_user")).alias("user_key"),
        F.expr(
            "(unix_micros(purchase_ts) - unix_micros(click_ts)) div 1000000"
        ).alias("delay_sec"),
        igrid(F.col("value"), 2).alias("purchase_value_e2"),
        F.when(
            F.col("click_id").isNotNull() & F.col("purchase_id").isNotNull(),
            "matched",
        )
        .when(F.col("click_id").isNotNull(), "click_only")
        .otherwise("purchase_only")
        .alias("match_kind"),
    )


def dedup_within_watermark(
    events: DataFrame, watermark: str = "35 days"
) -> DataFrame:
    """Streaming exact-dedup twin of the batch dd_exact_dedup family:
    keep the first arrival per event_id, with state bounded by the
    watermark (a duplicate arriving later than the watermark delay is
    not caught — that is the documented contract of
    dropDuplicatesWithinWatermark; size the delay to the source's real
    duplication window, here ≥ the 30-day fixture span so the drain is
    exhaustive)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def drain_to_memory(
    stream: DataFrame, name: str, spark: SparkSession, mode: str = "complete"
) -> DataFrame:
    """Run the stream to completion over existing files (availableNow)
    and return the materialized result — the test/backfill harness.
    Aggregations drain in ``complete`` mode; joins and dedup are
    append-only operators and must drain in ``append`` mode."""
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def enrich_with_user_profile(
    stream: DataFrame, profile: DataFrame
) -> DataFrame:
    """Stream-STATIC join: enrich each streamed event with the user's
    precomputed profile (historical average spend, event count) — the
    reference-data pattern.  Unlike stream-stream joins this needs no
    watermark and holds no join state: the static side is a batch
    DataFrame re-read per micro-batch, and each event emits exactly
    one enriched row with a deviation flag.  No broadcast hint: the
    profile table grows with the user population (∝ SF), so the join
    strategy is left to Spark's size-based planning — it broadcasts
    while the side is actually small and degrades to a shuffled join
    instead of an executor OOM when it is not (the package-wide
    broadcast-guard rule, tests/test_plan_shape.py)."""
    p = profile.select(
        "user_id",
        F.col("avg_value").alias("profile_avg"),
        F.col("n_events").alias("profile_n"),
    )
    out = stream.join(p, "user_id", "left")
    return out.select(
        "event_id",
        "user_id",
        "value",
        "profile_avg",
        (F.col("value") > 2 * F.coalesce("profile_avg", F.lit(0.0))).alias(
            "above_2x_profile"
        ),
    )


def sliding_totals(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of plans/events.py::e_sliding_window — each
    event lands in window_length/slide overlapping windows; state per
    key is bounded by the watermark exactly as in the tumbling twin."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(igrid("value", 2)).alias("total_value_e2"),
        )
        .select(
            F.col("w.start").alias("window_start"), "n_events", "total_value_e2"
        )
    )
