"""Stream-stream LEFT OUTER interval join vs the batch left join.

The outer rows (clicks with no purchase within 30 minutes) are only
emitted once the watermark proves no match can still arrive, so the
drain appends a far-future sentinel click+purchase (user -1) whose
event time pushes BOTH sides' watermarks past every real click's
expiry.  After that, the streamed result set (sentinel excluded) must
equal the batch left join with the identical predicate: one row per
(click, matching purchase) plus exactly one NULL-purchase row per
unconverted click."""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from finance_etl_pipeline_spark.sources.readers import table
from finance_etl_pipeline_spark.streaming.events import (
    click_purchase_stream_left_join,
    drain_to_memory,
    read_events_stream,
)


def test_left_outer_interval_join_matches_batch(spark, sf_dir, tmp_path):
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    e = table(spark, sf_dir, "events").select(*cols)
    hi = e.agg(F.max("ts")).first()[0]
    d = tmp_path / "in"
    d.mkdir()

    import shutil

    def _write_one(df, dest):
        stage = tmp_path / "stage"
        df.coalesce(1).write.parquet(str(stage))
        for f in os.listdir(stage):
            if f.endswith(".parquet"):
                shutil.move(str(stage / f), dest)
        shutil.rmtree(stage)

    _write_one(e, d / "part-0.parquet")
    # sentinel click + purchase: far enough out that the min of both
    # sides' watermarks clears every real click_ts + 30 min
    sent_ts = hi + datetime.timedelta(hours=6)
    sentinels = spark.createDataFrame(
        [
            (-10, sent_ts, -1, "click", 0.0, None),
            (-11, sent_ts, -1, "purchase", 1.0, None),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    _write_one(sentinels, d / "part-1.parquet")

    stream = read_events_stream(spark, str(d), max_files_per_trigger=1)
    got_df = drain_to_memory(
        click_purchase_stream_left_join(stream),
        "t_ss_left_join",
        spark,
        mode="append",
    ).filter(F.col("user_id") >= 0)
    key = lambda r: (r.click_id, r.purchase_id)  # noqa: E731
    got = {
        key(r): (r.user_id, r.delay_sec, r.purchase_value_e2, r.converted)
        for r in got_df.collect()
    }
    # exactly-once: no click emitted both as matched and as outer-NULL
    assert len(got) == got_df.count()

    full = spark.read.parquet(str(d)).filter(F.col("user_id") >= 0)
    c = full.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    p = full.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        "value",
    )
    from finance_etl_pipeline_spark.functions.scalars import igrid

    batch = c.join(
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
    expected = {
        key(r): (r.user_id, r.delay_sec, r.purchase_value_e2, r.converted)
        for r in batch.collect()
    }
    assert got == expected
    # the data really exercises BOTH paths
    n_outer = sum(1 for v in got.values() if not v[3])
    assert n_outer > 0 and n_outer < len(got)
