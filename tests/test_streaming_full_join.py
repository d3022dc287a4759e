"""Stream-stream FULL OUTER interval join vs the batch full join.

Both outer directions trail the watermark: a click's NULL-purchase row
needs the watermark past click_ts + 30 min, and a purchase's
NULL-click row needs it past purchase_ts (its click horizon lies in
the past, but emission still waits on the global watermark).  The
drain appends a far-future sentinel click+purchase (user -1) pushing
both sides' watermarks past every real row's expiry; after that the
streamed set (sentinel excluded) must equal the batch full join with
the identical predicate, and all three match kinds must be present.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from finance_etl_pipeline_spark.sources.readers import table
from finance_etl_pipeline_spark.streaming.events import (
    click_purchase_stream_full_join,
    drain_to_memory,
    read_events_stream,
)


def test_full_outer_interval_join_matches_batch(spark, sf_dir, tmp_path):
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
        click_purchase_stream_full_join(stream),
        "t_ss_full_join",
        spark,
        mode="append",
    ).filter(F.col("user_key") >= 0)
    key = lambda r: (r.click_id, r.purchase_id)  # noqa: E731
    got = {
        key(r): (r.user_key, r.delay_sec, r.purchase_value_e2, r.match_kind)
        for r in got_df.collect()
    }
    # exactly-once: no row emitted both matched and outer
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
        "full_outer",
    ).select(
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
    expected = {
        key(r): (r.user_key, r.delay_sec, r.purchase_value_e2, r.match_kind)
        for r in batch.collect()
    }
    assert got == expected
    # the data really exercises ALL THREE paths
    kinds = {v[3] for v in got.values()}
    assert kinds == {"matched", "click_only", "purchase_only"}
