"""Event-time-timer sessionization vs the batch islands oracle.

The stream drains the real events testdata split into three
time-ordered files (availableNow, one file per micro-batch) plus a
far-future sentinel row that pushes the global watermark past every
session's close boundary.  The emitted session set must equal the
batch gaps-and-islands sessionization (`_with_session_no`) on the
same rows, each session exactly once — whether it was closed inline
(a later event proved the gap) or by an event-time timer firing on
watermark advance.

Unlike the processing-time idle-flush query, this one SELF-TERMINATES
under availableNow: watermark-advance batches fire the remaining
timers, then the query stops — which is itself part of the contract
under test.  Exercises RegisterTimer / DeleteTimer / ListTimers /
expiry iteration plus the GetWatermark TimerValueRequest through the
proto shim."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from finance_etl_pipeline_spark.plans.events import _with_session_no
from finance_etl_pipeline_spark.sources.readers import table
from finance_etl_pipeline_spark.streaming.event_session import (
    stream_event_sessions,
)

STREAM_SCHEMA = "user_id long, ts timestamp"


def _rocksdb(spark):
    saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return saved


def _restore(spark, saved):
    if saved:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", saved)
    else:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_event_time_sessions_match_batch_islands(spark, sf_dir, tmp_path):
    saved = _rocksdb(spark)
    try:
        e = table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
        lo, hi = e.agg(F.min("ts"), F.max("ts")).first()
        span = hi - lo
        cuts = [lo + span / 3, lo + 2 * span / 3]
        d = tmp_path / "in"
        d.mkdir()
        parts = [
            e.filter(F.col("ts") < cuts[0]),
            e.filter((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])),
            e.filter(F.col("ts") >= cuts[1]),
        ]
        import os
        import shutil

        for i, part in enumerate(parts):
            stage = tmp_path / f"stage{i}"
            part.select("user_id", "ts").coalesce(1).write.parquet(str(stage))
            for f in os.listdir(stage):
                if f.endswith(".parquet"):
                    shutil.move(str(stage / f), d / f"part-{i}.parquet")
            shutil.rmtree(stage)
        # sentinel: one far-future row from a user outside the data;
        # its watermark (sentinel - 30 min delay) clears every real
        # session's close boundary, so all trailing sessions flush
        sentinel_ts = hi + datetime.timedelta(hours=3)
        spark.createDataFrame(
            [(-1, sentinel_ts)], STREAM_SCHEMA
        ).coalesce(1).write.parquet(str(tmp_path / "stage3"))
        for f in os.listdir(tmp_path / "stage3"):
            if f.endswith(".parquet"):
                shutil.move(str(tmp_path / "stage3" / f), d / "part-3.parquet")
        shutil.rmtree(tmp_path / "stage3")

        stream = (
            spark.readStream.schema(STREAM_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(d))
        )
        q = (
            stream_event_sessions(stream)
            .writeStream.format("memory")
            .queryName("evsess_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        out = spark.table("evsess_out").filter(F.col("user_id") >= 0)
        got = [
            (r.user_id, r.n_events, r.s_start_us, r.s_end_us)
            for r in out.collect()
        ]
        # exactly once: no session double-emitted by timer + inline
        assert len(got) == len(set(got))

        expected = {
            (r.user_id, r.n_events, r.s_start_us, r.s_end_us)
            for r in (
                _with_session_no(e)
                .groupBy("user_id", "sno")
                .agg(
                    F.count(F.lit(1)).alias("n_events"),
                    F.min(F.unix_micros("ts")).alias("s_start_us"),
                    F.max(F.unix_micros("ts")).alias("s_end_us"),
                )
                .collect()
            )
        }
        assert set(got) == expected
        # the data really exercised both close paths: many sessions,
        # every user's trailing session only closable by a timer
        n_users = e.select("user_id").distinct().count()
        assert len(got) > n_users
    finally:
        _restore(spark, saved)
