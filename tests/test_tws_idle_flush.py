"""Idle-flush timers vs the batch aggregate oracle.

Two micro-batches (maxFilesPerTrigger=1) over disjoint user sets; the
idle timers (idle_ms=0) fire in the batch AFTER each user's last
activity, emitting exactly one finalized row per user.

A processing-time-timer query is CONTINUOUS — the engine keeps
scheduling batches so future timers can fire, so availableNow never
self-terminates (observed: timers all fired and deleted, engine kept
polling "No expired timer").  The test therefore polls the sink until
the expected rows land, then stops the query — the same way a real
deployment runs this operator.  Exercises the full timer protocol
(GetProcessingTime / ListTimers / DeleteTimer / RegisterTimer /
expiry iteration with pickled keys) through the proto shim."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from finance_etl_pipeline_spark.streaming.idle_flush import stream_idle_flush


def test_idle_flush_emits_each_user_once_with_exact_totals(spark, tmp_path):
    saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    q = None
    try:
        import os
        import shutil

        rows1 = [(1, 10.5), (1, 2.25), (2, 5.0)]
        rows2 = [(3, 7.0), (3, 1.0)]
        d = tmp_path / "in"
        d.mkdir()
        for i, rows in enumerate([rows1, rows2]):
            stage = tmp_path / f"stage{i}"
            spark.createDataFrame(
                rows, "user_id long, value double"
            ).coalesce(1).write.parquet(str(stage))
            for f in os.listdir(stage):
                if f.endswith(".parquet"):
                    shutil.move(str(stage / f), d / f"part-{i}.parquet")
            shutil.rmtree(stage)

        stream = (
            spark.readStream.schema("user_id long, value double")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(d))
        )
        q = (
            stream_idle_flush(stream)
            .writeStream.format("memory")
            .queryName("idle_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        expected = {1: (2, 12.75), 2: (1, 5.0), 3: (2, 8.0)}
        deadline = time.time() + 120
        got: dict[int, tuple] = {}
        while time.time() < deadline:
            got = {
                r.user_id: (r.n_events, r.total_value)
                for r in spark.table("idle_out").collect()
            }
            if set(got) >= set(expected):
                break
            time.sleep(1)
        assert got == expected, got
        # each user flushed exactly ONCE (state cleared + timer deleted:
        # re-fires would duplicate rows in the append sink)
        n_rows = spark.table("idle_out").count()
        assert n_rows == len(expected)
    finally:
        if q is not None:
            q.stop()
        if saved:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", saved
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
