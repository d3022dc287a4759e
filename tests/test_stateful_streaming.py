"""Stateful streaming operator: state persists across micro-batches."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from finance_etl_pipeline_spark.sources.readers import table
from finance_etl_pipeline_spark.streaming.events import read_events_stream
from finance_etl_pipeline_spark.streaming.stateful import running_user_stats


def test_running_user_stats_match_batch(spark, sf_dir, tmp_path):
    d = tmp_path / "stream_in"
    d.mkdir()
    shutil.copy(os.path.join(sf_dir, "events.parquet"), d / "part-0.parquet")

    stream = read_events_stream(spark, str(d))
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # take the LAST update per user (update mode emits one row per
    # user per batch; availableNow over one dir may run several)
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.table("user_stats").collect()
    }

    batch = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
    )
    expected = {r.user_id: (r.n, r.total) for r in batch.collect()}
    assert set(got) == set(expected)
    for uid, (n, total) in expected.items():
        assert got[uid][0] == n
        assert abs(got[uid][1] - total) < 0.05
