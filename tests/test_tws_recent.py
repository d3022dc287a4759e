"""ListState recent-events buffer vs the batch top-k-by-recency oracle.

Single availableNow batch: the emitted buffer per user must equal the
batch row_number window (ts desc, event_id desc) capped at k.  This
is the ListState leg of the TWS state-API matrix (ValueState:
test_tws_alerts; MapState: test_tws_dedup)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Window
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.sources.readers import table
from finance_etl_pipeline_spark.streaming.events import read_events_stream
from finance_etl_pipeline_spark.streaming.recent import (
    RECENT_K,
    stream_recent_events,
)


def test_stream_recent_events_matches_batch_topk(spark, sf_dir, tmp_path):
    saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        d = tmp_path / "events_in"
        d.mkdir()
        shutil.copy(
            os.path.join(sf_dir, "events.parquet"), d / "part-0.parquet"
        )
        q = (
            stream_recent_events(read_events_stream(spark, str(d)))
            .writeStream.format("memory")
            .queryName("recent_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.user_id, r.rank, r.event_id, r.value)
            for r in spark.table("recent_out").collect()
        }

        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        expected = {
            (r.user_id, r.rank, r.event_id, r.value)
            for r in table(spark, sf_dir, "events")
            .select(
                "user_id",
                F.row_number().over(w).alias("rank"),
                "event_id",
                "value",
            )
            .filter(F.col("rank") <= RECENT_K)
            .collect()
        }
        assert got == expected and len(got) > 0
        # buffers are genuinely bounded: no rank beyond k
        assert max(r for _, r, _, _ in got) == RECENT_K
    finally:
        if saved:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", saved
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
