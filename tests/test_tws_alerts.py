"""transformWithStateInPandas spend alerts vs the batch oracle.

The alert SET is order-independent: whatever order a user's events
arrive in, cumulative spend is monotone, so the boundaries alerted are
exactly 1..floor(total/ALERT_STEP).  The streaming operator must
produce that set — no more (no duplicate alerts across batches: state
remembers what was already alerted), no fewer."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

# the TWS state-server wire protocol is protobuf-framed; importing the
# operator module installs streaming/proto_shim.py where the protobuf
# runtime is absent, so this test runs in the default environment
from finance_etl_pipeline_spark.sources.readers import table
from finance_etl_pipeline_spark.streaming.events import read_events_stream
from finance_etl_pipeline_spark.streaming.tws import ALERT_STEP, spend_alerts


def test_spend_alerts_match_batch_boundaries(spark, sf_dir, tmp_path):
    saved = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        d = tmp_path / "stream_in"
        d.mkdir()
        shutil.copy(os.path.join(sf_dir, "events.parquet"), d / "part-0.parquet")

        q = (
            spend_alerts(read_events_stream(spark, str(d)))
            .writeStream.format("memory")
            .queryName("spend_alerts")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.user_id, r.boundary)
            for r in spark.table("spend_alerts").collect()
        }

        totals = (
            table(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(F.sum("value").alias("total"))
            .collect()
        )
        expected = {
            (r.user_id, b)
            for r in totals
            for b in range(1, int(r.total // ALERT_STEP) + 1)
        }
        assert got == expected
        assert len(got) > 0, "fixture too small: no user ever crossed a boundary"
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", saved
            )
