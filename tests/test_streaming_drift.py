"""Streaming PSI drift monitor == batch PSI over the same rows.

The reference histogram comes from the even-event_id cohort (the same
A-side the batch drift_psi_events query uses); the stream feeds the
odd-event_id cohort.  After the stream drains, the monitor's final
accumulated PSI must equal the batch computation bin-for-bin."""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import functions as F

from finance_etl_pipeline_spark.sources.readers import table
from finance_etl_pipeline_spark.streaming.drift import (
    StreamingDriftMonitor,
    bin_col,
    psi,
    reference_histogram,
)
from finance_etl_pipeline_spark.streaming.events import read_events_stream


def test_streaming_psi_equals_batch_psi(spark, sf_dir, tmp_path):
    e = table(spark, sf_dir, "events")
    ref = e.filter(F.col("event_id") % 2 == 0)
    obs = e.filter(F.col("event_id") % 2 == 1)

    d = tmp_path / "stream_in"
    d.mkdir()
    obs.coalesce(1).write.parquet(str(d / "obs.parquet"))
    # point the file stream at the written parquet dir
    stream = (
        spark.readStream.schema(obs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "obs.parquet"))
    )

    mon = StreamingDriftMonitor(reference_histogram(ref))
    q = mon.attach(stream)
    q.awaitTermination()

    assert mon.trajectory, "monitor never saw a batch"
    streamed = mon.trajectory[-1]

    obs_counts = {
        r["bin"]: r["count"]
        for r in obs.select(bin_col()).groupBy("bin").count().collect()
    }
    batch = psi(reference_histogram(ref), obs_counts)
    assert math.isclose(streamed, batch, rel_tol=0, abs_tol=1e-12)
