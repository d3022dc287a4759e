"""Streaming ingest → incremental rollup maintenance, end to end.

The production continuous-aggregate loop: a file-source event stream
drains in micro-batches; each batch is reduced to partial states
(count + exact cent totals) and MERGED into the stored rollup via
``merge_partials`` inside foreachBatch — state grows with |buckets ×
keys|, never with events, and because the partials are exact BIGINT
units the merged table is bit-identical to a batch recompute no matter
how the stream was chunked.

This is the missing e2e between streaming/ (windowed aggregates over
the stream itself) and operators/rollup.py (batch-tested merge
algebra): here the merge algebra runs UNDER the streaming engine with
real micro-batch boundaries (maxFilesPerTrigger=1 over a multi-file
copy of the events table forces ≥ 2 batches).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from finance_etl_pipeline_spark.operators.rollup import (
    merge_partials,
    rollup_partials,
)
from finance_etl_pipeline_spark.sources.readers import table
from finance_etl_pipeline_spark.streaming.events import read_events_stream


def test_foreachbatch_incremental_rollup_matches_batch(spark, sf_dir, tmp_path):
    src = tmp_path / "stream_in"
    src.mkdir()
    # two files → at least two micro-batches with maxFilesPerTrigger=1;
    # DISJOINT halves of the events table so the union is exactly the
    # batch input
    full = table(spark, sf_dir, "events")
    # the file source lists plain files under the path — emit each
    # half as ONE parquet file at the top level
    import glob

    for name, half in (
        ("a", full.filter(F.col("event_id") % 2 == 0)),
        ("b", full.filter(F.col("event_id") % 2 == 1)),
    ):
        out = tmp_path / f"half_{name}"
        half.coalesce(1).write.parquet(str(out))
        (part,) = glob.glob(str(out / "part-*.parquet"))
        shutil.copy(part, src / f"{name}.parquet")

    state_dir = str(tmp_path / "rollup_state")
    n_batches = []

    def upsert_batch(batch_df, batch_id):
        new = rollup_partials(batch_df, "hour")
        if os.path.exists(state_dir):
            existing = batch_df.sparkSession.read.parquet(state_dir)
            merged = merge_partials(existing, new)
        else:
            merged = new
        # overwrite-with-staging: collectable sizes here; production
        # uses MERGE INTO on a table format, same algebra
        staged = merged.collect()
        shutil.rmtree(state_dir, ignore_errors=True)
        batch_df.sparkSession.createDataFrame(
            staged, merged.schema
        ).write.parquet(state_dir)
        n_batches.append(batch_id)

    stream = read_events_stream(spark, str(src), max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(upsert_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()

    assert len(n_batches) >= 2, "expected multiple micro-batches"
    got = {
        (r.bucket, r.key): (r.n, r.total_e2)
        for r in spark.read.parquet(state_dir).collect()
    }
    expected = {
        (r.bucket, r.key): (r.n, r.total_e2)
        for r in rollup_partials(full, "hour").collect()
    }
    assert got == expected
