"""Streaming == batch semantics parity (availableNow drain)."""

from __future__ import annotations

import os
import shutil

import pytest

from finance_etl_pipeline_spark.plans import all_queries
from finance_etl_pipeline_spark.streaming.events import (
    drain_to_memory,
    read_events_stream,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    # file-stream source wants a directory of files
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(os.path.join(sf_dir, "events.parquet"), d / "part-0.parquet")
    return str(d)


def test_streaming_tumbling_matches_batch(spark, sf_dir, events_dir):
    stream = read_events_stream(spark, events_dir)
    assert stream.isStreaming
    got = drain_to_memory(tumbling_counts(stream), "t_tumbling", spark)
    batch = all_queries()["e_tumbling_window"].fn(spark, sf_dir)
    key = lambda r: (r.window_start, r.event_type)  # noqa: E731
    got_rows = {key(r): (r.n_events, r.total_value_e2) for r in got.collect()}
    batch_rows = {key(r): (r.n_events, r.total_value_e2) for r in batch.collect()}
    assert got_rows == batch_rows


def test_stream_stream_join_matches_batch(spark, sf_dir, events_dir):
    from finance_etl_pipeline_spark.streaming.events import (
        click_purchase_stream_join,
    )

    stream = read_events_stream(spark, events_dir)
    got = drain_to_memory(
        click_purchase_stream_join(stream), "t_ss_join", spark, mode="append"
    )
    batch = all_queries()["e_click_purchase_attribution"].fn(spark, sf_dir)
    key = lambda r: (r.click_id, r.purchase_id)  # noqa: E731
    got_rows = {
        key(r): (r.user_id, r.delay_sec, r.purchase_value_e2) for r in got.collect()
    }
    batch_rows = {
        key(r): (r.user_id, r.delay_sec, r.purchase_value_e2)
        for r in batch.collect()
    }
    assert got_rows == batch_rows
    assert len(got_rows) > 0


def test_dedup_within_watermark(spark, sf_dir, events_dir, tmp_path):
    """A doubled source (same file twice) dedups back to the batch
    distinct count; every surviving event_id is unique."""
    import shutil

    from finance_etl_pipeline_spark.streaming.events import (
        dedup_within_watermark,
    )

    d = tmp_path / "dup_stream"
    d.mkdir()
    shutil.copy(os.path.join(events_dir, "part-0.parquet"), d / "a.parquet")
    shutil.copy(os.path.join(events_dir, "part-0.parquet"), d / "b.parquet")
    stream = read_events_stream(spark, str(d))
    got = drain_to_memory(
        dedup_within_watermark(stream), "t_dedup_wm", spark, mode="append"
    )
    n_batch = (
        spark.read.parquet(os.path.join(str(d), "*.parquet"))
        .select("event_id")
        .distinct()
        .count()
    )
    ids = [r.event_id for r in got.select("event_id").collect()]
    assert len(ids) == len(set(ids)) == n_batch


def test_foreachbatch_upsert_sink(spark, sf_dir, events_dir, tmp_path):
    """Two micro-batches of the same keys MERGE down to one current-
    state row per event_id — the streaming CDC table-maintenance path."""
    import shutil as _sh

    from finance_etl_pipeline_spark.streaming.sink import upsert_each_batch

    src = tmp_path / "cdc_src"
    src.mkdir()
    _sh.copy(os.path.join(events_dir, "part-0.parquet"), src / "a.parquet")
    _sh.copy(os.path.join(events_dir, "part-0.parquet"), src / "b.parquet")
    target = str(tmp_path / "cdc_table")

    stream = read_events_stream(spark, str(src), max_files_per_trigger=1)
    q = (
        upsert_each_batch(stream, spark, target, keys=["event_id"], order_col="ts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    table = spark.read.parquet(target)
    n_keys = (
        spark.read.parquet(os.path.join(str(src), "*.parquet"))
        .select("event_id")
        .distinct()
        .count()
    )
    assert table.count() == n_keys
    assert table.select("event_id").distinct().count() == n_keys


def test_stream_starts_on_empty_directory(spark, tmp_path):
    """A file-source stream may be declared before any file arrives:
    the ts-type probe must fall back to the default schema instead of
    crashing on 'unable to infer schema' (advisory fix)."""
    empty = str(tmp_path / "events_empty")
    import os

    os.makedirs(empty, exist_ok=True)
    stream = read_events_stream(spark, empty)
    assert stream.isStreaming
    # the fallback path must still normalize ts to TIMESTAMP
    assert dict(stream.dtypes)["ts"] == "timestamp"


def test_watermark_drops_late_data_across_triggers(spark, tmp_path):
    """The watermark contract, demonstrated concretely: a row arriving
    AFTER its window's watermark has passed is dropped from the
    aggregate.  Two availableNow runs share one checkpoint: run 1 sets
    the watermark; run 2 delivers a late row into an already-finalized
    window plus a fresh row — the finalized window must emit WITHOUT
    the late contribution."""
    import pandas as pd
    from pyspark.sql import functions as F

    src = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "late_ckpt")
    os.makedirs(src, exist_ok=True)

    def write_file(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        pdf["props"] = None
        df = spark.createDataFrame(pdf)
        df.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / ("stage_" + name))
        )
        import glob

        part = glob.glob(str(tmp_path / ("stage_" + name) / "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src, name + ".parquet"))

    def run(name):
        stream = read_events_stream(spark, src)
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )
        emitted = []

        def sink(batch_df, _epoch):
            emitted.extend(batch_df.collect())

        # foreachBatch (not memory sink): supports checkpoint recovery,
        # which run 2 needs to resume run 1's watermark state
        q = (
            agg.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r["ws"]: r["n"] for r in emitted}

    # run 1: two rows in the 10:00 window; a 13:00 row pushes the
    # watermark to 12:50 at batch end
    write_file(
        "a",
        [
            (1, "2024-01-01 10:00:00", 1, "view", 1.0),
            (2, "2024-01-01 10:30:00", 1, "view", 1.0),
            (3, "2024-01-01 13:00:00", 1, "view", 1.0),
        ],
    )
    out1 = run("late_run1")

    # run 2: a LATE row into the (now finalized) 10:00 window + a
    # fresh 14:00 row
    write_file(
        "b",
        [
            (4, "2024-01-01 10:45:00", 1, "view", 1.0),  # late — must drop
            (5, "2024-01-01 14:00:00", 1, "view", 1.0),
        ],
    )
    out2 = run("late_run2")

    import datetime

    w10 = datetime.datetime(2024, 1, 1, 10, 0)
    merged = {**out1, **out2}
    assert merged[w10] == 2, merged  # late row 4 did NOT count


def test_streaming_sliding_matches_batch(spark, sf_dir, events_dir):
    from finance_etl_pipeline_spark.streaming.events import sliding_totals

    stream = read_events_stream(spark, events_dir)
    got = drain_to_memory(sliding_totals(stream), "t_sliding", spark)
    batch = all_queries()["e_sliding_window"].fn(spark, sf_dir)
    got_rows = {
        r.window_start: (r.n_events, r.total_value_e2) for r in got.collect()
    }
    batch_rows = {
        r.window_start: (r.n_events, r.total_value_e2)
        for r in batch.collect()
    }
    assert got_rows == batch_rows
