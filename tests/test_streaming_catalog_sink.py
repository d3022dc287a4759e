"""Streaming sinks addressing MANIFEST tables by catalog NAME
(streaming/sink.py::_batch_resolver): the name re-resolves on every
micro-batch, so a rename/drop landing mid-stream fails the next batch
loudly with the catalog error — no silent write to the old directory."""

from __future__ import annotations

import os

import pytest

from finance_etl_pipeline_spark.operators import catalog as C
from finance_etl_pipeline_spark.operators import manifest as M
from finance_etl_pipeline_spark.sources.readers import table
from finance_etl_pipeline_spark.streaming.sink import (
    append_stream_to_manifest,
    apply_changefeed_to_manifest_each_batch,
)


def _drain(q):
    q.awaitTermination(180)
    q.stop()


def test_append_sink_resolves_name_per_batch(spark, sf_dir, tmp_path):
    root = str(tmp_path / "wh")
    C.create_table(root, "sink")
    src_dir = str(tmp_path / "in")
    os.makedirs(src_dir)
    o = table(spark, sf_dir, "orders").select("o_orderkey").limit(40)
    o.coalesce(1).write.parquet(os.path.join(src_dir, "f0"))

    def run(ckpt):
        stream = spark.readStream.schema(o.schema).parquet(src_dir + "/f*")
        return (
            append_stream_to_manifest(
                stream, "sink", "app-cat", warehouse=root
            )
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )

    _drain(run("ck1"))
    tdir = C.resolve(root, "sink")
    assert M.read_version(spark, tdir).count() == 40

    # rename mid-stream: the NEXT batch must fail with the catalog
    # error, not append to the old directory
    C.rename_table(root, "sink", "sink_renamed")
    o.coalesce(1).write.parquet(os.path.join(src_dir, "f1"))
    v_before = M.latest_version(tdir)
    q = run("ck2")
    with pytest.raises(Exception, match="unknown table 'sink'"):
        q.awaitTermination(180)
        raise AssertionError("stream should have failed")
    q.stop()
    assert M.latest_version(tdir) == v_before  # nothing landed

    # the new name keeps working (fresh checkpoint/app epoch)
    def run_new(ckpt):
        stream = spark.readStream.schema(o.schema).parquet(src_dir + "/f*")
        return (
            append_stream_to_manifest(
                stream, "sink_renamed", "app-cat2", warehouse=root
            )
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )

    _drain(run_new("ck3"))
    assert M.read_version(spark, C.resolve(root, "sink_renamed")).count() == 120


def test_changefeed_sink_accepts_catalog_name(spark, sf_dir, tmp_path):
    """The CDC-apply sink writes its merges into a NAMED manifest
    table end-to-end (one feed batch -> one merge version)."""
    root = str(tmp_path / "wh")
    C.create_table(root, "replica")
    # a changefeed-shaped static parquet drained as a stream
    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)
    rows = [
        ("added", 1, 10, 100),
        ("added", 1, 11, 110),
        ("added", 1, 12, 120),
        ("removed", 2, 11, None),
        ("changed", 2, 12, 125),
    ]
    feed = spark.createDataFrame(
        rows, "change_type string, version int, k int, val int"
    )
    feed.coalesce(1).write.parquet(os.path.join(feed_dir, "f0"))
    stream = spark.readStream.schema(feed.schema).parquet(feed_dir + "/f*")
    q = (
        apply_changefeed_to_manifest_each_batch(
            stream, spark, "replica", ["k"], "cdc-cat", warehouse=root
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = sorted(
        (r.k, r.val)
        for r in M.read_version(spark, C.resolve(root, "replica"))
        .select("k", "val")
        .collect()
    )
    assert got == [(10, 100), (12, 125)]
