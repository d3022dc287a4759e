"""TWS streaming dedup + MapState counts vs their batch oracles.

Both operators drain the same testdata files with availableNow, so
their output must equal the batch computation exactly: dedup keeps
the min-doc_id survivor per content hash; the MapState changelog's
single-batch form IS the per-user event-type count table.  The
MapState path additionally exercises the state server's map-call
surface (getValue/updateValue) beyond the ValueState-only spend-alert
test."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from finance_etl_pipeline_spark.sources.readers import table
from finance_etl_pipeline_spark.streaming.dedup import (
    stream_event_type_counts,
    stream_exact_dedup,
)
from finance_etl_pipeline_spark.streaming.events import read_events_stream

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


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


def test_stream_exact_dedup_matches_batch_survivor(spark, sf_dir, tmp_path):
    saved = _rocksdb(spark)
    try:
        d = tmp_path / "docs_in"
        d.mkdir()
        shutil.copy(
            os.path.join(sf_dir, "documents.parquet"), d / "part-0.parquet"
        )
        # inject true duplicates: 20 docs re-emitted under new ids (a
        # re-crawl) — min-doc_id survivor rule must keep the originals
        docs = table(spark, sf_dir, "documents")
        dups = docs.orderBy("doc_id").limit(20).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000
        )
        dups.coalesce(1).write.parquet(str(d / "redelivered"), mode="overwrite")
        for f in os.listdir(d / "redelivered"):
            if f.endswith(".parquet"):
                shutil.move(str(d / "redelivered" / f), d / "part-1.parquet")
        shutil.rmtree(d / "redelivered")
        full = docs.unionByName(dups)
        stream = spark.readStream.schema(DOCS_SCHEMA).parquet(str(d))
        q = (
            stream_exact_dedup(stream)
            .writeStream.format("memory")
            .queryName("dedup_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.content_md5, r.doc_id, r.n_chars)
            for r in spark.table("dedup_out").collect()
        }

        batch = (
            full
            .select(
                F.md5(F.col("text").cast("binary")).alias("content_md5"),
                "doc_id",
                "n_chars",
            )
            .groupBy("content_md5")
            .agg(
                F.min("doc_id").alias("doc_id"),
                F.min_by("n_chars", "doc_id").alias("n_chars"),
            )
        )
        expected = {
            (r.content_md5, r.doc_id, r.n_chars) for r in batch.collect()
        }
        assert got == expected and len(got) > 0
        # the injected duplicates were dropped (survivors are originals)
        assert len(got) <= full.count() - 20
        assert all(doc_id < 1_000_000 for _, doc_id, _ in got)
    finally:
        _restore(spark, saved)


def test_stream_event_type_counts_matches_batch(spark, sf_dir, tmp_path):
    saved = _rocksdb(spark)
    try:
        d = tmp_path / "events_in"
        d.mkdir()
        shutil.copy(
            os.path.join(sf_dir, "events.parquet"), d / "part-0.parquet"
        )
        q = (
            stream_event_type_counts(read_events_stream(spark, str(d)))
            .writeStream.format("memory")
            .queryName("typecount_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.user_id, r.event_type, r.n)
            for r in spark.table("typecount_out").collect()
        }
        expected = {
            (r.user_id, r.event_type, r.n)
            for r in table(spark, sf_dir, "events")
            .groupBy("user_id", "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == expected and len(got) > 0
    finally:
        _restore(spark, saved)
