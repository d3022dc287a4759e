"""Stream-static enrichment join — the reference-data streaming
pattern (no watermark, no join state; static side broadcast per
micro-batch)."""

from __future__ import annotations

from pyspark.sql import functions as F

from finance_etl_pipeline_spark.sources.readers import table

def test_stream_static_enrichment_matches_batch(spark, sf_dir, tmp_path):
    """Stream-static join: every streamed event is enriched with the
    static profile exactly as the equivalent batch join would."""
    import os
    import shutil

    from finance_etl_pipeline_spark.streaming.events import (
        enrich_with_user_profile,
        read_events_stream,
    )

    e = table(spark, sf_dir, "events")
    profile = e.groupBy("user_id").agg(
        F.avg("value").alias("avg_value"),
        F.count(F.lit(1)).alias("n_events"),
    )

    d = tmp_path / "stream_in"
    d.mkdir()
    shutil.copy(os.path.join(sf_dir, "events.parquet"), d / "part-0.parquet")
    q = (
        enrich_with_user_profile(read_events_stream(spark, str(d)), profile)
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        r.event_id: (r.profile_avg, r.above_2x_profile)
        for r in spark.table("enriched").collect()
    }
    expected = {
        r.event_id: (r.profile_avg, r.above_2x_profile)
        for r in enrich_with_user_profile(e, profile).collect()
    }
    assert got == expected
