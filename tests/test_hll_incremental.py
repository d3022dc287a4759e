"""Mergeable-HLL incremental distinct maintenance: merging per-day
sketches must equal the one-shot sketch over all data (the property
that makes incremental maintenance SOUND), and the estimate must be
close to the exact distinct count."""

from __future__ import annotations

from pyspark.sql import functions as F

from finance_etl_pipeline_spark.sources.readers import table


def test_merged_daily_sketches_equal_one_shot(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    merged = (
        e.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    one_shot = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).collect()[0]["est"]
    assert merged == one_shot  # merge is lossless vs a single pass

    exact = e.select("user_id").distinct().count()
    assert abs(merged - exact) / exact < 0.05
