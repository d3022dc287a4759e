"""spread() widens under-partitioned scans and NEVER narrows or
reshuffles data that is already wide enough (the 100 TB safety
property — see sources/readers.py)."""

from __future__ import annotations

from finance_etl_pipeline_spark.sources.readers import spread, table


def test_spread_widens_single_file_scan(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    assert docs.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    wide = spread(docs)
    assert wide.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert wide.count() == docs.count()


def test_spread_passes_through_wide_input(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(0, 10_000, numPartitions=target * 4)
    out = spread(df)
    # untouched: same object, no repartition inserted
    assert out is df


def test_hash_sample_invariant_under_repartition(spark, sf_dir):
    """Content-hash sampling must select the identical row set no
    matter how the input is partitioned (the property seeded
    df.sample does NOT have)."""
    from pyspark.sql import functions as F

    from finance_etl_pipeline_spark.operators.dedup import hash60_expr
    from finance_etl_pipeline_spark.sources.readers import table

    e = table(spark, sf_dir, "events")
    h = hash60_expr(F.col("event_id").cast("string"))
    base = {r.event_id for r in e.filter(h % 100 < 10).select("event_id").collect()}
    repart = {
        r.event_id
        for r in e.repartition(7, "user_id")
        .filter(h % 100 < 10)
        .select("event_id")
        .collect()
    }
    assert base == repart and base
