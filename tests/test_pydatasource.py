"""Custom Python DataSource (Spark 4 API): batch read parallelism +
determinism vs the pandas twin, and the micro-batch stream reader
draining to exactly the batch table under availableNow."""

from __future__ import annotations

import pyspark.sql.functions as F

from finance_etl_pipeline_spark.sources.pydatasource import (
    SCHEMA,
    SyntheticEventsDataSource,
    row_at,
)


def _registered(spark):
    spark.dataSource.register(SyntheticEventsDataSource)
    return spark


def test_batch_read_matches_twin_and_partitioning(spark):
    _registered(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 257)
        .option("n_partitions", 5)
        .load()
    )
    assert df.schema.simpleString() == (
        spark.createDataFrame([], SCHEMA).schema.simpleString()
    )
    # ceil-split ranges: 5 partitions planned
    assert df.rdd.getNumPartitions() == 5
    rows = {r.event_id: (r.user_id, r.event_type, r.value) for r in df.collect()}
    assert len(rows) == 257
    for i in (0, 1, 128, 256):
        _, u, t, v = row_at(i)
        assert rows[i] == (u, t, v)
    # re-read is bit-stable (content-addressed payloads)
    again = {
        r.event_id: (r.user_id, r.event_type, r.value)
        for r in spark.read.format("synthetic_events")
        .option("n_rows", 257)
        .option("n_partitions", 3)  # different split, same table
        .load()
        .collect()
    }
    assert rows == again


def test_stream_drains_to_batch_table(spark, tmp_path):
    """Default options (rows_per_batch=0): availableNow captures the
    full table in its single latestOffset probe and drains it all."""
    _registered(spark)
    q = (
        spark.readStream.format("synthetic_events")
        .option("n_rows", 230)
        .option("n_partitions", 3)
        .load()
        .writeStream.format("memory")
        .queryName("t_pyds_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = spark.table("t_pyds_stream")
    assert got.count() == 230
    assert got.select("event_id").distinct().count() == 230
    # spot-check payloads against the twin
    sample = {r.event_id: r.value for r in got.filter(F.col("event_id") < 5).collect()}
    for i in range(5):
        assert sample[i] == row_at(i)[3]


def test_stream_rows_per_batch_rate_limits(spark, tmp_path):
    """rows_per_batch > 0 is REAL admission control: latestOffset
    advances by that many rows per micro-batch, so 230 rows at 64/batch
    take >= 4 non-empty batches, each admitting <= 64 rows, and the
    stream still drains the exact table.  (availableNow would capture
    only the first 64-row window — rate limiting needs a
    processing-time trigger; the docstring states the contract.)"""
    import time

    _registered(spark)
    q = (
        spark.readStream.format("synthetic_events")
        .option("n_rows", 230)
        .option("rows_per_batch", 64)
        .option("n_partitions", 3)
        .load()
        .writeStream.format("memory")
        .queryName("t_pyds_rate")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_rate"))
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table("t_pyds_rate").count() >= 230:
                break
            time.sleep(0.2)
        got = spark.table("t_pyds_rate")
        assert got.count() == 230
        assert got.select("event_id").distinct().count() == 230
        sizes = [
            p["numInputRows"] for p in q.recentProgress if p["numInputRows"] > 0
        ]
        assert len(sizes) >= 4  # 230 rows admitted 64 at a time
        assert max(sizes) <= 64
    finally:
        q.stop()


def test_push_filters_prune_generation(spark):
    """Range filters on event_id narrow the generated interval at the
    source (reader-level unit check) and the e2e read stays correct."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        LessThan,
    )

    from finance_etl_pipeline_spark.sources.pydatasource import (
        SyntheticEventsPushdownReader,
    )

    r = SyntheticEventsPushdownReader({"n_rows": "1000", "n_partitions": "4"})
    unsupported = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("event_id",), 100),
                LessThan(("event_id",), 260),
                EqualTo(("event_type",), "click"),  # not ours → returned
            ]
        )
    )
    assert len(unsupported) == 1 and isinstance(unsupported[0], EqualTo)
    parts = r.partitions()
    covered = sorted((p.lo, p.hi) for p in parts)
    assert covered[0][0] == 100 and covered[-1][1] == 260
    assert sum(hi - lo for lo, hi in covered) == 160  # nothing extra generated

    # e2e: Spark pushes the comparisons; result equals the unpruned read
    _registered(spark)
    conf_key = "spark.sql.python.filterPushdown.enabled"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "true")
    try:
        df = (
            spark.read.format("synthetic_events")
            .option("n_rows", 1000)
            .option("pushdown", "true")
            .load()
            .filter((F.col("event_id") >= 100) & (F.col("event_id") < 260))
        )
        got = sorted(r_.event_id for r_ in df.collect())
        assert got == list(range(100, 260))
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)


def test_push_filters_empty_range(spark):
    from pyspark.sql.datasource import LessThan

    from finance_etl_pipeline_spark.sources.pydatasource import (
        SyntheticEventsPushdownReader,
    )

    r = SyntheticEventsPushdownReader({"n_rows": "50"})
    list(r.pushFilters([LessThan(("event_id",), 0)]))
    parts = r.partitions()
    assert sum(p.hi - p.lo for p in parts) == 0
