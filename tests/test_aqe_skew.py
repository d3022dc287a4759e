"""AQE skew-join handling, demonstrated empirically: a hand-crafted
hot key (half the fact rows on one join key) must make AQE split the
skewed partition — visible as ``SortMergeJoin(skew=true)`` in the
final adaptive plan — without changing the join result.

This is the runtime complement to the MANUAL salting operators in
operators/skew.py: at 100 TB you want both — AQE for skew discovered
at run time, salting for skew known in advance (AQE skew handling
does not cover all shapes, e.g. aggregations).  Thresholds are tuned
down because local test data is small; the rewrite being asserted is
scale-independent."""

from __future__ import annotations

from pyspark.sql import functions as F

_TUNED = {
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def test_aqe_splits_skewed_join_partition(spark):
    saved = {k: spark.conf.get(k, None) for k in _TUNED}
    for k, v in _TUNED.items():
        spark.conf.set(k, v)
    try:
        # key 0 carries half the rows — one shuffle partition dwarfs
        # the rest
        left = spark.range(600_000).select(
            F.when(F.col("id") < 300_000, 0)
            .otherwise((F.col("id") % 1000) + 1)
            .alias("k"),
            F.rand(42).alias("v"),
        )
        right = spark.range(1001).select(
            F.col("id").alias("k"), F.lit("x").alias("tag")
        )
        j = left.join(right, "k").select("k", "v", "tag")
        n = len(j.collect())
        assert n == 600_000  # inner join keeps every left row

        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE did not split the skewed partition"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
