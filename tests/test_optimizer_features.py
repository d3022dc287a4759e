"""Plan-level proof that the two big scan-reduction optimizations a
100 TB deployment depends on actually engage on this engine's layouts:

- **Dynamic partition pruning (DPP)**: a selective dim-side filter
  prunes fact PARTITIONS at runtime through the join — the mechanism
  that makes the month-partitioned curated layout
  (pipeline.run_months) cheap to join against a filtered calendar.
- **Runtime bloom-filter join**: a selective join injects a bloom
  filter into the probe-side scan, cutting shuffle input before the
  join — the row-level complement to DPP on unpartitioned columns.

Both are asserted on the OPTIMIZED/EXECUTED plan text, with results
checked against the unoptimized predicate semantics so the proof is
never just a plan-string match."""

from __future__ import annotations

import pyspark.sql.functions as F

from finance_etl_pipeline_spark.sources.readers import table


def test_dynamic_partition_pruning_engages(spark, sf_dir, tmp_path):
    fact_dir = str(tmp_path / "fact_by_status")
    o = table(spark, sf_dir, "orders")
    o.write.partitionBy("o_orderstatus").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    # tiny dim mapping status -> label; the filter is on the dim
    dim = spark.createDataFrame(
        [("O", "open"), ("F", "filled"), ("P", "pending")],
        "status string, label string",
    )
    j = fact.join(
        dim, fact["o_orderstatus"] == dim["status"]
    ).filter(F.col("label") == "filled")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # semantics: identical to filtering the fact directly
    want = fact.filter(F.col("o_orderstatus") == "F").count()
    assert j.count() == want
    assert want > 0


def test_runtime_bloom_filter_join_engages(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 300000.0  # selective build side
    )
    conf = {
        # force the paths that gate bloom injection at toy scale
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
            "l_orderkey", "l_quantity", "o_totalprice"
        )
        optimized = (
            j._jdf.queryExecution().optimizedPlan().toString()
        )
        assert "bloom" in optimized.lower(), optimized[:2000]
        # semantics unchanged by the injected filter
        n = j.count()
        want = (
            li.join(
                table(spark, sf_dir, "orders"),
                li["l_orderkey"] == F.col("o_orderkey"),
            )
            .filter(F.col("o_totalprice") > 300000.0)
            .count()
        )
        assert n == want and n > 0
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
