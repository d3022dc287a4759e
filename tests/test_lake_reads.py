"""Lake-read behaviors that matter operationally at scale:

- schema evolution: files written before a column existed must stay
  readable next to newer files (mergeSchema), with the explicit-schema
  read as the production alternative that skips footer merging;
- runtime bloom-filter join pruning: a selective dimension filter is
  turned into a bloom filter applied on the fact side BEFORE the
  shuffle — Spark's runtime answer to semi-join pushdown.  The local
  thresholds are tuned down because the feature is sized for real
  clusters (creation side <10 MB etc.); the assertion is that the
  plan rewires, which is scale-independent.
"""

from __future__ import annotations


from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def test_merge_schema_reads_old_and_new_files(spark, tmp_path):
    out = str(tmp_path / "evolving")
    v1 = spark.range(5).select(
        F.col("id"), (F.col("id") * 2.0).alias("amount")
    )
    v1.write.parquet(out)
    v2 = spark.range(5, 8).select(
        F.col("id"),
        (F.col("id") * 2.0).alias("amount"),
        F.lit("eur").alias("currency"),
    )
    v2.write.mode("append").parquet(out)

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"id", "amount", "currency"}
    assert merged.count() == 8
    # rows from v1 files surface the new column as null
    assert merged.filter(F.col("currency").isNull()).count() == 5

    # production path at 100 TB: declare the target schema instead of
    # paying a footer-merge over every file
    target = StructType(
        [
            StructField("id", LongType()),
            StructField("amount", DoubleType()),
            StructField("currency", StringType()),
        ]
    )
    declared = spark.read.schema(target).parquet(out)
    assert declared.count() == 8
    assert declared.filter(F.col("currency").isNull()).count() == 5


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    """With broadcast disabled (big-dim regime), Spark should inject a
    bloom_filter_agg built from the filtered orders side and apply
    might_contain on lineitem before its shuffle.  Uses the shared
    session fixture (a fresh builder here would race the repo's
    session factory config when this file runs alone)."""
    tuned = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}
    for k, v in tuned.items():
        spark.conf.set(k, v)
    try:
        from finance_etl_pipeline_spark.sources.readers import table

        li = table(spark, sf_dir, "lineitem")
        o = table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
        # the rewrite never changes the answer
        expected = (
            li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey).count()
        )
        assert j.collect()[0]["n"] == expected
    finally:
        # restore whatever session config the shared fixture expects
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
