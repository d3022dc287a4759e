"""table_diff classification correctness + pandas-UDF/expression
lockstep."""

from __future__ import annotations

from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.vectorized import (
    risk_score_expr,
    risk_score_udf,
)
from finance_etl_pipeline_spark.operators.diff import table_diff
from finance_etl_pipeline_spark.sources.readers import table


def test_table_diff_classifies_all_cases(spark, sf_dir):
    old = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    # new snapshot: drop keys %10==0, bump price for %3==0, add new keys
    kept = old.filter(F.col("o_orderkey") % 10 != 0)
    mutated = kept.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    added = spark.range(3).select(
        (F.col("id") + 10_000_000).alias("o_orderkey"),
        F.lit(1.0).alias("o_totalprice"),
        F.lit("5-LOW").alias("o_orderpriority"),
    )
    new = mutated.unionByName(added)

    d = table_diff(old, new, ["o_orderkey"])
    got = {r["change_type"]: r["n"] for r in
           d.groupBy("change_type").agg(F.count(F.lit(1)).alias("n")).collect()}

    n_old = old.count()
    n_removed = old.filter(F.col("o_orderkey") % 10 == 0).count()
    n_changed = old.filter(
        (F.col("o_orderkey") % 10 != 0) & (F.col("o_orderkey") % 3 == 0)
    ).count()
    assert got.get("removed", 0) == n_removed
    assert got.get("added", 0) == 3
    assert got.get("changed", 0) == n_changed
    assert got.get("unchanged", 0) == n_old - n_removed - n_changed
    # every key classified exactly once
    assert d.count() == d.select("o_orderkey").distinct().count()


def test_pandas_udf_matches_expression(spark, sf_dir):
    e = table(spark, sf_dir, "events").select("event_id", "value")
    both = e.select(
        "event_id",
        risk_score_udf("value").alias("s_udf"),
        risk_score_expr(F.col("value")).alias("s_expr"),
    )
    # same float math (log1p/exp on doubles) — agree to 1e-12
    bad = both.filter(
        F.abs(F.col("s_udf") - F.col("s_expr")) > 1e-12
    ).count()
    assert bad == 0
    lo_hi = both.agg(
        F.min("s_udf").alias("lo"), F.max("s_udf").alias("hi")
    ).collect()[0]
    assert 0.0 <= lo_hi["lo"] <= lo_hi["hi"] <= 1.0
