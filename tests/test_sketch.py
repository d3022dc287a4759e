"""Misra-Gries sketch vs exact corpus frequencies.

Checks the two guarantees that make the sketch usable as the
heavy-hitter scale path (operators/sketch.py):

1. soundness of the bound: for every sketched token,
   true - N/k <= est <= true;
2. completeness: every token with true frequency > N/k appears in
   the merged sketch (the heavy-hitter guarantee survives the
   per-partition merge).
"""

import os

from pyspark.sql import functions as F

from finance_etl_pipeline_spark.operators.dedup import tokens_expr
from finance_etl_pipeline_spark.operators.sketch import mg_heavy_hitters
from finance_etl_pipeline_spark.sources.readers import table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_misra_gries_bounds_and_completeness(spark):
    docs = table(spark, SF_DIR, "documents")
    toks = docs.select(F.explode(tokens_expr()).alias("token")).repartition(8)
    k = 64

    exact = {
        r["token"]: r["cnt"]
        for r in toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    n_total = sum(exact.values())
    est = {r["token"]: r["est"] for r in mg_heavy_hitters(toks, k=k).collect()}
    assert est, "sketch produced no counters"

    slack = n_total / k
    for tok, e in est.items():
        true = exact[tok]
        assert e <= true, f"{tok}: est {e} overshoots true {true}"
        assert e >= true - slack, f"{tok}: est {e} below true-N/k {true - slack}"

    heavy = {t for t, c in exact.items() if c > slack}
    missing = heavy - set(est)
    assert not missing, f"heavy hitters absent from sketch: {missing}"


def test_count_min_sketch_bounds(spark):
    """Spark's built-in Count-Min sketch (the `count_min_sketch` SQL
    aggregate — mergeable binary state, probed here through the JVM
    sketch library since PySpark exposes no estimator): point
    estimates are never UNDER the true count and stay within eps*N
    above it — the complementary guarantee to Misra-Gries
    (MG: est <= true; CMS: est >= true)."""
    docs = table(spark, SF_DIR, "documents")
    toks = docs.select(F.explode(tokens_expr()).alias("token"))
    eps = 0.005
    sk_bytes = toks.agg(
        F.expr(f"count_min_sketch(token, {eps}d, 0.99d, 42)").alias("sk")
    ).collect()[0]["sk"]
    jvm = spark._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytearray(sk_bytes))
    )

    exact = {
        r["token"]: r["cnt"]
        for r in toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    n_total = sum(exact.values())
    overshoot_budget = eps * n_total
    for tok, true in exact.items():
        est = cms.estimateCount(tok)
        assert est >= true, f"{tok}: CMS underestimated {est} < {true}"
        assert est <= true + overshoot_budget, (
            f"{tok}: CMS overshoot {est - true} > eps*N {overshoot_budget}"
        )


def test_categorical_profile_sketch_bounds(spark):
    """categorical_profile_sketch vs the exact profile on a
    HIGH-cardinality column (o_custkey): top1_est is a floor within
    N/k of the true top-1 count, the share floor follows, and the HLL
    cardinality lands within 4 standard errors of exact.  On a
    low-cardinality column (o_orderpriority, |values| <= k) the MG
    path degrades to EXACT."""
    from finance_etl_pipeline_spark.operators.sketch import (
        categorical_profile_sketch,
    )

    orders = table(spark, SF_DIR, "orders")
    k, rsd = 64, 0.05

    # high-cardinality: bounds
    prof = categorical_profile_sketch(orders, "o_custkey", k=k, rsd=rsd).first()
    exact = (
        orders.where(F.col("o_custkey").isNotNull())
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.count(F.lit(1)).alias("nv"), F.max("cnt").alias("top1"),
             F.sum("cnt").alias("n"))
        .first()
    )
    assert prof.n_rows == exact.n
    assert prof.top1_est <= exact.top1
    assert prof.top1_est >= exact.top1 - exact.n / k
    assert abs(prof.n_values_approx - exact.nv) <= 4 * rsd * exact.nv
    assert prof.top1_share_e6 <= int(exact.top1 / exact.n * 1_000_000) + 1

    # low-cardinality: exact degradation
    prof_lo = categorical_profile_sketch(
        orders, "o_orderpriority", k=k, rsd=rsd
    ).first()
    top_lo = (
        orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.max("cnt"))
        .first()[0]
    )
    assert prof_lo.top1_est == top_lo
