"""BI export round-trip + skew-helper equivalence tests."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from finance_etl_pipeline_spark import sample_data
from finance_etl_pipeline_spark.export_bi import export_bi_datasets
from finance_etl_pipeline_spark.operators.skew import (
    salted_aggregate,
    salted_left_join,
)
from finance_etl_pipeline_spark.pipeline import run_month
from finance_etl_pipeline_spark.sources.readers import table

MONTH = "2025-12"


def test_export_bi_round_trip(spark, tmp_path):
    raw, ref, cur, bi = (str(tmp_path / d) for d in ("raw", "ref", "cur", "bi"))
    sample_data.generate_raw(raw, MONTH, seed=3)
    sample_data.generate_reference(ref)
    run_month(spark, MONTH, raw, cur, ref)
    paths = export_bi_datasets(spark, cur, bi)
    assert os.path.exists(paths["data_dictionary"])
    kpi = spark.read.option("header", "true").csv(paths["kpi_monthly"])
    assert "gross_margin_pct" in kpi.columns
    assert kpi.count() == 2
    fact = spark.read.option("header", "true").csv(paths["fact_transactions"])
    months = fact.select(F.substring("date", 1, 7).alias("m")).distinct().collect()
    assert [r.m for r in months] == [MONTH]


def test_salted_aggregate_equals_plain(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    plain = {
        r.l_returnflag: (round(r.s, 2), r.n)
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_extendedprice").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    salted = {
        r.l_returnflag: (round(r.s, 2), r.n)
        for r in salted_aggregate(
            li,
            ["l_returnflag"],
            [F.sum("l_extendedprice").alias("s"), F.count("*").alias("n")],
            [F.sum("s").alias("s"), F.sum("n").alias("n")],
        ).collect()
    }
    assert plain == salted


def test_salted_left_join_equals_plain(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_linenumber")
    part = table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    plain = li.join(part, "l_partkey", "left")
    salted = salted_left_join(li, part, "l_partkey")
    key = lambda r: (r.l_orderkey, r.l_linenumber, r.l_partkey, r.p_brand)  # noqa: E731
    assert sorted(map(key, plain.collect())) == sorted(map(key, salted.collect()))
