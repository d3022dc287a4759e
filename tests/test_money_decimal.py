"""Decimal money mode: exact cents where double drifts."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.money import MONEY, as_decimal_money


def test_decimal_sum_is_exact_where_double_drifts(spark):
    # 1M × 0.1 : double accumulates binary error, decimal does not
    df = spark.range(1_000_000).select(
        F.lit("g").alias("k"), F.lit(0.1).alias("amount")
    )
    double_sum = df.agg(F.sum("amount")).first()[0]
    dec_sum = (
        as_decimal_money(df, ["amount"]).agg(F.sum("amount")).first()[0]
    )
    assert dec_sum == Decimal("100000.0000")
    assert double_sum != 100000.0  # the drift decimal mode exists for


def test_decimal_pivot_keeps_scale(spark):
    df = spark.createDataFrame(
        [("a", "X", 1.115), ("a", "Y", 2.225), ("b", "X", 3.335)],
        "entity string, t string, amount double",
    )
    wide = (
        as_decimal_money(df, ["amount"])
        .groupBy("entity")
        .pivot("t", ["X", "Y"])
        .sum("amount")
    )
    for field in wide.schema.fields[1:]:
        # sum over decimal widens precision but keeps the scale
        assert field.dataType.scale == MONEY.scale
