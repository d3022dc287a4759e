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


# ---------------------------------------------------------------------------
# run_month money_mode="decimal" — the pipeline-surface promotion
# (round-2 verdict item 5)
# ---------------------------------------------------------------------------

MONTH = "2025-12"


def _kpi_cents(spark, path):
    """KPI rows as {(entity, month): (cents, ...)} — exact integers, so
    a double/decimal comparison can't hide behind float tolerance."""
    kpi = spark.read.parquet(path)
    money_cols = [
        "Asset", "COGS", "Expense", "Liability", "Revenue",
        "gross_profit", "operating_profit",
    ]
    rows = kpi.select(
        "entity",
        "month",
        *[
            F.rint(F.col(c).cast("double") * 100).cast("long").alias(c)
            for c in money_cols
        ],
    ).collect()
    return {(r.entity, r.month): tuple(r[c] for c in money_cols) for r in rows}


def test_run_month_decimal_mode_cent_identical_to_double(spark, tmp_path):
    """Same seed-42 fixture through both money modes: every KPI cell and
    every fact amount_base must agree to the cent.  Double mode is the
    reference-golden-verified path (tests/test_reference_golden.py), so
    equality here chains decimal mode to the committed goldens."""
    import os

    from finance_etl_pipeline_spark import sample_data
    from finance_etl_pipeline_spark.pipeline import run_month

    raw, ref = str(tmp_path / "raw"), str(tmp_path / "ref")
    sample_data.generate_raw(raw, MONTH, seed=42)
    sample_data.generate_reference(ref)

    out_d = str(tmp_path / "curated_double")
    out_x = str(tmp_path / "curated_decimal")
    res_d = run_month(spark, MONTH, raw, out_d, ref)
    res_x = run_month(spark, MONTH, raw, out_x, ref, money_mode="decimal")
    assert res_d.status == res_x.status == "PASS"

    kpi_d = _kpi_cents(spark, res_d.paths["kpi_monthly"])
    kpi_x = _kpi_cents(spark, res_x.paths["kpi_monthly"])
    assert kpi_d == kpi_x and len(kpi_d) == 2

    # decimal mode's output typing: money columns are exact decimals
    from pyspark.sql.types import DecimalType

    fact_x = spark.read.parquet(res_x.paths["fact_transactions"])
    assert isinstance(fact_x.schema["amount_base"].dataType, DecimalType)
    kpi_schema = spark.read.parquet(res_x.paths["kpi_monthly"]).schema
    assert isinstance(kpi_schema["gross_profit"].dataType, DecimalType)

    # fact parity at the txn_id grain (txn_id can repeat — e.g. two
    # inventory movements of one sku on one day — so compare per-key
    # sums and counts, not a row join)
    def per_key(df, cents_col):
        return df.groupBy("txn_id").agg(
            F.sum(cents_col).alias("cents"), F.count(F.lit(1)).alias("n")
        )

    fact_d = spark.read.parquet(res_d.paths["fact_transactions"])
    agg_d = per_key(
        fact_d, F.rint(F.col("amount_base") * 100).cast("long")
    )
    agg_x = per_key(
        fact_x,
        F.rint(F.col("amount_base").cast("double") * 100).cast("long"),
    )
    joined = agg_d.alias("d").join(agg_x.alias("x"), "txn_id", "full_outer")
    diff = joined.filter(
        (F.col("d.cents") != F.col("x.cents"))
        | (F.col("d.n") != F.col("x.n"))
        | F.col("d.cents").isNull()
        | F.col("x.cents").isNull()
    )
    assert diff.count() == 0

    # metrics observation works on decimal sums too
    assert res_x.metrics["fact_rows"] == res_d.metrics["fact_rows"] > 100
    assert abs(
        res_x.metrics["fact_amount_base_total"]
        - res_d.metrics["fact_amount_base_total"]
    ) < 0.01


def test_decimal_mode_flows_through_star_and_bi_exports(spark, tmp_path):
    """Round-3 verdict item 6: star/BI exports downstream of a decimal
    run_month must keep DecimalType money columns end to end and stay
    cent-identical to the double-mode export (which is chained to the
    committed reference goldens by test_reference_golden.py)."""
    from pyspark.sql.types import DecimalType, DoubleType

    from finance_etl_pipeline_spark import export_bi, sample_data, star
    from finance_etl_pipeline_spark.pipeline import run_month

    raw, ref = str(tmp_path / "raw"), str(tmp_path / "ref")
    sample_data.generate_raw(raw, MONTH, seed=42)
    sample_data.generate_reference(ref)

    stars = {}
    for mode in ("double", "decimal"):
        out = str(tmp_path / f"curated_{mode}")
        res = run_month(spark, MONTH, raw, out, ref, money_mode=mode)
        assert res.status == "PASS"
        fact = spark.read.parquet(res.paths["fact_transactions"])
        kpi = spark.read.parquet(res.paths["kpi_monthly"])
        coa = spark.read.parquet(res.paths["dim_accounts"])
        stars[mode] = star.export_star(fact, kpi, coa)
        # flat BI export runs on the same curated dir without error
        bi_out = str(tmp_path / f"bi_{mode}")
        paths = export_bi.export_bi_datasets(spark, out, bi_out, MONTH)
        assert "kpi_monthly" in paths

    # typing: money stays decimal, margins stay double ratios
    kpi_x = stars["decimal"]["fact_kpi_monthly"]
    for c in ("Revenue", "COGS", "Expense", "gross_profit", "operating_profit"):
        assert isinstance(kpi_x.schema[c].dataType, DecimalType), c
    for c in ("gross_margin_pct", "operating_margin_pct"):
        assert isinstance(kpi_x.schema[c].dataType, DoubleType), c
    assert isinstance(
        stars["decimal"]["fact_gl"].schema["amount"].dataType, DecimalType
    )

    # cent-identical KPI facts between modes (entity_key is the same
    # sequential surrogate in both: same entity set, same sort)
    def kpi_cents(tabs):
        rows = tabs["fact_kpi_monthly"].select(
            "month_key",
            "entity_key",
            *[
                F.rint(F.col(c).cast("double") * 100).cast("long").alias(c)
                for c in ("Revenue", "COGS", "Expense",
                          "gross_profit", "operating_profit")
            ],
            F.round("gross_margin_pct", 9).alias("gm"),
            F.round("operating_margin_pct", 9).alias("om"),
        ).collect()
        return {(r.month_key, r.entity_key): tuple(r)[2:] for r in rows}

    assert kpi_cents(stars["double"]) == kpi_cents(stars["decimal"])

    # cent-identical GL totals per (entity_key, account_key)
    def gl_cents(tabs):
        rows = (
            tabs["fact_gl"]
            .groupBy("entity_key", "account_key")
            .agg(
                F.sum(
                    F.rint(F.col("amount").cast("double") * 100).cast("long")
                ).alias("cents"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        return {(r.entity_key, r.account_key): (r.cents, r.n) for r in rows}

    assert gl_cents(stars["double"]) == gl_cents(stars["decimal"])


def test_run_month_rejects_bad_money_mode(spark, tmp_path):
    import pytest

    from finance_etl_pipeline_spark.pipeline import run_month

    with pytest.raises(ValueError, match="invalid money_mode"):
        run_month(
            spark, MONTH, "x", "y", "z", money_mode="float128"
        )
