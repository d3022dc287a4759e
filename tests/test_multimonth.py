"""Multi-month runs: partitioned layout + partition pruning + dynamic
single-month overwrite semantics."""

from __future__ import annotations

import contextlib
import io
import os

from pyspark.sql import functions as F

from finance_etl_pipeline_spark import sample_data
from finance_etl_pipeline_spark.pipeline import run_months


def test_run_months_partitioned_and_pruned(spark, tmp_path):
    ref = str(tmp_path / "ref")
    sample_data.generate_reference(ref)
    months = ["2025-11", "2025-12"]
    raws = {}
    for i, m in enumerate(months):
        raw = str(tmp_path / f"raw_{m}")
        sample_data.generate_raw(raw, m, seed=20 + i)
        raws[m] = raw

    cur = str(tmp_path / "cur")
    # months come from different raw dirs → run one at a time
    for m in months:
        run_months(spark, [m], raws[m], cur, ref)

    fact = spark.read.parquet(os.path.join(cur, "fact_transactions_by_month"))
    got_months = sorted(r.month for r in fact.select("month").distinct().collect())
    assert got_months == months  # dynamic overwrite kept both partitions

    # a month filter must become partition pruning, not a scan filter
    filtered = fact.filter(F.col("month") == "2025-12")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        filtered.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [isnotnull(month" in plan

    # physical layout: one directory per month
    dirs = {
        d
        for d in os.listdir(os.path.join(cur, "fact_transactions_by_month"))
        if d.startswith("month=")
    }
    assert dirs == {"month=2025-11", "month=2025-12"}


def test_run_months_decimal_mode_propagates(spark, tmp_path):
    """money_mode threads through run_months: the month-partitioned
    curated fact keeps DecimalType money columns and exact cents."""
    from decimal import Decimal

    from pyspark.sql.types import DecimalType

    ref = str(tmp_path / "ref")
    sample_data.generate_reference(ref)
    raw = str(tmp_path / "raw_dec")
    sample_data.generate_raw(raw, "2025-12", seed=7)
    cur = str(tmp_path / "cur_dec")
    res = run_months(spark, ["2025-12"], raw, cur, ref, money_mode="decimal")
    assert res["2025-12"].status == "PASS"
    fact = spark.read.parquet(os.path.join(cur, "fact_transactions_by_month"))
    assert isinstance(fact.schema["amount_base"].dataType, DecimalType)
    total = fact.agg(F.sum("amount_base")).first()[0]
    assert isinstance(total, Decimal)
    # exact-cents invariant: the decimal sum has no sub-cent residue
    assert (total * 100) == int(total * 100)


def test_kpi_cube_subtotals_consistent(spark, tmp_path):
    """kpi_cube = the finance KPI with grouping machinery: detail
    cells match kpi_monthly exactly; entity/month/grand subtotals are
    the sums of their details (profits recomputed at each level); the
    ALL markers come from grouping(), giving (E+1)x(M+1) rows."""
    from finance_etl_pipeline_spark import sample_data
    from finance_etl_pipeline_spark.pipeline import run_months
    from finance_etl_pipeline_spark.transform import kpi_cube, kpi_monthly

    ref = str(tmp_path / "ref")
    sample_data.generate_reference(ref)
    months = ["2025-11", "2025-12"]
    cur = str(tmp_path / "cur")
    for i, m in enumerate(months):
        raw = str(tmp_path / f"raw_{m}")
        sample_data.generate_raw(raw, m, seed=20 + i)
        run_months(spark, [m], raw, cur, ref)

    fact = spark.read.parquet(
        os.path.join(cur, "fact_transactions_by_month")
    ).drop("month")
    accounts = spark.read.parquet(
        os.path.join(cur, "by_month_staging", months[-1], "dim_accounts")
    )

    cube = kpi_cube(fact, accounts).cache()
    detail = cube.filter((F.col("entity") != "ALL") & (F.col("month") != "ALL"))
    monthly = kpi_monthly(fact, accounts)

    # detail cells == the reference KPI table, cell for cell
    joined = detail.alias("c").join(
        monthly.alias("k"), ["entity", "month"], "full_outer"
    )
    assert joined.count() == detail.count() == monthly.count()
    mismatch = joined.filter(
        (F.abs(F.col("c.Revenue") - F.col("k.Revenue")) > 1e-9)
        | (F.abs(F.col("c.gross_profit") - F.col("k.gross_profit")) > 1e-9)
        | (F.abs(F.col("c.operating_profit") - F.col("k.operating_profit")) > 1e-9)
    )
    assert mismatch.count() == 0

    # shape: every combo present -> (E+1)*(M+1) rows
    n_e = detail.select("entity").distinct().count()
    n_m = detail.select("month").distinct().count()
    assert n_m == 2
    assert cube.count() == (n_e + 1) * (n_m + 1)

    # subtotals are sums of their details; profits recomputed, not
    # summed-rounded (identity must hold at every level)
    for where in [
        (F.col("entity") != "ALL") & (F.col("month") == "ALL"),
        (F.col("entity") == "ALL") & (F.col("month") != "ALL"),
        (F.col("entity") == "ALL") & (F.col("month") == "ALL"),
    ]:
        sub = cube.filter(where)
        bad = sub.filter(
            F.abs(
                F.col("gross_profit")
                - F.bround(F.col("Revenue") + F.col("COGS"), 2)
            )
            > 0.011
        )
        assert bad.count() == 0
    grand = cube.filter(
        (F.col("entity") == "ALL") & (F.col("month") == "ALL")
    ).collect()
    assert len(grand) == 1
    detail_rev = detail.agg(F.sum("Revenue")).first()[0]
    assert abs(grand[0].Revenue - detail_rev) < 1e-6

    ent_sub = {
        r.entity: r.Revenue
        for r in cube.filter(
            (F.col("entity") != "ALL") & (F.col("month") == "ALL")
        ).collect()
    }
    ent_detail = {
        r.entity: r.s
        for r in detail.groupBy("entity").agg(F.sum("Revenue").alias("s")).collect()
    }
    for e, v in ent_detail.items():
        assert abs(ent_sub[e] - v) < 1e-6
    cube.unpersist()
