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
