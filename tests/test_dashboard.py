"""Dashboard dataset builders over a real pipeline run."""

from __future__ import annotations

import pytest

from finance_etl_pipeline_spark import dashboard, sample_data
from finance_etl_pipeline_spark.pipeline import run_month

MONTH = "2025-12"


@pytest.fixture(scope="module")
def curated(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("dash")
    raw, ref, out = str(root / "raw"), str(root / "ref"), str(root / "out")
    sample_data.generate_raw(raw, MONTH, seed=11)
    sample_data.generate_reference(ref)
    res = run_month(spark, MONTH, raw, out, ref)
    return {
        "fact": spark.read.parquet(res.paths["fact_transactions"]),
        "kpi": spark.read.parquet(res.paths["kpi_monthly"]),
        "dim": spark.read.parquet(res.paths["dim_accounts"]),
    }


def test_top_entities_and_trend(spark, curated):
    top = dashboard.top_entities_by_revenue(curated["kpi"], n=8)
    rows = top.collect()
    assert 0 < len(rows) <= 8
    assert rows == sorted(rows, key=lambda r: (-r.total_revenue, r.entity))
    trend = dashboard.revenue_trend(curated["kpi"], top)
    assert trend.count() >= len(rows)


def test_top_expense_accounts(spark, curated):
    top = dashboard.top_expense_accounts(curated["fact"], curated["dim"])
    rows = top.collect()
    assert 0 < len(rows) <= 15
    assert all(" - " in r.account for r in rows)
    assert all(r.total_expense > 0 for r in rows)


def test_kpi_month_table_has_margins(spark, curated):
    table = dashboard.kpi_month_table(curated["kpi"], MONTH)
    assert "gross_margin_pct" in table.columns
    assert table.count() == 2


def test_render_dashboard_html(spark, curated, tmp_path):
    out = dashboard.render_dashboard(
        kpi=curated["kpi"],
        fact=curated["fact"],
        dim_accounts=curated["dim"],
        dq_summary=None,
        dq_exceptions=None,
        month=MONTH,
        out_path=str(tmp_path / "dash" / "dashboard.html"),
    )
    html = open(out, encoding="utf-8").read()
    assert "<!doctype html>" in html
    assert "Finance Monthly Close Dashboard" in html
    # real charts rendered: one line chart per KPI series + expense bars
    assert html.count("<svg") >= 3
    assert "Revenue by Entity" in html
    assert "Top Expense Accounts" in html
    # KPI table carries the margin-enriched columns
    assert "gross_margin_pct" in html
