"""Star-schema export: key integrity, relationships, margin math."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finance_etl_pipeline_spark import sample_data, star
from finance_etl_pipeline_spark.pipeline import run_month

MONTH = "2025-12"


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("star")
    raw, ref, out = str(root / "raw"), str(root / "ref"), str(root / "out")
    sample_data.generate_raw(raw, MONTH, seed=7)
    sample_data.generate_reference(ref)
    res = run_month(spark, MONTH, raw, out, ref)
    fact = spark.read.parquet(res.paths["fact_transactions"])
    kpi = spark.read.parquet(res.paths["kpi_monthly"])
    coa = spark.read.parquet(res.paths["dim_accounts"])
    return star.export_star(fact, kpi, coa), fact


def test_dim_keys_unique_and_sequential(tables):
    tabs, _ = tables
    for name, key in [("dim_entity", "entity_key"), ("dim_account", "account_key")]:
        df = tabs[name]
        n = df.count()
        assert df.select(key).distinct().count() == n
        assert df.agg(F.min(key)).first()[0] == 1
        assert df.agg(F.max(key)).first()[0] == n


def test_fact_gl_joins_resolve(tables):
    tabs, fact = tables
    gl = tabs["fact_gl"]
    assert gl.count() == fact.count()
    assert gl.filter(F.col("entity_key").isNull()).count() == 0
    assert gl.filter(F.col("account_key").isNull()).count() == 0
    # every fact_gl date_key exists in dim_date
    missing = gl.join(tabs["dim_date"], "date_key", "left_anti")
    assert missing.count() == 0


def test_dim_month_rollup(tables):
    tabs, _ = tables
    dm = tabs["dim_month"].collect()
    assert len(dm) == 1  # single-month run
    assert dm[0].month_label == MONTH


def test_kpi_fact_margins(tables):
    tabs, _ = tables
    for r in tabs["fact_kpi_monthly"].collect():
        if r.Revenue:
            assert abs(r.gross_margin_pct - round(r.gross_profit / r.Revenue * 100, 2)) < 0.02
