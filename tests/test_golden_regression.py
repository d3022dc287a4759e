"""Golden-snapshot regression: the seed-42 2025-12 KPI output of OUR
fixture generator must stay stable across refactors.  (Parity with
the reference repo's committed goldens is the stronger check in
tests/test_reference_golden.py, via the NumPy draw-twin fixture.)"""

from __future__ import annotations

import json
import os

import pytest

from finance_etl_pipeline_spark import sample_data
from finance_etl_pipeline_spark.pipeline import run_month

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "kpi_2025-12_seed42.json")
MONTH = "2025-12"


def _kpi_rows(spark, tmp_path):
    raw, ref, out = (str(tmp_path / d) for d in ("raw", "ref", "out"))
    sample_data.generate_raw(raw, MONTH, seed=42)
    sample_data.generate_reference(ref)
    res = run_month(spark, MONTH, raw, out, ref)
    kpi = spark.read.parquet(res.paths["kpi_monthly"])
    rows = sorted(
        (
            {k: r[k] for k in ("entity", "month", "Revenue", "COGS", "Expense",
                               "gross_profit", "operating_profit")}
            for r in kpi.collect()
        ),
        key=lambda d: d["entity"],
    )
    return rows


def test_kpi_matches_committed_golden(spark, tmp_path):
    rows = _kpi_rows(spark, tmp_path)
    if not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            json.dump(rows, f, indent=1)
        pytest.skip("golden written on first run — commit it")
    with open(GOLDEN) as f:
        golden = json.load(f)
    assert len(rows) == len(golden)
    for got, exp in zip(rows, golden):
        assert got["entity"] == exp["entity"]
        for k in ("Revenue", "COGS", "Expense", "gross_profit", "operating_profit"):
            assert abs(got[k] - exp[k]) < 0.01, (got["entity"], k, got[k], exp[k])
