"""The in-plan normal-equations OLS must agree with numpy lstsq.

Oracle parity proves Spark and DuckDB evaluate the same Cramer
expression tree; this proves that tree actually solves the least-
squares problem (coefficients match an independent QR-based solver)
and that the single-row result comes from one aggregation pass.
"""

from __future__ import annotations

import numpy as np

from finance_etl_pipeline_spark.plans import all_queries
from finance_etl_pipeline_spark.sources.readers import table


def test_ols_matches_numpy_lstsq(spark, sf_dir):
    row = (
        all_queries()["r_ols_normal_equations"].fn(spark, sf_dir).collect()
    )
    assert len(row) == 1
    got = row[0]

    li = table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_discount", "l_extendedprice"
    )
    pdf = li.toPandas().astype(float)
    X = np.column_stack(
        [np.ones(len(pdf)), pdf.l_quantity.values, pdf.l_discount.values]
    )
    y = pdf.l_extendedprice.values
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    pred = X @ beta
    r2 = 1.0 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()

    assert got.n_obs == len(pdf)
    assert abs(got.beta_intercept_e4 / 1e4 - beta[0]) < 1e-3
    assert abs(got.beta_quantity_e4 / 1e4 - beta[1]) < 1e-3
    assert abs(got.beta_discount_e4 / 1e4 - beta[2]) < 1e-3
    assert abs(got.r2_e6 / 1e6 - r2) < 1e-5
    # extendedprice is dominated by per-part price variation, so the
    # quantity/discount fit is weak — but r2 must still be a valid ratio
    assert 0.0 <= got.r2_e6 / 1e6 < 1.0
