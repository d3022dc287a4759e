"""percentile_approx must track the exact percentiles within the GK
sketch's rank-error bound (1/accuracy of the value distribution)."""

from __future__ import annotations

from finance_etl_pipeline_spark.plans import all_queries


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    qs = all_queries()
    exact = {
        r.l_returnflag: (r.p50_e4, r.p95_e4)
        for r in qs["a_percentiles"].fn(spark, sf_dir).collect()
    }
    approx = {
        r.l_returnflag: (r.p50_e4, r.p95_e4)
        for r in qs["a_percentiles_approx"].fn(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for flag, (p50, p95) in exact.items():
        a50, a95 = approx[flag]
        # 1e-4 rank error on a [~900, ~105k] value range: allow 2%
        assert abs(a50 - p50) <= 0.02 * p50, (flag, p50, a50)
        assert abs(a95 - p95) <= 0.02 * p95, (flag, p95, a95)
