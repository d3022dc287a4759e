"""applyInPandas grouped-map verified against the builtin regr_slope."""

from __future__ import annotations

from pyspark.sql import functions as F

from finance_etl_pipeline_spark.operators.grouped import per_user_trend_pandas
from finance_etl_pipeline_spark.sources.readers import table


def test_pandas_slope_matches_builtin_regr_slope(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    got = {r.user_id: (r.n, r.slope) for r in per_user_trend_pandas(e).collect()}
    exp = {
        r.user_id: (r.n, r.slope)
        for r in e.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.expr("regr_slope(value, cast(ts as double))").alias("slope"),
        )
        .collect()
    }
    assert set(got) == set(exp)
    for uid, (n, slope) in exp.items():
        assert got[uid][0] == n
        if slope is None:
            assert got[uid][1] is None
        else:
            assert abs(got[uid][1] - slope) < 1e-6 * max(1.0, abs(slope))
