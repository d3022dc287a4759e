"""Built-in linear-regression aggregates (regr_slope / regr_intercept
/ corr) — beyond-reference statistical surface, per-user value trends
over time. The applyInPandas twin of this computation lives in
operators/grouped.py (verified equal in tests/test_grouped_pandas.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import table


@register(
    "a_regression_trend",
    """
    SELECT user_id,
           count(*) AS n,
           CAST(floor(regr_slope(value, epoch(ts)) * 1000000000000 + 0.5001) AS BIGINT) AS slope_e12,
           CAST(floor(corr(value, epoch(ts)) * 1000000 + 0.5001) AS BIGINT) AS time_corr_e6
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    "agg",
    "stats",
)
def a_regression_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS slope + correlation of value against event time.
    Spark `cast(ts as double)` == DuckDB `epoch(ts)` (epoch seconds
    with fractional microseconds). Slopes are ~1e-5 (value units per
    second), so they quantize at 1e-12; corr at 1e-6."""
    from finance_etl_pipeline_spark.functions.scalars import igrid

    e = table(spark, sf_dir, "events")
    ts_sec = F.col("ts").cast("double")
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            igrid(
                F.expr("regr_slope(value, cast(ts as double))"), 12
            ).alias("slope_e12"),
            igrid(F.corr("value", ts_sec), 6).alias("time_corr_e6"),
        )
        .orderBy("user_id")
    )


# --- multi-feature OLS via normal equations, solved inside the plan ---
#
# Revenue ~ intercept + quantity + discount over lineitem.  ONE pass
# computes every moment the 3×3 normal system needs (count + 9 sums,
# all map-side partial-aggregated — the shuffle moves one row per
# partition); the solve is Cramer's rule written as plain column
# expressions over that single aggregate row.  Nothing is collected:
# the "model fit" is itself a Catalyst plan, so at 100 TB this is one
# scan + a 10-double exchange.  The SAME formula text is evaluated by
# Spark (F.expr) and DuckDB, so both engines run an identical IEEE
# expression tree over their (ULP-close) sums; fround(4) on the
# coefficients absorbs the summation-order noise.

_OLS_SUMS = """
      count(*)::DOUBLE AS n,
      sum(x1) AS sx1, sum(x2) AS sx2, sum(y) AS sy,
      sum(x1 * x1) AS s11, sum(x1 * x2) AS s12, sum(x2 * x2) AS s22,
      sum(x1 * y) AS s1y, sum(x2 * y) AS s2y, sum(y * y) AS syy
"""

_DET = (
    "(n * (s11 * s22 - s12 * s12) - sx1 * (sx1 * s22 - s12 * sx2)"
    " + sx2 * (sx1 * s12 - s11 * sx2))"
)
_DET0 = (
    "(sy * (s11 * s22 - s12 * s12) - sx1 * (s1y * s22 - s12 * s2y)"
    " + sx2 * (s1y * s12 - s11 * s2y))"
)
_DET1 = (
    "(n * (s1y * s22 - s12 * s2y) - sy * (sx1 * s22 - s12 * sx2)"
    " + sx2 * (sx1 * s2y - s1y * sx2))"
)
_DET2 = (
    "(n * (s11 * s2y - s1y * s12) - sx1 * (sx1 * s2y - s1y * sx2)"
    " + sy * (sx1 * s12 - s11 * sx2))"
)
_SSE = f"(syy - ({_DET0} * sy + {_DET1} * s1y + {_DET2} * s2y) / {_DET})"
_SST = "(syy - sy * sy / n)"


def _ols_outputs() -> dict[str, str]:
    from finance_etl_pipeline_spark.functions.scalars import sql_igrid

    return {
        "n_obs": "CAST(n AS BIGINT)",
        "beta_intercept_e4": sql_igrid(f"{_DET0} / {_DET}", 4),
        "beta_quantity_e4": sql_igrid(f"{_DET1} / {_DET}", 4),
        "beta_discount_e4": sql_igrid(f"{_DET2} / {_DET}", 4),
        "r2_e6": sql_igrid(f"1.0 - {_SSE} / {_SST}", 6),
    }


@register(
    "r_ols_normal_equations",
    f"""
    WITH obs AS (
      SELECT l_quantity::DOUBLE AS x1, l_discount::DOUBLE AS x2,
             l_extendedprice::DOUBLE AS y
      FROM lineitem
    ),
    sums AS (SELECT {_OLS_SUMS} FROM obs)
    SELECT {', '.join(f'{e} AS {a}' for a, e in _ols_outputs().items())}
    FROM sums
    """,
    "regression",
    "stats",
)
def r_ols_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS fit of extendedprice ~ quantity + discount, solved by
    Cramer's rule as column expressions over a one-row aggregate —
    the distributed normal-equations pattern (single scan, 10-double
    shuffle, no driver-side math)."""
    li = table(spark, sf_dir, "lineitem")
    obs = li.select(
        F.col("l_quantity").cast("double").alias("x1"),
        F.col("l_discount").cast("double").alias("x2"),
        F.col("l_extendedprice").cast("double").alias("y"),
    )
    sums = obs.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return sums.select(
        *[F.expr(e).alias(a) for a, e in _ols_outputs().items()]
    )


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _corr_pairs():
    cols = _CORR_COLS
    return [
        (cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]


@register(
    "a_corr_matrix",
    " UNION ALL ".join(
        f"""
    SELECT '{a}' AS col_a, '{b}' AS col_b,
           CAST(floor(corr({a}, {b}) * 1000000 + 0.5001) AS BIGINT) AS corr_e6
    FROM lineitem
    """
        for a, b in _corr_pairs()
    )
    + " ORDER BY col_a, col_b",
    "agg",
    "stats",
)
def a_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the fact table's
    numeric columns — the feature-screening pass before any model
    touches the data.  Spark computes ALL six pairs in ONE aggregate
    over ONE scan (the oracle states it portably as a per-pair
    UNION); at 100 TB that single-pass shape is the difference
    between one shuffle of partial moments and six table scans.
    Correlations land on the e6 integer grid."""
    from finance_etl_pipeline_spark.functions.scalars import igrid

    li = table(spark, sf_dir, "lineitem")
    wide = li.agg(
        *[
            igrid(F.corr(a, b), 6).alias(f"{a}__{b}")
            for a, b in _corr_pairs()
        ]
    )
    stack_args = ", ".join(
        f"'{a}', '{b}', {a}__{b}" for a, b in _corr_pairs()
    )
    return wide.selectExpr(
        f"stack({len(_corr_pairs())}, {stack_args}) AS (col_a, col_b, corr_e6)"
    ).orderBy("col_a", "col_b")


@register(
    "a_higher_moments",
    f"""
    WITH sums AS (
      SELECT event_type,
             count(*) AS n,
             sum(value) AS s1,
             sum(value * value) AS s2,
             sum(value * value * value) AS s3,
             sum(value * value * value * value) AS s4
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type
    ),
    mom AS (
      SELECT event_type, n,
             s1 / n AS m1,
             s2 / n - (s1 / n) * (s1 / n) AS m2,
             s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
             s4 / n - 4 * (s1 / n) * (s3 / n)
                    + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                    - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
      FROM sums
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(floor(m1 * 10000 + 0.5001) AS BIGINT) AS mean_e4,
           CAST(floor(m3 / pow(m2, 1.5) * 1000000 + 0.5001) AS BIGINT) AS skewness_e6,
           CAST(floor((m4 / (m2 * m2) - 3) * 1000000 + 0.5001) AS BIGINT) AS excess_kurtosis_e6
    FROM mom ORDER BY event_type
    """,
    "agg",
    "stats",
)
def a_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis per series, computed
    from raw power sums (Σx..Σx⁴) through ONE explicit moment
    expression tree — deliberately NOT the built-in skewness()/
    kurtosis() aggregates, whose bias corrections differ between
    engines (Spark emits population moments, DuckDB sample-corrected
    ones); stating the algebra once makes the contract portable and
    auditable.  One map-side-combined aggregate pass."""
    from finance_etl_pipeline_spark.functions.scalars import igrid

    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = F.col("value")
    sums = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
        F.sum(v * v * v).alias("s3"),
        F.sum(v * v * v * v).alias("s4"),
    )
    m1 = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - m1 * m1
    m3 = F.col("s3") / F.col("n") - 3 * m1 * (F.col("s2") / F.col("n")) + 2 * m1 * m1 * m1
    m4 = (
        F.col("s4") / F.col("n")
        - 4 * m1 * (F.col("s3") / F.col("n"))
        + 6 * m1 * m1 * (F.col("s2") / F.col("n"))
        - 3 * m1 * m1 * m1 * m1
    )
    return (
        sums.select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            igrid(m1, 4).alias("mean_e4"),
            igrid(m3 / F.pow(m2, 1.5), 6).alias("skewness_e6"),
            igrid(m4 / (m2 * m2) - 3, 6).alias("excess_kurtosis_e6"),
        )
        .orderBy("event_type")
    )
