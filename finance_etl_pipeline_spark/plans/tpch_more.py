"""Additional TPC-H-shaped headline queries (order-priority check,
shipping-mode conditional agg, promo share) — broadening the
oracle-verified join/agg surface and the bench set."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import table


@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    "join",
    "subquery",
    "bench",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-filtered count by priority.

    The correlated EXISTS(l_shipdate > o_orderdate) is served by a
    per-order PRE-AGGREGATE instead of a semi join against raw
    lineitem: EXISTS(l_shipdate > o_orderdate) ⟺
    max(l_shipdate) > o_orderdate, so lineitem collapses map-side to
    one (l_orderkey, max_shipdate) row per order BEFORE any exchange
    (guide §2.3 "aggregate before you shuffle").  Two further derived
    facts the optimizer cannot infer are applied by hand: only
    lineitem rows with l_shipdate > the window's LOWER bound can ever
    witness an order in the window (the correlated predicate implies
    it, so the scan gets a pushed l_shipdate filter), and the
    post-aggregate join against the date-filtered orders is
    equi-only, which AQE freely broadcasts by actual size.  The plan
    this replaces broadcast the ENTIRE raw lineitem projection as a
    LeftSemi build side (~600k rows at sf0.1; unboundable at real SF
    — left-semi can only build from the right, so AQE could never fix
    it) — the rewrite's build side is the date-filtered orders slice.
    Local seconds are scheduling-floor-bound either way (~0.6 s at
    sf0.1); the win is shuffle/broadcast bytes: |lineitem| → |recent
    distinct orderkeys| (plans/r11/q4_order_priority_*.txt)."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li_max = (
        table(spark, sf_dir, "lineitem")
        # derived bound: l_shipdate > o_orderdate >= 1996-07-01 —
        # pushes to the parquet scan, prunes most of lineitem
        .filter(F.col("l_shipdate") > F.lit("1996-07-01").cast("timestamp"))
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("__max_ship"))
    )
    matched = o.join(li_max, o.o_orderkey == li_max.l_orderkey).filter(
        F.col("__max_ship") > F.col("o_orderdate")
    )
    return (
        matched.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q12_priority_shipmode",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    "join",
    "agg",
    "bench",
)
def q12_priority_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional-sum split by priority."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q14_promo_share",
    """
    SELECT CAST(floor(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                              THEN CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5001) AS BIGINT)
                              ELSE 0 END)
                  / sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5001) AS BIGINT)) * 10000 + 0.5001) AS BIGINT)
             AS promo_revenue_pct_e4
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
    "join",
    "agg",
    "bench",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: dim join (hint-free — part grows with SF, AQE
    broadcasts it while small) + ratio of conditional sums."""
    from finance_etl_pipeline_spark.functions.scalars import igrid

    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev_e4 = igrid(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    promo = F.when(F.col("p_type").like("PROMO%"), rev_e4).otherwise(F.lit(0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)  # part ∝ SF: AQE decides
        .agg(
            igrid(100.0 * F.sum(promo) / F.sum(rev_e4), 4).alias(
                "promo_revenue_pct_e4"
            )
        )
    )
