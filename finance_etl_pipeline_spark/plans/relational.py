"""Relational operator battery over the driver testdata tables.

Covers SURVEY.md §2.2 (projections/filters P1–P10), §2.3 (joins J1–J5),
§2.4 (aggregations A1–A11), §2.5 (window W1+), §2.6 (sort/limit O1–O2),
§2.7 (set ops U1–U4) — each re-expressed on the TPC-H-ish tables so the
DuckDB oracle can verify it, plus TPC-H-style headline queries used by
bench.py.

Scale notes (apply to every query here):
- dimension tables (region, nation, supplier, small derived dims) are
  joined with an explicit ``broadcast()`` hint — at 100 TB the fact
  side never shuffles for these joins;
- aggregations are expressed as single groupBy chains so Catalyst emits
  partial (map-side) aggregation before the shuffle;
- top-k is ``orderBy().limit()`` which Spark executes as TakeOrdered
  (per-partition heap + driver merge), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.scalars import igrid
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import table

# ---------------------------------------------------------------------------
# TPC-H-style headline queries (bench + flagship)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(l_quantity) AS BIGINT)                                                  AS sum_qty,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5001) AS BIGINT)) AS BIGINT)       AS sum_base_price_e2,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5001) AS BIGINT)) AS BIGINT)
                                                                                            AS sum_disc_price_e4,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000 + 0.5001) AS BIGINT)) AS BIGINT)
                                                                                            AS sum_charge_e6,
           CAST(floor(sum(l_quantity) / count(*) * 10000 + 0.5001) AS BIGINT)               AS avg_qty_e4,
           CAST(floor(sum(CAST(floor(l_extendedprice * 100 + 0.5001) AS BIGINT)) / count(*) / 100 * 10000 + 0.5001) AS BIGINT)
                                                                                            AS avg_price_e4,
           CAST(floor(sum(CAST(floor(l_discount * 100 + 0.5001) AS BIGINT)) / count(*) / 100 * 10000 + 0.5001) AS BIGINT)
                                                                                            AS avg_disc_e4,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    "agg",
    "bench",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan→filter→group→multi-agg→sort (A1, P3, O1).

    Output typing contract: money aggregates are emitted as EXACT
    integer grid units (cents / e4 / e6) — each row's amount is
    gridded to its exact decimal resolution (source money is 2 dp,
    disc 2 dp, tax 2 dp) BEFORE the sum, so the aggregate is pure
    BIGINT arithmetic: bit-identical across engines, partition
    orders, and hash canonicalizations.  At extreme scale the same
    grids would be summed as DECIMAL(38,0) to rule out int64
    overflow; BIGINT holds comfortably through sf100."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cnt = F.count(F.lit(1))
    sum_price_e2 = F.sum(igrid("l_extendedprice", 2))
    sum_disc_e2 = F.sum(igrid("l_discount", 2))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            sum_price_e2.alias("sum_base_price_e2"),
            F.sum(igrid(disc_price, 4)).alias("sum_disc_price_e4"),
            F.sum(igrid(disc_price * (1 + F.col("l_tax")), 6)).alias(
                "sum_charge_e6"
            ),
            igrid(F.sum("l_quantity") / cnt, 4).alias("avg_qty_e4"),
            igrid(sum_price_e2 / cnt / 100, 4).alias("avg_price_e4"),
            igrid(sum_disc_e2 / cnt / 100, 4).alias("avg_disc_e4"),
            cnt.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_top_unshipped_orders",
    """
    SELECT l.l_orderkey,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5001) AS BIGINT)) AS BIGINT) AS revenue_e4,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue_e4 DESC, l_orderkey
    LIMIT 10
    """,
    "join",
    "agg",
    "bench",
)
def q3_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective 3-way join → group → top-k (J2, A8, O2)."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    # no broadcast hint on the customer side: it is fact-proportional
    # (grows with SF), so a forced broadcast OOMs at cluster scale.
    # AQE's size-based dynamic join selection broadcasts it while it is
    # actually small (plan-asserted in tests/test_plan_shape.py).
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                igrid(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            ).alias("revenue_e4")
        )
        .select("l_orderkey", "revenue_e4", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue_e4"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_region_revenue",
    """
    SELECT n.n_name,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5001) AS BIGINT)) AS BIGINT) AS revenue_e4
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue_e4 DESC, n_name
    """,
    "join",
    "agg",
    "bench",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join with broadcast dims (J2, J4, P3, A1)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                igrid(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            ).alias("revenue_e4")
        )
        .orderBy(F.desc("revenue_e4"), "n_name")
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 10000 + 0.5001) AS BIGINT)) AS BIGINT) AS revenue_e4
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    "filter",
    "agg",
    "bench",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure pushdown filter + global agg (P3, P6, A1)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                igrid(F.col("l_extendedprice") * F.col("l_discount"), 4)
            ).alias("revenue_e4")
        )
    )


@register(
    "q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5001) AS BIGINT)) AS BIGINT) AS revenue_e4,
           CAST(floor(c.c_acctbal * 100 + 0.5001) AS BIGINT) AS acctbal_e2, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1995-04-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue_e4 DESC, c_custkey
    LIMIT 20
    """,
    "join",
    "agg",
    "bench",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: join + group + top-k on revenue (J2, A8)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(
                igrid(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            ).alias("revenue_e4")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue_e4",
            igrid("c_acctbal", 2).alias("acctbal_e2"),
            "n_name",
        )
        .orderBy(F.desc("revenue_e4"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# P family — projections / filters / predicates (SURVEY.md §2.2)
# ---------------------------------------------------------------------------


@register(
    "p_project_rename",
    """
    SELECT o_orderkey AS order_id,
           o_custkey  AS customer_id,
           'orders'   AS source,
           CAST(floor(o_totalprice * 100 + 0.5001) AS BIGINT) AS total_price_e2
    FROM orders
    """,
    "project",
)
def p_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2: fixed projection, rename, literal source tag
    (reference transform.py:58-65)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("customer_id"),
        F.lit("orders").alias("source"),
        igrid("o_totalprice", 2).alias("total_price_e2"),
    )


@register(
    "p_filter_date_halfopen",
    """
    SELECT o_orderkey, o_orderdate
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
    "filter",
)
def p_filter_date_halfopen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: half-open month window [start, end)
    (reference pipeline.py:23-27,165-169)."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate")


@register(
    "p_filter_month_string",
    """
    SELECT o_orderkey, strftime(o_orderdate, '%Y-%m') AS order_month
    FROM orders
    WHERE strftime(o_orderdate, '%Y-%m') = '1997-06'
    """,
    "filter",
)
def p_filter_month_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4+P5: month-of-date equality via yyyy-MM formatting
    (reference export_bi_datasets.py:37-42)."""
    o = table(spark, sf_dir, "orders")
    month = F.date_format("o_orderdate", "yyyy-MM")
    return o.filter(month == "1997-06").select(
        "o_orderkey", month.alias("order_month")
    )


@register(
    "p_filter_isin",
    """
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
    "filter",
)
def p_filter_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: membership predicate (reference quality.py:23,39)."""
    o = table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).select(
        "o_orderkey", "o_orderpriority"
    )


@register(
    "p_anti_join_integrity",
    """
    SELECT o_orderkey, o_custkey
    FROM orders o
    ANTI JOIN (SELECT c_custkey FROM customer WHERE c_acctbal > 0) c
      ON o.o_custkey = c.c_custkey
    ORDER BY o_orderkey
    """,
    "filter",
    "join",
)
def p_anti_join_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: referential-integrity violations as a left_anti join (the
    Spark idiom for the reference's ``~isin`` mask, pipeline.py:30-47)."""
    o = table(spark, sf_dir, "orders")
    good = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0).select("c_custkey")
    # customer-derived side: no forced broadcast (fact-proportional);
    # AQE picks broadcast-anti while the filtered key set is small
    return (
        o.join(good, o.o_custkey == good.c_custkey, "left_anti")
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
    )


@register(
    "p_filter_case_insensitive",
    """
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE lower(c_mktsegment) = 'building'
    """,
    "filter",
)
def p_filter_case_insensitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: case-insensitive equality (reference build_dashboard.py:153-155)."""
    c = table(spark, sf_dir, "customer")
    return c.filter(F.lower(F.col("c_mktsegment")) == "building").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "p_filter_not_null",
    """
    SELECT event_id, user_id, value
    FROM events
    WHERE value IS NOT NULL AND user_id IS NOT NULL
    """,
    "filter",
)
def p_filter_not_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: null-dropping filter (reference export_powerbi_star_schema.py:81)."""
    e = table(spark, sf_dir, "events")
    return e.filter(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    ).select("event_id", "user_id", "value")


@register(
    "p_conditional_update",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(floor((CASE WHEN l_returnflag = 'R' THEN -l_extendedprice
                      ELSE l_extendedprice END) * 100 + 0.5001) AS BIGINT) AS signed_price_e2
    FROM lineitem
    """,
    "project",
)
def p_conditional_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: conditional column rewrite via when/otherwise
    (reference transform.py:37,84 — masked assignment)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        igrid(
            F.when(F.col("l_returnflag") == "R", -F.col("l_extendedprice")).otherwise(
                F.col("l_extendedprice")
            ),
            2,
        ).alias("signed_price_e2"),
    )


# ---------------------------------------------------------------------------
# J family — joins (SURVEY.md §2.3)
# ---------------------------------------------------------------------------


@register(
    "j_left_composite_key",
    """
    WITH daily_rate AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderpriority,
               CAST(floor(sum(CAST(floor(o_totalprice * 100 + 0.5001) AS BIGINT)) / count(*) / 100 * 10000 + 0.5001) AS BIGINT) AS avg_price_e4
        FROM orders GROUP BY 1, 2
    )
    SELECT o.o_orderkey,
           coalesce(d.avg_price_e4, 10000) AS rate_e4
    FROM orders o
    LEFT JOIN daily_rate d
      ON strftime(o.o_orderdate, '%Y-%m') = d.month
     AND o.o_orderpriority = d.o_orderpriority
    ORDER BY o_orderkey
    """,
    "join",
)
def j_left_composite_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: left join on a composite key with a coalesce default —
    the FX-enrichment shape (reference transform.py:27-38): small
    lookup side is broadcast so the fact side never shuffles."""
    o = table(spark, sf_dir, "orders")
    rate = (
        o.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            "o_orderpriority",
        )
        .agg(
            igrid(
                F.sum(igrid("o_totalprice", 2)) / F.count(F.lit(1)) / 100, 4
            ).alias("avg_price_e4")
        )
    )
    joined = o.join(
        F.broadcast(rate),
        (F.date_format(o.o_orderdate, "yyyy-MM") == rate.month)
        & (o.o_orderpriority == rate.o_orderpriority),
        "left",
    )
    return joined.select(
        "o_orderkey",
        F.coalesce(rate.avg_price_e4, F.lit(10000)).alias("rate_e4"),
    ).orderBy("o_orderkey")


@register(
    "j_left_single_key",
    """
    SELECT o.o_orderkey, c.c_name, c.c_mktsegment
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o_orderkey
    """,
    "join",
)
def j_left_single_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: left equi-join to enrich with dim attributes
    (reference transform.py:114)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    # customer is fact-proportional — leave join strategy to AQE
    return (
        o.join(c, o.o_custkey == c.c_custkey, "left")
        .select("o_orderkey", "c_name", "c_mktsegment")
        .orderBy("o_orderkey")
    )


@register(
    "j_count_backfill",
    """
    WITH statuses AS (SELECT DISTINCT o_orderstatus FROM orders),
         counts AS (
           SELECT o_orderstatus, count(*) AS n
           FROM orders WHERE o_totalprice > 200000
           GROUP BY o_orderstatus
         )
    SELECT s.o_orderstatus, coalesce(c.n, 0) AS n
    FROM statuses s LEFT JOIN counts c ON s.o_orderstatus = c.o_orderstatus
    ORDER BY s.o_orderstatus
    """,
    "join",
    "agg",
)
def j_count_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: left join of a base universe against sparse counts, fill 0
    (reference quality.py:230-238)."""
    o = table(spark, sf_dir, "orders")
    statuses = o.select("o_orderstatus").distinct()
    counts = (
        o.filter(F.col("o_totalprice") > 200000)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        statuses.join(counts, "o_orderstatus", "left")
        .select("o_orderstatus", F.coalesce("n", F.lit(0)).alias("n"))
        .orderBy("o_orderstatus")
    )


@register(
    "j_surrogate_key_lookup",
    """
    SELECT n.n_name, r.r_name AS region_name
    FROM nation n
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    ORDER BY n_name
    """,
    "join",
)
def j_surrogate_key_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: dict-map surrogate lookup as a broadcast left join
    (reference export_powerbi_star_schema.py:218-236)."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .select("n_name", F.col("r_name").alias("region_name"))
        .orderBy("n_name")
    )


@register(
    "j_static_case_map",
    """
    SELECT event_id,
           CASE event_type WHEN 'purchase' THEN '40000001'
                           WHEN 'refund'   THEN '50000001'
                           ELSE '10000001' END AS account_code
    FROM events
    """,
    "project",
)
def j_static_case_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: tiny static map as a CASE chain — no join needed
    (reference transform.py:80-82)."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.when(F.col("event_type") == "purchase", "40000001")
        .when(F.col("event_type") == "refund", "50000001")
        .otherwise("10000001")
        .alias("account_code"),
    )


# ---------------------------------------------------------------------------
# A family — aggregations (SURVEY.md §2.4)
# ---------------------------------------------------------------------------


@register(
    "a_groupby_sum",
    """
    SELECT l_returnflag,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5001) AS BIGINT)) AS BIGINT) AS total_price_e2
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    "agg",
)
def a_groupby_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: group-by sum with map-side partial aggregation
    (reference transform.py:117)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.sum(igrid("l_extendedprice", 2)).alias("total_price_e2"))
        .orderBy("l_returnflag")
    )


@register(
    "a_pivot_wide",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(floor(l_extendedprice * 100 + 0.5001) AS BIGINT) ELSE 0 END) AS BIGINT) AS F,
           CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(floor(l_extendedprice * 100 + 0.5001) AS BIGINT) ELSE 0 END) AS BIGINT) AS O
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    "agg",
)
def a_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: pivot to wide with explicit pivot values + fill 0
    (reference transform.py:118-124 — explicit values keep the plan
    deterministic and skip the extra distinct-values job)."""
    li = table(spark, sf_dir, "lineitem").withColumn(
        "price_e2", igrid("l_extendedprice", 2)
    )
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .sum("price_e2")
        .na.fill(0)
        .select("l_returnflag", "F", "O")
        .orderBy("l_returnflag")
    )


@register(
    "a_count_pivot",
    """
    SELECT event_type,
           CAST(sum(CASE WHEN value >= 100 THEN 1 ELSE 0 END) AS BIGINT) AS high,
           CAST(sum(CASE WHEN value <  100 THEN 1 ELSE 0 END) AS BIGINT) AS low
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    "agg",
)
def a_count_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: count-by-group pivot (reference quality.py:220-228)."""
    e = table(spark, sf_dir, "events")
    return (
        e.withColumn(
            # null values fall in NEITHER band (matching the oracle's
            # CASE WHEN counting) — an otherwise() would bucket nulls
            # into 'low' and diverge on the first null-bearing dataset
            "band",
            F.when(F.col("value") >= 100, "high").when(F.col("value") < 100, "low"),
        )
        .groupBy("event_type")
        .pivot("band", ["high", "low"])
        .count()
        .na.fill(0)
        .orderBy("event_type")
    )


@register(
    "a_duplicate_key_check",
    """
    SELECT l_orderkey, l_linenumber, count(*) AS n
    FROM lineitem
    GROUP BY l_orderkey, l_linenumber
    HAVING count(*) > 1
    ORDER BY l_orderkey, l_linenumber
    """,
    "agg",
    "dq",
)
def a_duplicate_key_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: duplicate-key detection (reference quality.py:8-13)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "a_max_abs_identity",
    """
    SELECT CAST(max(abs(CAST(floor(o_totalprice * 100 + 0.5001) AS BIGINT)
                        - CAST(floor(o_totalprice * 100 + 0.5001) AS BIGINT))) AS BIGINT) AS max_abs_diff_e2
    FROM orders
    """,
    "agg",
    "dq",
)
def a_max_abs_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: max-abs cross-column identity check (reference quality.py:59-65;
    the testdata has no gross/net split so the identity is trivial —
    the operator shape is what is verified)."""
    o = table(spark, sf_dir, "orders")
    cents = igrid("o_totalprice", 2)
    return o.agg(
        F.max(F.abs(cents - cents)).cast("long").alias("max_abs_diff_e2")
    )


@register(
    "a_group_min_max",
    """
    SELECT o_orderstatus,
           min(o_orderdate) AS first_order,
           max(o_orderdate) AS last_order,
           CAST(min(CAST(floor(o_totalprice * 100 + 0.5001) AS BIGINT)) AS BIGINT) AS min_price_e2,
           CAST(max(CAST(floor(o_totalprice * 100 + 0.5001) AS BIGINT)) AS BIGINT) AS max_price_e2
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    "agg",
)
def a_group_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/A7/A10: group-by min/max over dates and amounts
    (reference export_powerbi_star_schema.py:163-170)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
            F.min(igrid("o_totalprice", 2)).alias("min_price_e2"),
            F.max(igrid("o_totalprice", 2)).alias("max_price_e2"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "a_topn_by_aggregate",
    """
    SELECT c_custkey,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5001) AS BIGINT)) AS BIGINT) AS total_spend_e2
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey
    ORDER BY total_spend_e2 DESC, c_custkey
    LIMIT 8
    """,
    "agg",
)
def a_topn_by_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: top-N entities by aggregate (reference build_dashboard.py:100);
    executed as TakeOrdered, not a global sort."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey")
        .agg(F.sum(igrid("o_totalprice", 2)).alias("total_spend_e2"))
        .orderBy(F.desc("total_spend_e2"), "c_custkey")
        .limit(8)
    )


@register(
    "a_distinct_values",
    """
    SELECT DISTINCT l_returnflag, l_linestatus
    FROM lineitem
    ORDER BY l_returnflag, l_linestatus
    """,
    "agg",
)
def a_distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: distinct-set aggregate (reference build_dashboard.py:49)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct().orderBy(
        "l_returnflag", "l_linestatus"
    )


@register(
    "a_exists_flag",
    """
    SELECT CAST(count(*) > 0 AS BOOLEAN) AS has_negative
    FROM (SELECT 1 FROM events WHERE value < 0 LIMIT 1)
    """,
    "agg",
    "dq",
)
def a_exists_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: any/exists as limit(1)+count — avoids a full scan once a
    match is found (reference pipeline.py:38)."""
    e = table(spark, sf_dir, "events")
    exists = e.filter(F.col("value") < 0).limit(1).count() > 0
    return spark.createDataFrame([(exists,)], "has_negative boolean")


@register(
    "a_stats_summary",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(floor(sum(CAST(floor(value * 100 + 0.5001) AS BIGINT)) / count(value) / 100 * 10000 + 0.5001) AS BIGINT) AS avg_value_e4,
           CAST(floor(stddev_samp(value) * 10000 + 0.5001) AS BIGINT) AS sd_value_e4,
           CAST(min(CAST(floor(value * 100 + 0.5001) AS BIGINT)) AS BIGINT) AS min_value_e2,
           CAST(max(CAST(floor(value * 100 + 0.5001) AS BIGINT)) AS BIGINT) AS max_value_e2,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    "agg",
)
def a_stats_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-reference stats battery: stddev + count-distinct —
    SURVEY.md §2.4 'absent' list, added for engine completeness."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            igrid(
                F.sum(igrid("value", 2)) / F.count("value") / 100, 4
            ).alias("avg_value_e4"),
            igrid(F.stddev_samp("value"), 4).alias("sd_value_e4"),
            F.min(igrid("value", 2)).alias("min_value_e2"),
            F.max(igrid("value", 2)).alias("max_value_e2"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


@register(
    "a_grouping_sets_rollup",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5001) AS BIGINT)) AS BIGINT) AS total_price_e2
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
    "agg",
)
def a_grouping_sets_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-reference: ROLLUP subtotals (§2.4 'absent' list)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum(igrid("l_extendedprice", 2)).alias("total_price_e2"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "total_price_e2",
        )
        .orderBy("returnflag", "linestatus")
    )


@register(
    "a_percentiles",
    """
    SELECT l_returnflag,
           CAST(floor(median(l_extendedprice) * 10000 + 0.5001) AS BIGINT) AS p50_e4,
           CAST(floor(quantile_cont(l_extendedprice, 0.95) * 10000 + 0.5001) AS BIGINT) AS p95_e4
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    "agg",
)
def a_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-reference: exact percentiles (§2.4 'absent' list).
    Exact (not approx) so the DuckDB oracle matches bit-for-bit; the
    scale path is percentile_approx, exposed in a_percentiles_approx."""
    li = table(spark, sf_dir, "lineitem")
    # one array-percentile buffer for both points (two scalar
    # percentile() aggregates would each buffer every value)
    pct = F.expr("percentile(l_extendedprice, array(0.5, 0.95))")
    return (
        li.groupBy("l_returnflag")
        .agg(
            igrid(F.element_at(pct, 1), 4).alias("p50_e4"),
            igrid(F.element_at(pct, 2), 4).alias("p95_e4"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# W family — window functions (SURVEY.md §2.5)
# ---------------------------------------------------------------------------


@register(
    "w_row_number_surrogate",
    """
    SELECT c_mktsegment,
           CAST(row_number() OVER (ORDER BY c_mktsegment) AS BIGINT) AS segment_key
    FROM (SELECT DISTINCT c_mktsegment FROM customer)
    ORDER BY segment_key
    """,
    "window",
)
def w_row_number_surrogate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: sequential surrogate key over a sorted dim
    (reference export_powerbi_star_schema.py:81-83). Global window is
    fine for small dims; the scale path for big dims is
    monotonically_increasing_id + a dense_rank remap."""
    c = table(spark, sf_dir, "customer")
    dim = c.select("c_mktsegment").distinct()
    w = Window.orderBy("c_mktsegment")
    return dim.select(
        "c_mktsegment",
        F.row_number().over(w).cast("long").alias("segment_key"),
    ).orderBy("segment_key")


@register(
    "w_rank_in_group",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey,
             CAST(rank() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
      FROM orders
    ) WHERE rnk <= 3
    ORDER BY o_custkey, rnk, o_orderkey
    """,
    "window",
)
def w_rank_in_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-reference: per-group top-k via rank() — partitioned window,
    no global sort (scales: each group sorts within its partition)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.rank().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
        .orderBy("o_custkey", "rnk", "o_orderkey")
    )


@register(
    "w_lag_delta",
    """
    SELECT user_id, event_id,
           CAST(floor(value * 100 + 0.5001) AS BIGINT)
             - lag(CAST(floor(value * 100 + 0.5001) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta_e2
    FROM events
    ORDER BY user_id, event_id
    """,
    "window",
)
def w_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-reference: lag() delta per user ordered by time."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cents = igrid("value", 2)
    return e.select(
        "user_id",
        "event_id",
        (cents - F.lag(cents).over(w)).alias("delta_e2"),
    ).orderBy("user_id", "event_id")


@register(
    "w_moving_sum",
    """
    SELECT user_id, event_id,
           CAST(sum(CAST(floor(value * 100 + 0.5001) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS moving_sum_e2
    FROM events
    ORDER BY user_id, event_id
    """,
    "window",
)
def w_moving_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-reference: framed moving sum (ROWS 2 PRECEDING)."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.sum(igrid("value", 2)).over(w).alias("moving_sum_e2"),
    ).orderBy("user_id", "event_id")


# ---------------------------------------------------------------------------
# O family — sort / limit (SURVEY.md §2.6)
# ---------------------------------------------------------------------------


@register(
    "o_multicol_sort_limit",
    """
    SELECT o_orderdate, o_custkey, o_orderkey,
           CAST(floor(o_totalprice * 100 + 0.5001) AS BIGINT) AS total_price_e2
    FROM orders
    ORDER BY o_orderdate, o_custkey, o_orderkey
    LIMIT 200
    """,
    "sort",
)
def o_multicol_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O2: multi-column sort + display cap → TakeOrdered
    (reference transform.py:94,128; build_dashboard.py:170-173)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderdate",
            "o_custkey",
            "o_orderkey",
            igrid("o_totalprice", 2).alias("total_price_e2"),
        )
        .orderBy("o_orderdate", "o_custkey", "o_orderkey")
        .limit(200)
    )


# ---------------------------------------------------------------------------
# U family — set operations (SURVEY.md §2.7)
# ---------------------------------------------------------------------------


@register(
    "u_union_by_name",
    """
    SELECT id, kind, CAST(floor(amount * 100 + 0.5001) AS BIGINT) AS amount_e2 FROM (
      SELECT o_orderkey AS id, 'order' AS kind, o_totalprice AS amount FROM orders
      UNION ALL
      SELECT l_orderkey * 10 + l_linenumber AS id, 'lineitem' AS kind,
             l_extendedprice AS amount
      FROM lineitem
    )
    ORDER BY kind, id
    """,
    "setop",
)
def u_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: union-all by column name after aligning projections
    (reference transform.py:88)."""
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.lit("order").alias("kind"),
        F.col("o_totalprice").alias("amount"),
    )
    li = table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("id"),
        F.lit("lineitem").alias("kind"),
        F.col("l_extendedprice").alias("amount"),
    )
    return (
        o.unionByName(li)
        .select("id", "kind", igrid("amount", 2).alias("amount_e2"))
        .orderBy("kind", "id")
    )


@register(
    "u_union_ragged",
    """
    SELECT id, kind, note FROM (
      SELECT o_orderkey AS id, 'order' AS kind, CAST(NULL AS VARCHAR) AS note
      FROM orders WHERE o_totalprice > 300000
      UNION ALL
      SELECT event_id AS id, 'event' AS kind, event_type AS note
      FROM events WHERE value > 150
    )
    ORDER BY kind, id
    """,
    "setop",
)
def u_union_ragged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: union with missing columns normalized to a canonical schema
    (reference pipeline.py:132-133 ragged issue frames)."""
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_orderkey").alias("id"), F.lit("order").alias("kind"))
    )
    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("value") > 150)
        .select(
            F.col("event_id").alias("id"),
            F.lit("event").alias("kind"),
            F.col("event_type").alias("note"),
        )
    )
    return (
        o.unionByName(e, allowMissingColumns=True)
        .select("id", "kind", "note")
        .orderBy("kind", "id")
    )


@register(
    "u_drop_duplicates",
    """
    SELECT o_custkey, min(o_orderkey) AS first_orderkey
    FROM orders
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
    "setop",
)
def u_drop_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: dedup-by-key with a deterministic survivor — expressed as a
    min() aggregate rather than dropDuplicates() because the latter
    keeps an arbitrary row (reference export_powerbi_star_schema.py:118
    sorts first; min() is the order-free equivalent that scales)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.min("o_orderkey").alias("first_orderkey"))
        .orderBy("o_custkey")
    )


@register(
    "u_union_distinct",
    """
    SELECT custkey FROM (
      SELECT o_custkey AS custkey FROM orders
      UNION
      SELECT c_custkey AS custkey FROM customer
    )
    ORDER BY custkey
    """,
    "setop",
)
def u_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: set union across frames (reference
    export_powerbi_star_schema.py:76-82)."""
    o = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    return o.union(c).distinct().orderBy("custkey")


@register(
    "u_intersect_except",
    """
    SELECT custkey, 'both' AS tag FROM (
      SELECT o_custkey AS custkey FROM orders
      INTERSECT
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    )
    UNION ALL
    SELECT custkey, 'only_high_bal' AS tag FROM (
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
      EXCEPT
      SELECT o_custkey FROM orders
    )
    ORDER BY tag, custkey
    """,
    "setop",
)
def u_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-reference: INTERSECT / EXCEPT (§2.7 'absent' list)."""
    o = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    hi = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("custkey"))
    )
    both = o.intersect(hi).select("custkey", F.lit("both").alias("tag"))
    only_hi = hi.exceptAll(o.distinct()).distinct().select(
        "custkey", F.lit("only_high_bal").alias("tag")
    )
    return both.unionByName(only_hi).orderBy("tag", "custkey")


@register(
    "w_distribution_funcs",
    """
    SELECT c_custkey, c_mktsegment,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           CAST(floor((percent_rank() OVER w) * 1000000 + 0.5001) AS BIGINT) AS pct_rank_e6,
           CAST(floor((cume_dist() OVER w) * 1000000 + 0.5001) AS BIGINT) AS cdist_e6
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    ORDER BY c_mktsegment, c_custkey
    """,
    "window",
)
def w_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile / percent_rank /
    cume_dist) per market segment.  The window order includes the key
    (c_custkey) so the total order is unique — without it, ntile's
    bucket boundaries on tied acctbals would be engine-dependent.
    percent_rank/cume_dist are exact integer ratios → IEEE-identical;
    rounded anyway under the shared contract."""
    from pyspark.sql import Window as W

    c = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        igrid(F.percent_rank().over(w), 6).alias("pct_rank_e6"),
        igrid(F.cume_dist().over(w), 6).alias("cdist_e6"),
    ).orderBy("c_mktsegment", "c_custkey")


@register(
    "a_unpivot_long",
    """
    WITH wide AS (
      SELECT l_returnflag,
             CAST(sum(CAST(floor(l_quantity * 100 + 0.5001) AS BIGINT)) AS BIGINT) AS qty,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5001) AS BIGINT)) AS BIGINT) AS price,
             CAST(sum(CAST(floor(l_discount * 100 + 0.5001) AS BIGINT)) AS BIGINT) AS disc
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, measure, total_e2
    FROM (
      SELECT l_returnflag, 'qty' AS measure, qty AS total_e2 FROM wide
      UNION ALL
      SELECT l_returnflag, 'price', price FROM wide
      UNION ALL
      SELECT l_returnflag, 'disc', disc FROM wide
    )
    ORDER BY l_returnflag, measure
    """,
    "agg",
    "reshape",
)
def a_unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) — the inverse of A2's pivot: a wide per-flag
    aggregate reshaped to (key, measure, value) long form via Spark's
    native unpivot operator (the oracle states it as the portable
    UNION ALL).  Long form is what generic BI/metric sinks ingest."""
    li = table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(igrid("l_quantity", 2)).alias("qty"),
        F.sum(igrid("l_extendedprice", 2)).alias("price"),
        F.sum(igrid("l_discount", 2)).alias("disc"),
    )
    return (
        wide.unpivot(
            ["l_returnflag"], ["qty", "price", "disc"], "measure", "total_e2"
        )
        .select("l_returnflag", "measure", "total_e2")
        .orderBy("l_returnflag", "measure")
    )


_BANDS = [
    ("low", 0.0, 10_000.0),
    ("mid", 10_000.0, 25_000.0),
    ("high", 25_000.0, 50_000.0),
    ("premium", 50_000.0, 75_000.0),
    ("jumbo", 75_000.0, 1e18),
]
_BANDS_SQL = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _BANDS)


@register(
    "j_band_join_pricing",
    f"""
    WITH bands(band, lo, hi) AS (VALUES {_BANDS_SQL})
    SELECT b.band, count(*) AS n_lines,
           CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5001) AS BIGINT)) AS BIGINT) AS revenue_e2
    FROM lineitem l JOIN bands b
      ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
    GROUP BY b.band ORDER BY b.band
    """,
    "join",
    "relational",
)
def j_band_join_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi banded-dim join: each lineitem lands in a price band
    via a range predicate against a tiny literal dim — the remaining
    join access pattern next to equi, as-of, and interval joins.

    Scale note: with a handful of bands Catalyst picks a broadcast
    nested-loop join, which is exactly right (fact side stays
    shuffle-free, per-row band test is codegen'd).  With many bands
    the correct rewrite is binning to a band KEY on the fact side
    (width_bucket-style narrow map) followed by an equi broadcast
    join — the non-equi predicate never belongs on a shuffle join."""
    li = table(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(
        _BANDS, "band string, lo double, hi double"
    )
    return (
        li.join(
            F.broadcast(bands),
            (F.col("l_extendedprice") >= F.col("lo"))
            & (F.col("l_extendedprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(igrid("l_extendedprice", 2)).alias("revenue_e2"),
        )
        .orderBy("band")
    )


_PAGE_DATE, _PAGE_KEY, _PAGE_SIZE = "1994-06-01", 1_000, 50


@register(
    "o_keyset_pagination",
    f"""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders
    WHERE (o_orderdate, o_orderkey) > (DATE '{_PAGE_DATE}', {_PAGE_KEY})
    ORDER BY o_orderdate, o_orderkey
    LIMIT {_PAGE_SIZE}
    """,
    "relational",
    "sort",
)
def o_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek) pagination: resume after a (date, key) cursor via
    a tuple comparison, never OFFSET — the access pattern that stays
    O(page) at any table size, where OFFSET n forces the engine to
    produce and discard n rows.  The tuple predicate pushes to the
    scan as a date range filter and the ORDER+LIMIT plans as
    TakeOrderedAndProject (per-partition heaps, no global sort)."""
    o = table(spark, sf_dir, "orders")
    cursor = F.struct(
        F.lit(_PAGE_DATE).cast(o.schema["o_orderdate"].dataType),
        F.lit(_PAGE_KEY).cast("long"),
    )
    return (
        o.filter(
            F.struct(F.col("o_orderdate"), F.col("o_orderkey")) > cursor
        )
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_orderdate", "o_orderkey")
        .limit(_PAGE_SIZE)
    )


@register(
    "a_mode_per_group",
    """
    WITH counts AS (
      SELECT o_orderstatus, o_orderpriority, count(*) AS n
      FROM orders GROUP BY 1, 2
    ),
    ranked AS (
      SELECT o_orderstatus, o_orderpriority, n,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY n DESC, o_orderpriority) AS rk
      FROM counts
    )
    SELECT o_orderstatus, o_orderpriority AS modal_priority, n AS n_orders
    FROM ranked WHERE rk = 1
    ORDER BY o_orderstatus
    """,
    "agg",
    "window",
)
def a_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group MODE: the most frequent order priority
    per order status.  Deliberately NOT Spark's mode() aggregate —
    both engines' built-in mode pick an ARBITRARY value on frequency
    ties, so the contract here is the explicit count-then-argmax with
    a total order (count desc, value asc): same shuffle count as
    mode() (the counts groupBy is the only wide stage; the window
    runs on |groups × values| rows) and bit-stable cross-engine."""
    o = table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("n"), "o_orderpriority"
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("modal_priority"),
            F.col("n").alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "a_weighted_avg",
    """
    SELECT l_returnflag,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
           CAST(sum(CAST(l_quantity AS BIGINT)
                    * CAST(floor(l_extendedprice * 100 + 0.5001) AS BIGINT)) AS BIGINT)
             AS wsum_price_e2,
           CAST(floor(sum(CAST(l_quantity AS BIGINT)
                          * CAST(floor(l_extendedprice * 100 + 0.5001) AS BIGINT))
                      / sum(CAST(l_quantity AS BIGINT)) / 100 * 10000 + 0.5001) AS BIGINT)
             AS wavg_price_e4
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    "agg",
)
def a_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price per return flag — the weighted
    mean Σ(w·x)/Σw as pure integer arithmetic: quantities are
    integral, prices exact cents, so both the weighted sum and the
    weight total are exact BIGINTs and the final average divides two
    exact integers once.  One map-side-combined groupBy."""
    li = table(spark, sf_dir, "lineitem")
    w = F.col("l_quantity").cast("long")
    cents = igrid("l_extendedprice", 2)
    wsum = F.sum(w * cents)
    wtot = F.sum(w)
    return (
        li.groupBy("l_returnflag")
        .agg(
            wtot.cast("long").alias("total_qty"),
            wsum.cast("long").alias("wsum_price_e2"),
            igrid(wsum / wtot / 100, 4).alias("wavg_price_e4"),
        )
        .orderBy("l_returnflag")
    )


@register("a_percentiles_approx", None, "agg", "approx")
def a_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path a_percentiles' docstring promises:
    percentile_approx (Greenwald–Khanna sketch, accuracy 10000 ⇒ rank
    error ≤ 1/10000) — mergeable per-partition state instead of the
    exact percentile's full sort, the right trade at 100 TB.  No SQL
    oracle: the GK sketch is Spark-defined, so the driver records the
    rows-only check and tests/test_approx_percentile.py bounds the
    error against the exact oracle-verified query instead."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            igrid(
                F.expr("percentile_approx(l_extendedprice, 0.5, 10000)"), 4
            ).alias("p50_e4"),
            igrid(
                F.expr("percentile_approx(l_extendedprice, 0.95, 10000)"), 4
            ).alias("p95_e4"),
        )
        .orderBy("l_returnflag")
    )
