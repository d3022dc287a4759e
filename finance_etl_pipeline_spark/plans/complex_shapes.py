"""Compound query shapes (TPC-H Q13/Q18/Q22 style) + array/map scalar
battery — the remaining composition patterns: aggregate-of-aggregate,
HAVING-driven semi joins, NOT-EXISTS with scalar subqueries, and
collection-typed columns."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.scalars import igrid
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import table


@register(
    "q13_order_count_distribution",
    """
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    "join",
    "agg",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: aggregate-of-aggregate (how many customers have
    how many orders) — count(col) over a left join counts only matches."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q18_large_volume_customers",
    """
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150
    )
    SELECT c.c_custkey, o.o_orderkey, CAST(o.o_orderdate AS DATE) AS order_date,
           CAST(sum(l.l_quantity) AS BIGINT) AS total_qty
    FROM orders o
    SEMI JOIN big b ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
    "join",
    "agg",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered keys drive a semi join back
    into the detail, then re-aggregate — big-order customers."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate")
        .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )


@register(
    "q22_global_sales_opportunity",
    """
    WITH avg_bal AS (
      SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
    )
    SELECT substr(c_name, 10, 1) AS name_digit,
           count(*) AS numcust,
           CAST(sum(CAST(floor(c_acctbal * 100 + 0.5001) AS BIGINT)) AS BIGINT) AS totacctbal_e2
    FROM customer
    WHERE c_acctbal > (SELECT ab FROM avg_bal)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY name_digit
    ORDER BY name_digit
    """,
    "join",
    "subquery",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS
    (anti join) + group on a derived string key."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal")).first()[0]
    return (
        c.filter(F.col("c_acctbal") > avg_bal)
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 10, 1).alias("name_digit"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(igrid("c_acctbal", 2)).alias("totacctbal_e2"),
        )
        .orderBy("name_digit")
    )


@register(
    "a_cube_subtotals",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
    "agg",
)
def a_cube_subtotals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations (completes the rollup/cube
    pair from §2.4's 'absent' list)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
        )
        .orderBy("returnflag", "linestatus")
    )


@register(
    "f_array_map_funcs",
    """
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',')
             AS event_types,
           CAST(len(list(DISTINCT event_type)) AS INTEGER) AS n_types,
           CAST(list_contains(list(DISTINCT event_type), 'purchase') AS BOOLEAN)
             AS has_purchase
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    "scalar",
    "agg",
)
def f_array_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregates: per-user sorted distinct event-type
    sets + membership — collect_set is order-nondeterministic, so
    array_sort makes it comparable (and usable) downstream.  The set
    is emitted as a comma-joined string so the output schema is
    scalar-only (hash-comparable row contract; arrays are kept
    internal to the plan)."""
    e = table(spark, sf_dir, "events")
    types = F.array_sort(F.collect_set("event_type"))
    return (
        e.groupBy("user_id")
        .agg(
            F.array_join(types, ",").alias("event_types"),
            F.size(types).alias("n_types"),
            F.array_contains(types, "purchase").alias("has_purchase"),
        )
        .orderBy("user_id")
    )


@register(
    "a_grouping_sets_revenue",
    """
    SELECT coalesce(r.r_name, 'ALL') AS region,
           coalesce(n.n_name, 'ALL') AS nation,
           CAST(grouping(r.r_name) * 2 + grouping(n.n_name) AS INTEGER)
             AS gid,
           count(*) AS n_customers,
           CAST(floor((sum(c.c_acctbal)) * 100 + 0.5001) AS BIGINT)
             AS acctbal_e2
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY GROUPING SETS ((r.r_name, n.n_name), (r.r_name), ())
    ORDER BY gid, region, nation
    """,
    "agg",
    "scalar",
)
def a_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the multi-grain report in ONE pass:
    (region, nation) detail, region subtotals, and the grand total,
    disambiguated by grouping() flags (the cube/rollup generalization
    for hand-picked grains; coalesce('ALL') labels subtotal rows).
    Uses the native DataFrame.groupingSets operator (Spark 4) so
    Catalyst expands the grains with one Expand node over a single
    scan instead of N unioned aggregates."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    j = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    gid = (F.grouping("r_name") * 2 + F.grouping("n_name")).cast("int")
    return (
        j.groupingSets(
            [[F.col("r_name"), F.col("n_name")], [F.col("r_name")], []],
            F.col("r_name"),
            F.col("n_name"),
        )
        .agg(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            gid.alias("gid"),
            F.count(F.lit(1)).alias("n_customers"),
            igrid(F.sum("c_acctbal"), 2).alias("acctbal_e2"),
        )
        .select("region", "nation", "gid", "n_customers", "acctbal_e2")
        .orderBy("gid", "region", "nation")
    )
