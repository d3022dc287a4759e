"""Join-shape and subquery completeness battery (beyond-reference:
SURVEY.md §2.3 lists inner/right/full/semi joins and correlated
subqueries as absent from the reference — a complete engine needs
them). Also exposes the raw Spark-SQL-text surface: the engine accepts
SQL strings against registered views, with the same Catalyst plans as
the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.scalars import igrid
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import table


@register(
    "j_full_outer",
    """
    WITH o AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1),
         hi AS (SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5001) AS BIGINT) AS acctbal_e2
                FROM customer WHERE c_acctbal > 7000)
    SELECT coalesce(o.o_custkey, hi.c_custkey) AS custkey,
           coalesce(o.n_orders, 0) AS n_orders,
           hi.acctbal_e2
    FROM o FULL OUTER JOIN hi ON o.o_custkey = hi.c_custkey
    ORDER BY custkey
    """,
    "join",
)
def j_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of per-customer order counts × high-balance
    customers — both unmatched sides survive."""
    o = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    hi = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 7000)
        .select("c_custkey", igrid(F.col("c_acctbal"), 2).alias("acctbal_e2"))
    )
    return (
        o.join(hi, o.o_custkey == hi.c_custkey, "full_outer")
        .select(
            F.coalesce(o.o_custkey, hi.c_custkey).alias("custkey"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            "acctbal_e2",
        )
        .orderBy("custkey")
    )


@register(
    "j_left_semi",
    """
    SELECT c_custkey, c_name
    FROM customer c
    SEMI JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_totalprice > 300000
    ORDER BY c_custkey
    """,
    "join",
)
def j_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join: customers having at least one big order —
    no duplication, no right-side columns."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "sub_correlated_exists",
    """
    SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5001) AS BIGINT) AS total_price_e2
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
    )
    ORDER BY o_orderkey
    """,
    "subquery",
)
def sub_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — Catalyst decorrelates it to a left-semi
    join; expressed through the SQL surface to prove the engine's
    SQL-text path handles subqueries."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    o.createOrReplaceTempView("v_orders")
    li.createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5001) AS BIGINT) AS total_price_e2
        FROM v_orders o
        WHERE EXISTS (
          SELECT 1 FROM v_lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
        )
        ORDER BY o_orderkey
        """
    )


@register(
    "sub_scalar_avg",
    """
    SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5001) AS BIGINT) AS total_price_e2
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) * 2 FROM orders)
    ORDER BY o_orderkey
    """,
    "subquery",
)
def sub_scalar_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (orders above 2× the mean),
    via the SQL-text surface."""
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("v_orders2")
    return spark.sql(
        """
        SELECT o_orderkey, CAST(floor(o_totalprice * 100 + 0.5001) AS BIGINT) AS total_price_e2
        FROM v_orders2
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 2 FROM v_orders2)
        ORDER BY o_orderkey
        """
    )


@register(
    "sub_in_subquery",
    """
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE l_orderkey IN (
      SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    ORDER BY l_orderkey, l_linenumber
    """,
    "subquery",
)
def sub_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery predicate → left-semi join under Catalyst."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_semi")
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    )


@register("a_approx_count_distinct", None, "agg", "approx")
def a_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the 100 TB path for A9-style
    distinct counting (exact distinct shuffles every value; HLL ships
    one sketch per partition). No SQL oracle: the estimate is
    engine-specific — rows-only check; the companion exact value is
    covered by a_stats_summary's n_users.

    rsd stays at Spark's 0.05 default: tightening to 0.01 inflates
    the HLL++ state to 1,639 aggregate buffer words per group (a
    100 KB physical plan and a multi-second whole-stage-codegen
    compile for this two-line query), a 26× state cost for 5× less
    error — the wrong trade for a monitoring count; callers that
    need exactness use the exact path."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users")
    ).orderBy("event_type")


@register("a_hll_incremental_uniques", None, "agg", "approx", "incremental")
def a_hll_incremental_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental distinct-count maintenance with MERGEABLE HLL
    sketches (Apache DataSketches, Spark 4 `hll_sketch_agg` /
    `hll_union_agg`): build one compact sketch per day, then union the
    stored sketches into the monthly unique-user estimate WITHOUT
    rescanning events — the warehouse pattern where each ETL run
    aggregates only its increment and rollups merge state.  The same
    shape as operators/rollup.py's count/sum partials, for the one
    aggregate (COUNT DISTINCT) that has no algebraic partial.

    No SQL oracle (sketch bytes are engine-specific) — rows-only
    check; tests/test_hll_incremental.py proves merged-estimate ==
    one-shot estimate and pins the error vs the exact count."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    per_day = daily.select(
        "day",
        F.hll_sketch_estimate("sk").alias("est_uniques"),
        "n_events",
    )
    month = daily.agg(
        F.lit(None).cast("date").alias("day"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_uniques"),
        F.sum("n_events").alias("n_events"),
    )
    return per_day.unionAll(month).orderBy(F.col("day").asc_nulls_last())


@register(
    "a_hll_set_intersection", None, "agg", "approx", "sketch"
)
def a_hll_set_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation from MERGEABLE sketches: estimate
    |A ∩ B| between event-type user sets by inclusion-exclusion over
    HLL sketches (est_a + est_b − est_union) — the warehouse pattern
    for overlap questions ("how many purchasers also clicked?") when
    only per-segment sketches are stored, never the raw id sets.
    Each pair's exact intersection rides along so the estimate is
    audited in-query.

    No SQL oracle (sketch bytes are engine-specific) — rows-only
    check; tests/test_hll_intersection.py pins the error envelope vs
    the exact counts and the sketch-algebra sanity invariants.

    Scale: one sketch per segment (KB each, built in one grouped
    pass); the pair table is |segments|² rows of sketch algebra —
    nothing downstream touches the fact again.  The exact audit
    columns are the only corpus-sized joins and exist for the test;
    production keeps just the sketch path."""
    types = ["click", "purchase", "signup"]
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(types)
    )
    sk = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    a = sk.select(
        F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a")
    )
    b = sk.select(
        F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b")
    )
    # |segments|² pair table (3 rows × 3 rows here) — intentional
    # tiny non-equi join, never fact-sized
    pairs = a.join(b, F.col("type_a") < F.col("type_b"))
    est = pairs.select(
        "type_a",
        "type_b",
        F.hll_sketch_estimate("sk_a").cast("long").alias("est_a"),
        F.hll_sketch_estimate("sk_b").cast("long").alias("est_b"),
        F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
        .cast("long")
        .alias("est_union"),
    ).withColumn(
        "est_intersection",
        F.col("est_a") + F.col("est_b") - F.col("est_union"),
    )
    du = e.select("event_type", "user_id").distinct()
    ua = du.select(
        F.col("event_type").alias("type_a"), F.col("user_id").alias("u")
    )
    ub = du.select(
        F.col("event_type").alias("type_b"), F.col("user_id").alias("u")
    )
    exact = (
        ua.join(ub, "u")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_intersection"))
    )
    return (
        est.join(exact, ["type_a", "type_b"])
        .orderBy("type_a", "type_b")
    )


@register(
    "e_sliding_uniques_hll", None, "agg", "approx", "sketch", "window"
)
def e_sliding_uniques_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window COUNT DISTINCT from daily sketch panes: build
    one HLL sketch per day (one grouped pass over the fact), then
    produce each day's trailing-7-day unique-user estimate by UNIONING
    the 7 daily sketches — the standard pane trick that turns sliding
    distinct counts from 7 fact re-scans (or one giant
    dropDuplicates) into |days| × 7 sketch merges of KB-sized state.
    The exact trailing count rides along as an in-query audit.

    No SQL oracle (sketch bytes are engine-specific) — rows-only;
    tests/test_hll_intersection.py::test_sliding_panes pins the
    estimate envelope vs the exact column.

    Scale: the fact is scanned twice (sketch build + the exact audit,
    which production drops); the pane join is a |days|-row spine
    self-join bounded by the window length, and every merge input is
    a compact sketch, so the sliding series costs O(days × window)
    regardless of corpus size."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    spine = daily.select(F.col("day").alias("anchor"))
    panes = spine.join(
        daily,
        (F.col("day") <= F.col("anchor"))
        & (F.col("day") >= F.date_sub(F.col("anchor"), 6)),
    )
    est = panes.groupBy("anchor").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
        .cast("long")
        .alias("est_uniques_7d"),
        F.count(F.lit(1)).cast("long").alias("n_panes"),
    )
    # exact audit: same window predicate on the distinct (day, user)
    # pairs — production drops this branch and keeps only sketches
    du = e.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    exact = (
        spine.join(
            du,
            (F.col("day") <= F.col("anchor"))
            & (F.col("day") >= F.date_sub(F.col("anchor"), 6)),
        )
        .groupBy("anchor")
        .agg(
            F.countDistinct("user_id").cast("long").alias("exact_uniques_7d")
        )
    )
    return est.join(exact, "anchor").orderBy("anchor")
