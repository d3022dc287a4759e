"""Classic BI / customer-analytics shapes: RFM segmentation,
Pareto (ABC) revenue concentration, and cross-table reconciliation.

These are the warehouse queries every finance/commerce deployment
runs on top of the fact tables — quartile scoring with window
functions, cumulative-share classification, and the
order-header-vs-lines consistency audit (the cross-TABLE counterpart
of the reference's row-level identity check, quality.py Q4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from finance_etl_pipeline_spark.functions.scalars import (
    fround,
    igrid,
    sql_igrid,
    sql_round,
)
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import table


@register(
    "bi_rfm_segments",
    """
    WITH purchases AS (
      SELECT user_id,
             max(ts) AS last_ts,
             count(*) AS frequency,
             sum(value) AS monetary
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    scored AS (
      SELECT user_id,
             ntile(4) OVER (ORDER BY last_ts DESC, user_id) AS r_score,
             ntile(4) OVER (ORDER BY frequency DESC, user_id) AS f_score,
             ntile(4) OVER (ORDER BY monetary DESC, user_id) AS m_score
      FROM purchases
    )
    SELECT r_score, f_score, m_score, count(*) AS n_users
    FROM scored GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """,
    "bi",
    "window",
    "agg",
)
def bi_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: quartile-score every purchaser on recency /
    frequency / monetary (ntile with user_id tie-break so quartile
    edges are deterministic), then count the segment grid — the
    classic CRM cut.  One purchase aggregate + three global ntiles
    (single-partition windows over |users| rows — at 100 TB swap for
    percentile-threshold joins; the aggregate stage is unchanged)."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    purchases = e.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum("value").alias("monetary"),
    )
    scored = purchases.select(
        "user_id",
        F.ntile(4)
        .over(Window.orderBy(F.desc("last_ts"), "user_id"))
        .alias("r_score"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("frequency"), "user_id"))
        .alias("f_score"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("monetary"), "user_id"))
        .alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("r_score", "f_score", "m_score")
    )


@register(
    "bi_pareto_abc",
    f"""
    WITH rev AS (
      SELECT o_custkey, sum(o_totalprice) AS revenue
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT o_custkey, revenue,
             sum(revenue) OVER (ORDER BY revenue DESC, o_custkey
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               / sum(revenue) OVER () AS cum_share
      FROM rev
    ),
    classed AS (
      SELECT o_custkey,
             CASE WHEN {sql_round('cum_share', 6)} <= 0.5 THEN 'A'
                  WHEN {sql_round('cum_share', 6)} <= 0.8 THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM ranked
    )
    SELECT abc_class, count(*) AS n_customers
    FROM classed GROUP BY abc_class ORDER BY abc_class
    """,
    "bi",
    "window",
    "agg",
)
def bi_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC revenue concentration: customers sorted by
    revenue, classified by cumulative share (A: first 50% of revenue,
    B: to 80%, C: tail) — the 80/20 view behind account tiering.
    The cumulative share is rounded BEFORE the class thresholds so a
    summation-order ULP can't flip a boundary customer's class.
    Shape: one aggregate + one global cumulative window (driver-size
    data after the aggregate) + a 3-row count."""
    o = table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("revenue"))
    w_cum = Window.orderBy(F.desc("revenue"), "o_custkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    share = fround(
        F.sum("revenue").over(w_cum) / F.sum("revenue").over(w_all), 6
    )
    classed = rev.select(
        F.when(share <= 0.5, "A").when(share <= 0.8, "B").otherwise("C").alias(
            "abc_class"
        )
    )
    return (
        classed.groupBy("abc_class")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("abc_class")
    )


@register(
    "dq_order_reconciliation",
    f"""
    WITH line_sums AS (
      SELECT l_orderkey,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5001) AS BIGINT)) AS BIGINT) AS line_e2
      FROM lineitem GROUP BY l_orderkey
    ),
    joined AS (
      SELECT o.o_orderkey,
             CAST(floor(o.o_totalprice * 100 + 0.5001) AS BIGINT) AS header_e2,
             coalesce(ls.line_e2, 0) AS line_e2
      FROM orders o LEFT JOIN line_sums ls ON o.o_orderkey = ls.l_orderkey
    )
    SELECT CASE
             WHEN line_e2 = 0 THEN 'no_lines'
             WHEN abs(header_e2 - line_e2) <= 1 THEN 'reconciled'
             WHEN CAST(abs(header_e2 - line_e2) AS DOUBLE) / header_e2 <= 0.05 THEN 'small_drift'
             ELSE 'mismatch'
           END AS status,
           count(*) AS n_orders,
           CAST(sum(abs(header_e2 - line_e2)) AS BIGINT) AS abs_delta_total_e2
    FROM joined GROUP BY status ORDER BY status
    """,
    "bi",
    "quality",
    "finance",
)
def dq_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-lines reconciliation: every order's o_totalprice
    against the sum of its lineitem extendedprices, bucketed into
    reconciled / small-drift / mismatch / no-lines — the cross-table
    consistency audit (the reference's Q4 identity check is the
    row-level analogue).  Both sides rounded through the shared
    contract before comparison.  One lineitem aggregate co-keyed
    with the join; the report is 4 rows."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    line_sums = li.groupBy("l_orderkey").agg(
        F.sum(igrid("l_extendedprice", 2)).alias("line_e2")
    )
    joined = o.select(
        "o_orderkey", igrid("o_totalprice", 2).alias("header_e2")
    ).join(
        line_sums.withColumnRenamed("l_orderkey", "o_orderkey"),
        "o_orderkey",
        "left",
    ).withColumn("line_e2", F.coalesce("line_e2", F.lit(0)))
    delta = F.abs(F.col("header_e2") - F.col("line_e2"))
    status = (
        F.when(F.col("line_e2") == 0, "no_lines")
        .when(delta <= 1, "reconciled")
        .when(
            delta.cast("double") / F.col("header_e2") <= 0.05, "small_drift"
        )
        .otherwise("mismatch")
    )
    return (
        joined.select(status.alias("status"), delta.alias("d"))
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("d").cast("long").alias("abs_delta_total_e2"),
        )
        .orderBy("status")
    )


@register(
    "dq_duplicate_payment_screen",
    """
    WITH keyed AS (
      SELECT o_custkey,
             CAST(o_orderdate AS DATE) AS order_date,
             CAST(floor(o_totalprice * 100 + 0.5001) AS BIGINT) AS amount_e2,
             o_orderkey
      FROM orders
    ),
    grouped AS (
      SELECT o_custkey, order_date, amount_e2,
             count(*) AS n_orders,
             min(o_orderkey) AS first_orderkey,
             max(o_orderkey) AS last_orderkey
      FROM keyed
      GROUP BY o_custkey, order_date, amount_e2
      HAVING count(*) > 1
    )
    SELECT o_custkey, order_date, amount_e2,
           CAST(n_orders AS BIGINT) AS n_orders,
           first_orderkey, last_orderkey
    FROM grouped
    ORDER BY o_custkey, order_date, amount_e2
    """,
    "bi",
    "quality",
    "finance",
)
def dq_duplicate_payment_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment screen: same customer, same day, same amount
    (to the cent) across DIFFERENT order keys — the forensic double-
    posting check every AP audit runs (next to the Benford digit test
    and the header/lines reconciliation).  Amounts are compared as
    exact cent integers, so float noise can neither split a true
    duplicate nor merge near-misses.

    Scale: one groupBy on the composite (customer, day, cents) key —
    high cardinality, map-side combined; output ∝ violations."""
    o = table(spark, sf_dir, "orders")
    keyed = o.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        igrid("o_totalprice", 2).alias("amount_e2"),
        "o_orderkey",
    )
    return (
        keyed.groupBy("o_custkey", "order_date", "amount_e2")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_orderkey").alias("first_orderkey"),
            F.max("o_orderkey").alias("last_orderkey"),
        )
        .filter(F.col("n_orders") > 1)
        .select(
            "o_custkey",
            "order_date",
            "amount_e2",
            F.col("n_orders").cast("long").alias("n_orders"),
            "first_orderkey",
            "last_orderkey",
        )
        .orderBy("o_custkey", "order_date", "amount_e2")
    )


_AGING_ASOF = "1998-08-02"  # dataset's last order date serves as 'today'


@register(
    "bi_order_aging",
    f"""
    WITH open_orders AS (
      SELECT o_orderkey, o_custkey, o_orderdate,
             CAST(floor(o_totalprice * 100 + 0.5001) AS BIGINT) AS amount_e2,
             date_diff('day', CAST(o_orderdate AS DATE), DATE '{_AGING_ASOF}')
               AS age_days
      FROM orders WHERE o_orderstatus = 'O'
    )
    SELECT CASE WHEN age_days <= 365 THEN '0-365'
                WHEN age_days <= 730 THEN '366-730'
                WHEN age_days <= 1095 THEN '731-1095'
                ELSE '1095+' END AS age_bucket,
           count(*) AS n_orders,
           CAST(sum(amount_e2) AS BIGINT) AS total_e2,
           CAST(min(age_days) AS BIGINT) AS min_age_days,
           CAST(max(age_days) AS BIGINT) AS max_age_days
    FROM open_orders
    GROUP BY age_bucket ORDER BY age_bucket
    """,
    "bi",
    "finance",
    "agg",
)
def bi_order_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order aging report: orders still in status 'O' bucketed
    by age at the dataset's as-of date, with cent-exact exposure per
    bucket — the receivables-aging shape every finance close produces
    (the as-of date is pinned to the data's horizon so the report is
    reproducible; production binds it to the close date).

    Scale: a status filter pushed to the scan, a narrow age map, a
    4-bucket aggregate."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    age = F.datediff(
        F.lit(_AGING_ASOF).cast("date"), F.col("o_orderdate").cast("date")
    )
    bucket = (
        F.when(age <= 365, "0-365")
        .when(age <= 730, "366-730")
        .when(age <= 1095, "731-1095")
        .otherwise("1095+")
    )
    return (
        o.select(
            bucket.alias("age_bucket"),
            igrid("o_totalprice", 2).alias("amount_e2"),
            age.alias("age_days"),
        )
        .groupBy("age_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("amount_e2").cast("long").alias("total_e2"),
            F.min("age_days").cast("long").alias("min_age_days"),
            F.max("age_days").cast("long").alias("max_age_days"),
        )
        .orderBy("age_bucket")
    )


@register(
    "bi_new_vs_returning_revenue",
    f"""
    WITH firsts AS (
      SELECT o_custkey,
             min(CAST(o_orderdate AS DATE)) AS first_day
      FROM orders GROUP BY o_custkey
    ),
    labeled AS (
      SELECT strftime(o.o_orderdate, '%Y-%m') AS month,
             CASE WHEN CAST(o.o_orderdate AS DATE) = f.first_day
                  THEN 'new' ELSE 'returning' END AS cohort,
             o.o_totalprice AS price
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    )
    SELECT month, cohort,
           count(*) AS n_orders,
           {sql_igrid('sum(price)', 2)} AS revenue_e2
    FROM labeled
    GROUP BY month, cohort
    ORDER BY month, cohort
    """,
    "bi",
    "window",
)
def bi_new_vs_returning_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue split into new-customer vs returning-customer
    orders — the acquisition-vs-retention decomposition every
    commerce dashboard leads with (the reference's KPI table slices
    by entity/month; this slices by customer lifecycle).  'New' =
    the order lands on the customer's first-ever order DAY, so a
    customer's multiple same-day first orders all count as new —
    stated in both engines identically via the min-date join.

    Scale: the firsts table is one aggregate over orders keyed by
    customer (map-side combined), joined back on o_custkey —
    co-partitioned with the fact it came from; no window over the
    full fact, no broadcast hint (AQE picks one while firsts is
    small)."""
    o = table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.min(F.col("o_orderdate").cast("date")).alias("first_day")
    )
    labeled = o.join(firsts, "o_custkey").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.when(
            F.col("o_orderdate").cast("date") == F.col("first_day"), "new"
        )
        .otherwise("returning")
        .alias("cohort"),
        F.col("o_totalprice").alias("price"),
    )
    return (
        labeled.groupBy("month", "cohort")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            igrid(F.sum("price"), 2).alias("revenue_e2"),
        )
        .orderBy("month", "cohort")
    )


@register(
    "bi_balance_rollforward",
    f"""
    WITH monthly AS (
      SELECT n.n_name AS nation,
             strftime(o.o_orderdate, '%Y-%m') AS month,
             CAST(count(*) AS BIGINT) AS n_orders,
             {sql_igrid('sum(o.o_totalprice)', 2)} AS activity_e2
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY nation, month
    )
    SELECT nation, month, n_orders, activity_e2,
           CAST(sum(activity_e2) OVER (PARTITION BY nation ORDER BY month
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - activity_e2 AS BIGINT) AS opening_e2,
           CAST(sum(activity_e2) OVER (PARTITION BY nation ORDER BY month
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS closing_e2
    FROM monthly ORDER BY nation, month
    """,
    "bi",
    "window",
    "agg",
)
def bi_balance_rollforward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balance rollforward per nation-month — the ledger-continuity
    shape every receivables/GL report leads with: opening balance +
    period activity = closing balance, with closing(m) ≡ opening(m+1)
    by construction.  The finance twin of the reference's monthly KPI
    table, lifted to cumulative form.

    Exactness: monthly activity is gridded to cents (BIGINT) at the
    aggregate, so the running balance is pure integer arithmetic —
    opening/closing can never drift from the activity column by a
    summation-order ulp.  Months with no activity for a nation carry
    the balance implicitly (the cumsum skips them).

    Scale: orders↔customer is a co-partitioned key join (AQE
    broadcasts the 25-row nation dim unhinted); everything after the
    first aggregate is |nations × months| rows, so the running-sum
    window sorts a bounded table, never the fact."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    monthly = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            igrid(F.sum("o_totalprice"), 2).alias("activity_e2"),
        )
    )
    w = (
        Window.partitionBy("nation")
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    closing = F.sum("activity_e2").over(w)
    return monthly.select(
        "nation",
        "month",
        "n_orders",
        "activity_e2",
        (closing - F.col("activity_e2")).cast("long").alias("opening_e2"),
        closing.cast("long").alias("closing_e2"),
    ).orderBy("nation", "month")


@register(
    "bi_rfm_migration",
    """
    WITH p AS (
      SELECT user_id, strftime(ts, '%Y-%m') AS month,
             CAST(floor(sum(value) * 100 + 0.5001) AS BIGINT) AS monetary
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, month
    ),
    seg AS (
      SELECT user_id, month,
             ntile(4) OVER (PARTITION BY month
                            ORDER BY monetary DESC, user_id) AS q,
             strftime(CAST(month || '-01' AS DATE) + INTERVAL 1 MONTH,
                      '%Y-%m') AS next_month
      FROM p
    ),
    mm AS (SELECT min(month) AS lo, max(month) AS hi FROM p),
    moves AS (
      SELECT a.q AS q_from, b.q AS q_to
      FROM seg a JOIN seg b
        ON a.user_id = b.user_id AND a.next_month = b.month
    ),
    churned AS (
      SELECT a.q AS q_from, 0 AS q_to
      FROM seg a CROSS JOIN mm
      WHERE a.month <> mm.hi AND NOT EXISTS (
        SELECT 1 FROM seg b
        WHERE b.user_id = a.user_id AND b.month = a.next_month)
    ),
    fresh AS (
      SELECT 0 AS q_from, b.q AS q_to
      FROM seg b CROSS JOIN mm
      WHERE b.month <> mm.lo AND NOT EXISTS (
        SELECT 1 FROM seg a
        WHERE a.user_id = b.user_id AND a.next_month = b.month)
    )
    SELECT CAST(q_from AS BIGINT) AS q_from,
           CAST(q_to AS BIGINT) AS q_to,
           CAST(count(*) AS BIGINT) AS n_users
    FROM (SELECT * FROM moves UNION ALL SELECT * FROM churned
          UNION ALL SELECT * FROM fresh)
    GROUP BY q_from, q_to ORDER BY q_from, q_to
    """,
    "bi",
    "window",
)
def bi_rfm_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month monetary-quartile migration matrix — the
    customer-lifecycle flow report behind every retention deck: of
    last month's Q1 spenders, how many stayed Q1, slipped, churned
    (sentinel 0), and how many spenders are new this month (from 0).
    Boundary months are excluded from the artificial legs (everyone
    would 'churn' after the last month and be 'new' in the first).

    Determinism: monthly monetary is cent-gridded BIGINT, and ntile
    orders by (monetary DESC, user_id) — a total order, so both
    engines assign identical quartiles.

    Scale: the quartile window partitions by month and sorts that
    month's active spenders; for user counts where a per-month sort
    hurts, swap ntile for rank-banded assignment (the
    ``s_per_source_cap`` banding) or boundary joins from
    ``prof_range_partition_plan`` percentiles.  The migration join is
    user-keyed and co-partitioned; all outputs are ≤ 24 rows."""
    e = table(spark, sf_dir, "events")
    per_um = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(
            "user_id", F.date_format("ts", "yyyy-MM").alias("month")
        )
        .agg(igrid(F.sum("value"), 2).alias("monetary"))
    )
    w = Window.partitionBy("month").orderBy(
        F.desc("monetary"), F.col("user_id")
    )
    seg = per_um.select(
        "user_id",
        "month",
        F.ntile(4).over(w).alias("q"),
        F.date_format(
            F.add_months(
                F.to_date(F.concat(F.col("month"), F.lit("-01"))), 1
            ),
            "yyyy-MM",
        ).alias("next_month"),
    ).localCheckpoint(eager=True)
    mm = seg.agg(
        F.min("month").alias("lo"), F.max("month").alias("hi")
    )
    a = seg.select(
        F.col("user_id").alias("a_user"),
        F.col("month").alias("a_month"),
        F.col("q").alias("q_from"),
        F.col("next_month").alias("a_next"),
    )
    b = seg.select(
        F.col("user_id").alias("b_user"),
        F.col("month").alias("b_month"),
        F.col("q").alias("q_to"),
    )
    moves = a.join(
        b,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("a_next") == F.col("b_month")),
    ).select("q_from", "q_to")
    churned = (
        a.crossJoin(F.broadcast(mm))
        .filter(F.col("a_month") != F.col("hi"))
        .join(
            b,
            (F.col("a_user") == F.col("b_user"))
            & (F.col("a_next") == F.col("b_month")),
            "left_anti",
        )
        .select("q_from", F.lit(0).alias("q_to"))
    )
    prev_of_b = a.select(
        F.col("a_user").alias("p_user"), F.col("a_next").alias("p_next")
    )
    fresh = (
        b.crossJoin(F.broadcast(mm))
        .filter(F.col("b_month") != F.col("lo"))
        .join(
            prev_of_b,
            (F.col("b_user") == F.col("p_user"))
            & (F.col("b_month") == F.col("p_next")),
            "left_anti",
        )
        .select(F.lit(0).alias("q_from"), "q_to")
    )
    return (
        moves.unionByName(churned)
        .unionByName(fresh)
        .groupBy(
            F.col("q_from").cast("long").alias("q_from"),
            F.col("q_to").cast("long").alias("q_to"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("q_from", "q_to")
    )
