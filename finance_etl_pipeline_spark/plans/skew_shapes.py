"""Scale-technique parity queries: rewrites a 1000-executor cluster
needs (salting for hot keys, range-partition planning) proven
value-identical to their naive forms.

The reference's pandas pipeline never needs these — a single process
has no stragglers — but at 100 TB they are the difference between an
even stage and one task holding 999 executors hostage.  Each query
here runs the SCALE-SAFE rewrite in Spark and pairs it with the naive
ANSI form as the DuckDB oracle, so the correctness gate itself proves
the rewrite is semantics-preserving:

- ``j_salted_skew_join`` executes ``operators/skew.py``'s
  replicate-dim salted join (fact salts randomly, dim explodes one
  copy per salt) and must produce the exact aggregate a plain join
  produces — salt is plumbing, never semantics.
- ``prof_range_partition_plan`` computes the boundary table
  ``repartitionByRange`` needs — but from exact percentiles as a
  distributed aggregate rather than a global sort, then audits the
  resulting bucket occupancy.  Spark's own RangePartitioner samples
  (reservoir per partition); this is the exact-twin audit you run to
  validate a chosen boundary set before a big write.

Reference parity: the reference has no distributed layer (single
pandas process, finance-etl-pipeline transform.py); these extend
SURVEY.md §2's join/profile families with the cluster-only shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.scalars import (
    igrid,
    sql_igrid,
    sql_round,
)
from finance_etl_pipeline_spark.operators.skew import salted_left_join
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import table


@register(
    "j_salted_skew_join",
    f"""
    SELECT c.c_mktsegment AS mktsegment,
           count(*) AS n_orders,
           {sql_igrid('sum(o.o_totalprice)', 2)} AS revenue_e2
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY mktsegment
    """,
    "join",
    "skew",
)
def j_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order revenue per market segment through a SALTED left join.

    The fact (orders) takes a random salt in [0, 8); the dim
    (customer) explodes to one copy per salt; the join key becomes
    (custkey, salt) so a hot customer's orders spread over 8 reducers
    instead of one.  The oracle is the PLAIN join — identical output
    is the proof that salting never changes semantics, only placement.
    Dim replication cost is 8× |customer| rows of 2 columns, paid
    only when a profiled hot key justifies it (see prof_key_skew);
    AQE's runtime skew split handles the sort-merge case, salting
    handles skew known in advance (tests/test_aqe_skew.py compares).
    """
    o = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    joined = salted_left_join(o, c, "custkey", salts=8)
    return (
        joined.groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            igrid(F.sum("o_totalprice"), 2).alias("revenue_e2"),
        )
        .orderBy("mktsegment")
    )


_NBUCKETS = 8


def _boundary_exprs() -> list:
    """Exact percentile boundaries j/8, rounded to the e4 grid so a
    1-ulp interpolation difference between engines cannot move a row
    across a bucket edge (prices carry 2 decimals; boundaries live on
    the 4-decimal grid between them).

    ONE array-percentile aggregate (the curation.py tx_ppl_buckets
    pattern): 7 scalar ``percentile()`` calls each buffer every value
    independently — 7 copies of the column per task, and the measured
    wall for this query was 15.6 s at sf0.1.  The array form shares a
    single buffer and reads all 7 points from one sort (→ ~2 s).
    Same algorithm, bit-identical boundaries."""
    from finance_etl_pipeline_spark.functions.scalars import fround

    arr = F.expr(
        "percentile(l_extendedprice, array("
        + ", ".join(
            f"cast({j}.0/{_NBUCKETS} as double)"
            for j in range(1, _NBUCKETS)
        )
        + "))"
    )
    return [
        fround(F.element_at(arr, j), 4).alias(f"b{j}")
        for j in range(1, _NBUCKETS)
    ]


@register(
    "prof_range_partition_plan",
    f"""
    WITH b AS (
      SELECT {', '.join(
        sql_round(f'quantile_cont(l_extendedprice, {j}.0/{_NBUCKETS})', 4)
        + f' AS b{j}' for j in range(1, _NBUCKETS)
      )}
      FROM lineitem
    ),
    assigned AS (
      SELECT l.l_extendedprice AS price,
             1 {' '.join(
               f'+ CASE WHEN l.l_extendedprice > b.b{j} THEN 1 ELSE 0 END'
               for j in range(1, _NBUCKETS)
             )} AS bucket
      FROM lineitem l CROSS JOIN b
    )
    SELECT bucket,
           count(*) AS n_rows,
           {sql_igrid('min(price)', 2)} AS min_price_e2,
           {sql_igrid('max(price)', 2)} AS max_price_e2,
           {sql_igrid('sum(price)', 2)} AS sum_price_e2
    FROM assigned
    GROUP BY bucket
    ORDER BY bucket
    """,
    "profile",
    "partitioning",
)
def prof_range_partition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partition boundary plan + occupancy audit for a sorted
    write of lineitem by l_extendedprice into 8 buckets.

    Boundaries come from EXACT percentiles computed as one
    distributed aggregate — no global sort, no single-partition
    window (NTILE over an unpartitioned window would funnel 100 TB
    through one task; this shape never does).  The 1-row boundary
    frame broadcasts back onto the scan and bucket assignment is a
    chain of codegen'd comparisons.  At cluster scale you'd swap
    ``percentile`` for ``percentile_approx`` (a_percentiles_approx
    documents the error bound) and feed the boundaries to
    ``repartitionByRange``/sortWithinPartitions for a skip-friendly
    layout (operators/zorder.py writes it); the exact form here is
    the audit oracle for that plan."""
    li = table(spark, sf_dir, "lineitem")
    b = li.agg(*_boundary_exprs())
    bucket = F.lit(1)
    for j in range(1, _NBUCKETS):
        bucket = bucket + F.when(
            F.col("l_extendedprice") > F.col(f"b{j}"), 1
        ).otherwise(0)
    return (
        li.crossJoin(F.broadcast(b))
        .select(
            F.col("l_extendedprice").alias("price"),
            bucket.alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            igrid(F.min("price"), 2).alias("min_price_e2"),
            igrid(F.max("price"), 2).alias("max_price_e2"),
            igrid(F.sum("price"), 2).alias("sum_price_e2"),
        )
        .orderBy("bucket")
    )


_TARGET_PART_BYTES = 128 * 1024 * 1024

# (table, [(column, kind)]) — kind drives the per-row byte model:
# fixed-width natives at their in-memory width, strings at
# chars + 4 bytes of offset/length overhead.  The spec is written
# out once and shared verbatim by the Spark plan and the oracle so
# the two engines price the identical schema.
_SIZE_SPECS = [
    ("documents", [("doc_id", 8), ("text", "str"), ("lang", "str"),
                   ("source", "str"), ("n_chars", 8)]),
    ("events", [("event_id", 8), ("ts", 8), ("user_id", 8),
                ("event_type", "str"), ("value", 8), ("props", "str")]),
    ("lineitem", [("l_orderkey", 8), ("l_partkey", 8), ("l_suppkey", 8),
                  ("l_linenumber", 4), ("l_quantity", 8),
                  ("l_extendedprice", 8), ("l_discount", 8), ("l_tax", 8),
                  ("l_returnflag", "str"), ("l_linestatus", "str"),
                  ("l_shipdate", 8)]),
    ("orders", [("o_orderkey", 8), ("o_custkey", 8),
                ("o_orderstatus", "str"), ("o_totalprice", 8),
                ("o_orderdate", 8), ("o_orderpriority", "str")]),
]


def _advisor_sql() -> str:
    parts = []
    for t, cols in _SIZE_SPECS:
        fixed = sum(k for _, k in cols if k != "str")
        strs = " + ".join(
            f"length(coalesce({c}, '')) + 4" for c, k in cols if k == "str"
        )
        row = f"{fixed} + {strs}" if strs else str(fixed)
        parts.append(f"""
    SELECT '{t}' AS dataset,
           count(*) AS n_rows,
           CAST(sum({row}) AS BIGINT) AS est_bytes,
           greatest(CAST(1 AS BIGINT),
                    (CAST(sum({row}) AS BIGINT) + {_TARGET_PART_BYTES - 1})
                    // {_TARGET_PART_BYTES}) AS target_partitions
    FROM {t}""")
    return " UNION ALL ".join(parts) + " ORDER BY dataset"


@register(
    "prof_partition_advisor",
    _advisor_sql(),
    "profile",
    "partitioning",
)
def prof_partition_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-count advisor: estimated uncompressed bytes per
    dataset from an explicit per-column width model (natives at
    fixed width, strings at chars+4), and the partition count that
    lands each dataset at the 128 MiB target
    ``spark.sql.files.maxPartitionBytes`` / shuffle-partition sizing
    both assume.  This is the number you feed to ``repartition(n)``
    before a big write, or use to sanity-check
    ``spark.sql.shuffle.partitions`` for a join on the table — at
    sf0.1 everything fits one partition; at 100 TB the same query
    prints the honest 10⁵-partition plan.  One aggregate pass per
    table, no shuffle beyond the 1-row-per-table merge."""
    out = None
    for t, cols in _SIZE_SPECS:
        fixed = sum(k for _, k in cols if k != "str")
        row = F.lit(fixed)
        for c, k in cols:
            if k == "str":
                row = row + F.length(F.coalesce(F.col(c), F.lit(""))) + 4
        df = (
            table(spark, sf_dir, t)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(row).cast("long").alias("est_bytes"),
            )
            .select(
                F.lit(t).alias("dataset"),
                "n_rows",
                "est_bytes",
                F.greatest(
                    F.lit(1).cast("long"),
                    (
                        (F.col("est_bytes") + (_TARGET_PART_BYTES - 1))
                        / _TARGET_PART_BYTES
                    ).cast("long"),
                ).alias("target_partitions"),
            )
        )
        out = df if out is None else out.unionByName(df)
    return out.orderBy("dataset")


@register(
    "prof_value_boxplot",
    f"""
    WITH s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             {sql_igrid('quantile_cont(value, 0.25)', 4)} AS p25_e4,
             {sql_igrid('quantile_cont(value, 0.50)', 4)} AS p50_e4,
             {sql_igrid('quantile_cont(value, 0.75)', 4)} AS p75_e4
      FROM events GROUP BY event_type
    ),
    f AS (
      SELECT *, p75_e4 - p25_e4 AS iqr_e4 FROM s
    ),
    o AS (
      SELECT e.event_type,
             CAST(sum(CASE WHEN 2 * {sql_igrid('e.value', 4)}
                                < 2 * f.p25_e4 - 3 * f.iqr_e4
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_low_outliers,
             CAST(sum(CASE WHEN 2 * {sql_igrid('e.value', 4)}
                                > 2 * f.p75_e4 + 3 * f.iqr_e4
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers
      FROM events e JOIN f ON e.event_type = f.event_type
      GROUP BY e.event_type
    )
    SELECT f.event_type, n, p25_e4, p50_e4, p75_e4, iqr_e4,
           n_low_outliers, n_high_outliers
    FROM f JOIN o ON f.event_type = o.event_type
    ORDER BY f.event_type
    """,
    "profiling",
    "agg",
)
def prof_value_boxplot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group boxplot profile (quartiles, IQR, Tukey-fence outlier
    counts) over event values — the distribution summary a profiler
    draws per column/segment before choosing clamps or winsorization
    caps (complements ``f_winsorize_caps``/``f_mad_outliers``, which
    treat fixed global quantiles).

    Determinism: quartiles grid to e4 integers (the ``a_percentiles``
    contract), and the 1.5×IQR fences are compared in DOUBLED e4
    units (2·v vs 2·p25 − 3·iqr) so the half-unit never divides —
    outlier counts are pure integer comparisons, immune to fence
    arithmetic ulps.

    Scale: stage 1 is one grouped exact-percentile aggregate (swap in
    percentile_approx at corpus scale — ``a_percentiles_approx`` is
    the audited path); stage 2 re-scans the fact against the
    broadcast |event_types|-row fence table and counts map-side."""
    e = table(spark, sf_dir, "events")
    _pct = F.expr("percentile(value, array(0.25, 0.50, 0.75))")  # one buffer
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        igrid(F.element_at(_pct, 1), 4).alias("p25_e4"),
        igrid(F.element_at(_pct, 2), 4).alias("p50_e4"),
        igrid(F.element_at(_pct, 3), 4).alias("p75_e4"),
    )
    fences = s.withColumn(
        "iqr_e4", F.col("p75_e4") - F.col("p25_e4")
    )
    v2 = (igrid(F.col("value"), 4) * 2).alias("v2")
    j = e.select("event_type", v2).join(F.broadcast(fences), "event_type")
    o = j.groupBy("event_type").agg(
        F.sum(
            F.when(
                F.col("v2") < 2 * F.col("p25_e4") - 3 * F.col("iqr_e4"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_low_outliers"),
        F.sum(
            F.when(
                F.col("v2") > 2 * F.col("p75_e4") + 3 * F.col("iqr_e4"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_high_outliers"),
    )
    return (
        fences.join(o, "event_type")
        .select(
            "event_type",
            "n",
            "p25_e4",
            "p50_e4",
            "p75_e4",
            "iqr_e4",
            "n_low_outliers",
            "n_high_outliers",
        )
        .orderBy("event_type")
    )


@register(
    "prof_join_size_forecast",
    f"""
    WITH ol AS (
      SELECT o.k AS k, o.n * l.n AS contrib FROM
        (SELECT o_orderkey AS k, count(*) AS n FROM orders GROUP BY 1) o
        JOIN
        (SELECT l_orderkey AS k, count(*) AS n FROM lineitem GROUP BY 1) l
        USING (k)
    ),
    ev AS (
      SELECT user_id AS k, n * n AS contrib FROM
        (SELECT user_id, count(*) AS n FROM events GROUP BY 1)
    ),
    both_j AS (
      SELECT 'orders_lineitem_orderkey' AS join_name, * FROM ol
      UNION ALL
      SELECT 'events_self_user' AS join_name, * FROM ev
    )
    SELECT join_name,
           CAST(count(*) AS BIGINT) AS n_join_keys,
           CAST(sum(contrib) AS BIGINT) AS forecast_rows,
           CAST(max(contrib) AS BIGINT) AS top_key_rows,
           {sql_igrid('max(contrib) * 1.0 / sum(contrib)', 6)}
             AS top_share_e6
    FROM both_j GROUP BY join_name ORDER BY join_name
    """,
    "profiling",
    "agg",
)
def prof_join_size_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact join-output-size forecast BEFORE running the join:
    Σ_k n_a(k)·n_b(k) from two per-key count aggregates — the planner
    statistic that predicts shuffle blowup (and, via the top key's
    contribution share, whether the blowup is skew: one hot key
    producing most of the output means salt that key, not resize the
    cluster).  Includes the self-join form Σ n(k)² for the
    sessionization/interval-join family, whose cost is quadratic in
    per-user activity.

    Scale: per-key counts partial-aggregate map-side to |distinct
    keys| rows; the counts join is key-to-key (no fact rows move); at
    extreme key cardinality swap the exact counts for CMS estimates
    (operators/sketch.py) — the formula is unchanged."""
    o = table(spark, sf_dir, "orders").groupBy(
        F.col("o_orderkey").alias("k")
    ).agg(F.count(F.lit(1)).alias("n_a"))
    li = table(spark, sf_dir, "lineitem").groupBy(
        F.col("l_orderkey").alias("k")
    ).agg(F.count(F.lit(1)).alias("n_b"))
    ol = o.join(li, "k").select(
        F.lit("orders_lineitem_orderkey").alias("join_name"),
        (F.col("n_a") * F.col("n_b")).alias("contrib"),
    )
    ev = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("events_self_user").alias("join_name"),
            (F.col("n") * F.col("n")).alias("contrib"),
        )
    )
    return (
        ol.unionByName(ev)
        .groupBy("join_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_join_keys"),
            F.sum("contrib").cast("long").alias("forecast_rows"),
            F.max("contrib").cast("long").alias("top_key_rows"),
            igrid(
                F.max("contrib") / F.sum("contrib").cast("double"), 6
            ).alias("top_share_e6"),
        )
        .orderBy("join_name")
    )
