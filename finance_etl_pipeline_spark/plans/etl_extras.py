"""ETL utility patterns rounding out the battery: latest-row-per-key
dedup (the CDC/upsert compaction shape) and TPC-H Q19-style
disjunctive pushdown predicates."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.scalars import igrid
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import table


@register(
    "u_latest_per_key",
    """
    SELECT user_id, event_id AS latest_event_id, ts AS latest_ts, value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    ORDER BY user_id
    """,
    "setop",
    "window",
)
def u_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest row per key via a descending row_number — the CDC
    compaction / upsert-resolution shape. Scales as one shuffle on the
    key; at 100 TB prefer partial max_by pre-aggregation when the
    payload is wide."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            F.col("ts").alias("latest_ts"),
            "value",
        )
        .orderBy("user_id")
    )


@register(
    "q19_disjunctive_predicates",
    """
    SELECT CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5001) AS BIGINT)) AS BIGINT) AS revenue_e4
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 5)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 15)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 25)
    """,
    "filter",
    "join",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides — Catalyst
    extracts the common sub-predicates it can push to each scan."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    joined = li.join(p, li.l_partkey == p.p_partkey)  # part ∝ SF: AQE decides
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & (F.col("l_quantity") >= 5))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & (F.col("l_quantity") >= 15))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & (F.col("l_quantity") >= 25))
    )
    return joined.filter(cond).agg(
        F.sum(
            igrid(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
        ).alias("revenue_e4")
    )


@register(
    "gen_date_dim",
    """
    SELECT CAST(d AS DATE) AS date_key,
           CAST(year(d) AS INTEGER) AS year,
           CAST(quarter(d) AS INTEGER) AS quarter,
           CAST(month(d) AS INTEGER) AS month,
           CAST(isodow(d) AS INTEGER) AS iso_dow,
           CAST(CASE WHEN isodow(d) >= 6 THEN 1 ELSE 0 END AS INTEGER)
             AS is_weekend,
           strftime(d, '%Y-%m') AS month_key,
           CAST(date_trunc('week', d) AS DATE) AS week_start
    FROM (
      SELECT unnest(generate_series(DATE '1995-01-01', DATE '1995-12-31',
                                    INTERVAL 1 DAY)) AS d
    )
    ORDER BY date_key
    """,
    "generator",
    "scalar",
)
def gen_date_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-dimension generator: a one-year date spine with the
    standard warehouse attributes (year/quarter/month, ISO weekday,
    weekend flag, month key, week start) — generated in-plan from
    sequence(), no source table at all; the dim every star schema
    joins for fiscal rollups (star.py's dims are data-derived, this
    one is synthetic-complete: no missing dates even where no facts
    exist).

    Scale: generated, not scanned — 365 rows from a literal range;
    broadcastable everywhere."""
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1995-12-31").cast("date"),
            )
        ).alias("d")
    )
    return spine.select(
        F.col("d").alias("date_key"),
        F.year("d").cast("int").alias("year"),
        F.quarter("d").cast("int").alias("quarter"),
        F.month("d").cast("int").alias("month"),
        (F.weekday("d") + 1).cast("int").alias("iso_dow"),
        (F.weekday("d") + 1 >= 6).cast("int").alias("is_weekend"),
        F.date_format("d", "yyyy-MM").alias("month_key"),
        F.date_trunc("week", "d").cast("date").alias("week_start"),
    ).orderBy("date_key")


@register(
    "dq_snapshot_diff",
    """
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
    ),
    new AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 89 = 3 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders
      WHERE o_orderdate < TIMESTAMP '1997-07-01'
        AND o_orderkey % 97 <> 0
    )
    SELECT CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN o.o_orderstatus <> n.o_orderstatus
                  OR o.o_totalprice <> n.o_totalprice THEN 'changed'
                ELSE 'unchanged' END AS change_type,
           count(*) AS n_keys
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    GROUP BY 1 ORDER BY change_type
    """,
    "etl",
    "quality",
    "join",
)
def dq_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between two versions of a keyed table
    (operators/diff.py::table_diff): every key classified added /
    removed / changed / unchanged — the anti-entropy audit after a
    backfill or CDC replay on a plain-Parquet lake.  The two
    snapshots are carved deterministically from orders (six months of
    growth, a 1-in-97 deletion, a 1-in-89 price restatement) so all
    four classes are populated at every SF.

    The Spark path compares per-column md5 digests hashed in
    fixed-width concatenation (16 bytes shuffle per row, not the
    row); the oracle compares the raw VALUES — matching proves the
    hash classification exact, not just self-consistent.  One full
    outer join on the key; pre-bucketed snapshots would skip the
    exchange (tests/test_bucketing.py)."""
    from finance_etl_pipeline_spark.operators.diff import table_diff

    o = table(spark, sf_dir, "orders")
    old = o.where(F.col("o_orderdate") < "1997-01-01").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = (
        o.where(
            (F.col("o_orderdate") < "1997-07-01")
            & (F.col("o_orderkey") % 97 != 0)
        )
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.when(
                F.col("o_orderkey") % 89 == 3, F.col("o_totalprice") + 1.0
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
    )
    return (
        table_diff(old, new, ["o_orderkey"])
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n_keys"))
        .orderBy("change_type")
    )


@register(
    "u_upsert_merge",
    """
    WITH tgt AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
    ),
    src AS (
      SELECT o_orderkey,
             'F' AS o_orderstatus,
             o_totalprice + 10.0 AS o_totalprice
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-06-01'
        AND o_orderdate < TIMESTAMP '1997-07-01'
        AND o_orderkey % 3 = 0
    ),
    merged AS (
      SELECT * FROM src
      UNION ALL
      SELECT t.* FROM tgt t
      WHERE NOT EXISTS (SELECT 1 FROM src s
                        WHERE s.o_orderkey = t.o_orderkey)
    )
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(floor(sum(o_totalprice) * 100 + 0.5001) AS BIGINT)
             AS revenue_e2
    FROM merged
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    "etl",
    "union",
    "join",
)
def u_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert for plain-Parquet tables
    (operators/merge.py::upsert, source-wins): a six-month order
    restatement batch (status forced to 'F', price +10) merged into
    the pre-1997 snapshot — updates overwrite matched keys, unmatched
    source keys insert, untouched target rows survive.  The oracle
    states MERGE's textbook expansion (source UNION ALL
    anti-joined target); matching per-status counts and revenue prove
    the operator's join-based implementation equivalent.

    Scale: one full-outer-shaped join on the key (hash-partitioned);
    the uniqueness guard is a cheap early-out aggregate.  On a real
    lake this runs per partition-predicate slice (dynamic partition
    overwrite, sources/writers.py), never whole-table."""
    from finance_etl_pipeline_spark.operators.merge import upsert

    o = table(spark, sf_dir, "orders")
    tgt = o.where(F.col("o_orderdate") < "1997-01-01").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    src = (
        o.where(
            (F.col("o_orderdate") >= "1996-06-01")
            & (F.col("o_orderdate") < "1997-07-01")
            & (F.col("o_orderkey") % 3 == 0)
        )
        .select(
            "o_orderkey",
            F.lit("F").alias("o_orderstatus"),
            (F.col("o_totalprice") + 10.0).alias("o_totalprice"),
        )
    )
    return (
        upsert(tgt, src, ["o_orderkey"])
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            igrid(F.sum("o_totalprice"), 2).alias("revenue_e2"),
        )
        .orderBy("o_orderstatus")
    )
