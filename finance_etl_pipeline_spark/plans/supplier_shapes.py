"""Supplier-side query shapes (TPC-H Q7/Q11 style) — exercises the
supplier table's joins to lineitem and nation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.scalars import igrid
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import table


@register(
    "q7_nation_volume",
    """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5001) AS BIGINT)) AS BIGINT) AS revenue_e4
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND sn.n_name != cn.n_name
    GROUP BY sn.n_name, cn.n_name, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    "join",
    "agg",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume — two roles of the
    same dim (nation joined twice under different aliases)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    sn = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)  # supplier ∝ SF: AQE decides
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.sum(
                igrid(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
            ).alias("revenue_e4")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q11_supplier_share",
    """
    WITH per_supp AS (
      SELECT s.s_suppkey, n.n_name,
             sum(CAST(floor(l.l_extendedprice * l.l_quantity * 100 + 0.5001) AS BIGINT)) AS val_e2
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      GROUP BY s.s_suppkey, n.n_name
    )
    SELECT s_suppkey, n_name,
           CAST(val_e2 AS BIGINT) AS supplier_value_e2,
           CAST(floor(CAST(val_e2 AS DOUBLE) / sum(val_e2) OVER () * 100 * 10000 + 0.5001) AS BIGINT) AS pct_of_total_e4
    FROM per_supp
    ORDER BY supplier_value_e2 DESC, s_suppkey
    """,
    "join",
    "agg",
    "window",
)
def q11_supplier_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-supplier value + share of the global total
    (aggregate feeding an unpartitioned window — the single-partition
    window is over |suppliers| rows, not the fact table)."""
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    per_supp = (
        li.join(s, li.l_suppkey == s.s_suppkey)  # supplier ∝ SF: AQE decides
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_suppkey", "n_name")
        .agg(
            F.sum(
                igrid(F.col("l_extendedprice") * F.col("l_quantity"), 2)
            ).alias("val_e2")
        )
    )
    w = Window.partitionBy()
    return per_supp.select(
        "s_suppkey",
        "n_name",
        F.col("val_e2").alias("supplier_value_e2"),
        igrid(
            F.col("val_e2").cast("double") / F.sum("val_e2").over(w) * 100, 4
        ).alias("pct_of_total_e4"),
    ).orderBy(F.desc("supplier_value_e2"), "s_suppkey")
