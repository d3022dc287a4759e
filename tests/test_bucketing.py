"""Bucketed co-located join: pre-bucketing both sides of a recurring
big-big join removes its shuffle entirely — the 100 TB lever when the
same key joins daily (SURVEY.md §4 partitioning row).  Asserts the
bucketed join plan has NO shuffle exchange on either side."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from finance_etl_pipeline_spark.sources.readers import table


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    # warehouse.dir is a static conf — uses ./spark-warehouse (gitignored).
    # Disable broadcast so the join is the sort-merge a big-big join
    # would use (broadcast would hide the co-location being tested).
    # a previous aborted run can leave the managed-table dir behind
    # while the (per-session, in-memory) catalog has no entry for it
    import shutil

    shutil.rmtree("spark-warehouse/buckets_demo.db", ignore_errors=True)
    spark.sql("CREATE DATABASE IF NOT EXISTS buckets_demo")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # restore in finally, and UNSET the adaptive threshold when it was
    # initially unset: leaving -1 behind leaked into every later test
    # in the session and flipped AQE-materialized joins (seen as an
    # order-dependent failure of the iterative-graph plan test)
    try:
        li = table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        )
        o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        (
            li.write.mode("overwrite")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable("buckets_demo.lineitem_b")
        )
        (
            o.write.mode("overwrite")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable("buckets_demo.orders_b")
        )
        lb = spark.table("buckets_demo.lineitem_b")
        ob = spark.table("buckets_demo.orders_b")
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).groupBy(
            "o_orderkey"
        ).agg(F.sum("l_extendedprice").alias("s"))

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan
        # bucketed layout co-locates both sides: no exchange before the join
        assert "Exchange hashpartitioning" not in join_section
        # and the result matches the non-bucketed computation
        expected = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderkey")
            .agg(F.sum("l_extendedprice").alias("s"))
            .count()
        )
        assert joined.count() == expected
        spark.sql("DROP DATABASE buckets_demo CASCADE")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe is not None:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe
            )
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
