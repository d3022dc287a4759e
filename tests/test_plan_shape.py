"""Physical-plan regression tests: the optimizations SURVEY.md §4
promises must actually appear in the executed plan — filters reach the
parquet scan, small dims broadcast, aggregates run partial+final.
A refactor that silently turns a broadcast join into a sort-merge
shuffle or loses pushdown fails here, not in a 100 TB incident."""

from __future__ import annotations

import contextlib
import io

from finance_etl_pipeline_spark.plans import all_queries

QUERIES = all_queries()


def plan_of(spark, name: str, sf_dir: str) -> str:
    df = QUERIES[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    plan = plan_of(spark, "q1_pricing_summary", sf_dir)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert "HashAggregate" in plan  # partial+final pair
    assert plan.count("HashAggregate") >= 2


def test_q5_star_join_all_broadcast(spark, sf_dir):
    plan = plan_of(spark, "q5_region_revenue", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # fact side must not shuffle for dims
    assert "EqualTo(r_name,ASIA)" in plan  # dim filter pushed into its scan


def test_anti_join_is_broadcast(spark, sf_dir):
    plan = plan_of(spark, "p_anti_join_integrity", sf_dir)
    assert "BroadcastHashJoin LeftAnti" in plan or (
        "BroadcastHashJoin" in plan and "LeftAnti" in plan
    )


def test_projection_pruned_to_read_schema(spark, sf_dir):
    plan = plan_of(spark, "a_groupby_sum", sf_dir)
    # only the two needed columns reach the scan
    assert "ReadSchema: struct<l_extendedprice:double,l_returnflag:string>" in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = plan_of(spark, "a_topn_by_aggregate", sf_dir)
    assert "TakeOrderedAndProject" in plan  # not a global sort
