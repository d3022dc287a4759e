"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full operator battery registered in
``finance_etl_pipeline_spark.plans`` (one entry per SURVEY.md §2
operator family member, plus the LLM-data-pipeline extensions).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    from finance_etl_pipeline_spark.plans import all_queries

    qdef = all_queries()["q1_pricing_summary"]
    return qdef.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from finance_etl_pipeline_spark.plans import all_queries

    return {name: qdef.fn for name, qdef in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every SQL-expressible query."""
    from finance_etl_pipeline_spark.plans import all_queries

    return {
        name: qdef.oracle
        for name, qdef in all_queries().items()
        if qdef.oracle is not None
    }
