"""Dashboard dataset builders (reference scripts/build_dashboard.py:74-225).

The reference renders Plotly HTML; the chart rendering is presentation
(out of engine scope, SURVEY.md §2.1 S6) — these functions produce the
exact datasets the dashboard consumes: revenue trend for the top-8
entities, the month's KPI table, the top-15 expense accounts by
magnitude, and the DQ tables.  Each is a small top-k aggregate
(A8/O2) executed as TakeOrdered, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.scalars import fround


def top_entities_by_revenue(kpi: DataFrame, n: int = 8) -> DataFrame:
    """Top-N entities by total Revenue (reference :100)."""
    return (
        kpi.groupBy("entity")
        .agg(fround(F.sum("Revenue"), 2).alias("total_revenue"))
        .orderBy(F.desc("total_revenue"), "entity")
        .limit(n)
    )


def revenue_trend(kpi: DataFrame, top_entities: DataFrame) -> DataFrame:
    """Per-month Revenue series restricted to the top entities
    (reference :96-138 trend lines)."""
    return (
        kpi.join(F.broadcast(top_entities.select("entity")), "entity")
        .select("entity", "month", "Revenue", "gross_profit", "operating_profit")
        .orderBy("entity", "month")
    )


def top_expense_accounts(
    fact: DataFrame, dim_accounts: DataFrame, n: int = 15
) -> DataFrame:
    """Top-N expense accounts by |amount_base| with 'code - name'
    labels (reference :153-163; case-insensitive type filter :155)."""
    joined = fact.join(
        F.broadcast(dim_accounts.select("account_code", "account_name", "account_type")),
        "account_code",
        "left",
    )
    return (
        joined.filter(F.lower(F.col("account_type")) == "expense")
        .groupBy("account_code", "account_name")
        .agg(fround(F.sum(F.abs(F.col("amount_base"))), 2).alias("total_expense"))
        .select(
            F.concat_ws(" - ", "account_code", "account_name").alias("account"),
            "total_expense",
        )
        .orderBy(F.desc("total_expense"), "account")
        .limit(n)
    )


def kpi_month_table(kpi: DataFrame, month: str) -> DataFrame:
    """The month's KPI rows, margin-enriched (reference :139-152)."""
    from finance_etl_pipeline_spark.transform import add_margins

    return add_margins(kpi.filter(F.col("month") == month)).orderBy("entity")
