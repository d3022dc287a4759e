"""Power-BI star-schema export (reference
scripts/export_powerbi_star_schema.py:323-416, re-expressed lazily).

Surrogate keys: the reference assigns sequential ints after a sort
(:81-83, :117-119). For the small dims here a global row_number window
matches exactly; the module documents the scale path (zipWithIndex-
style dense_rank) where a dim wouldn't fit one partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _seq_key(df: DataFrame, order_col: str, key_name: str) -> DataFrame:
    """Sequential surrogate key over a sorted small dim (W1).

    Single-partition window — correct for dims that fit in memory;
    for billion-row dims use monotonically_increasing_id + dense_rank
    (no global shuffle) and accept non-contiguous keys."""
    w = Window.orderBy(order_col)
    return df.withColumn(key_name, F.row_number().over(w))


def dim_entity(fact: DataFrame, kpi: DataFrame) -> DataFrame:
    """Entities from fact ∪ kpi (reference :76-93) + first currency."""
    ents = (
        fact.select("entity")
        .union(kpi.select("entity"))
        .distinct()
        .filter(F.col("entity").isNotNull())
    )
    cur = (
        fact.filter(F.col("currency").isNotNull())
        .groupBy("entity")
        .agg(F.min("currency").alias("currency"))
    )
    return _seq_key(ents.join(cur, "entity", "left"), "entity", "entity_key").select(
        "entity_key", "entity", "currency"
    )


def dim_account(fact: DataFrame, coa: DataFrame) -> DataFrame:
    """Account dim from COA, restricted to codes present in fact,
    deduped with a deterministic survivor (reference :96-123)."""
    used = fact.select("account_code").distinct()
    dim = (
        coa.join(used, "account_code", "inner")
        .groupBy("account_code")
        .agg(
            F.min("account_name").alias("account_name"),
            F.min("account_type").alias("account_type"),
        )
    )
    return _seq_key(dim, "account_code", "account_key").select(
        "account_key", "account_code", "account_name", "account_type"
    )


def dim_date(fact: DataFrame) -> DataFrame:
    """Calendar dim from distinct fact dates (reference :126-156)."""
    d = F.col("date")
    return (
        fact.select(F.to_date(d).alias("date"))
        .filter(F.col("date").isNotNull())
        .distinct()
        .select(
            F.date_format("date", "yyyyMMdd").cast("int").alias("date_key"),
            "date",
            F.year("date").alias("year"),
            F.quarter("date").alias("quarter"),
            F.date_format("date", "yyyyMM").cast("int").alias("month_key"),
            F.date_format("date", "yyyy-MM").alias("month_label"),
            F.month("date").alias("month"),
            F.date_format("date", "MMM").alias("month_name"),
            F.weekofyear("date").alias("week"),
            F.dayofmonth("date").alias("day"),
        )
        .orderBy("date_key")
    )


def dim_month(dim_date_df: DataFrame) -> DataFrame:
    """Month grain with month_start_date_key = min(date_key)
    (reference :159-170)."""
    return (
        dim_date_df.groupBy("month_key", "month_label")
        .agg(F.min("date_key").alias("month_start_date_key"))
        .orderBy("month_key")
    )


def fact_gl(
    fact: DataFrame, d_entity: DataFrame, d_account: DataFrame
) -> DataFrame:
    """GL fact with surrogate keys (reference :173-256). Dim lookups
    are broadcast joins (the reference's dict .map) — unmatched → null."""
    return (
        fact.join(F.broadcast(d_entity.select("entity", "entity_key")), "entity", "left")
        .join(
            F.broadcast(d_account.select("account_code", "account_key")),
            "account_code",
            "left",
        )
        .select(
            F.date_format(F.to_date("date"), "yyyyMMdd").cast("int").alias("date_key"),
            F.date_format("date", "yyyyMM").cast("int").alias("month_key"),
            "entity_key",
            "account_key",
            F.col("amount_base").alias("amount"),
            "description",
        )
    )


def fact_kpi_monthly(kpi: DataFrame, d_entity: DataFrame) -> DataFrame:
    """KPI fact keyed by (month_key, entity_key) + margin %s
    (reference :259-319). Margins come from the one shared
    ``transform.add_margins`` so the star export publishes the exact
    same rounded values as the flat BI export."""
    from finance_etl_pipeline_spark.transform import add_margins

    return (
        add_margins(kpi)
        .join(F.broadcast(d_entity.select("entity", "entity_key")), "entity", "left")
        .select(
            F.regexp_replace("month", "-", "").cast("int").alias("month_key"),
            "entity_key",
            "Revenue",
            "COGS",
            "Expense",
            "gross_profit",
            "operating_profit",
            "gross_margin_pct",
            "operating_margin_pct",
        )
    )


def export_star(fact: DataFrame, kpi: DataFrame, coa: DataFrame) -> dict[str, DataFrame]:
    """Build the six star tables (reference :382-399 relationships)."""
    d_ent = dim_entity(fact, kpi)
    d_acc = dim_account(fact, coa)
    d_date = dim_date(fact)
    return {
        "dim_entity": d_ent,
        "dim_account": d_acc,
        "dim_date": d_date,
        "dim_month": dim_month(d_date),
        "fact_gl": fact_gl(fact, d_ent, d_acc),
        "fact_kpi_monthly": fact_kpi_monthly(kpi, d_ent),
    }
