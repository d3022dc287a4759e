"""Flat BI export (reference scripts/export_bi_datasets.py:58-122).

Reads curated Parquet, infers-or-accepts the reporting month, filters
fact & KPI to it, adds margin percentages, and writes the five flat
CSVs + a data dictionary.  Month inference = max month present in the
KPI table (reference :30-34).

In the reference all three downstream scripts re-derive month
filtering and margins independently; here they share
``transform.add_margins`` and this module's month filter (SURVEY.md
§3.3 consolidation note).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.sources.readers import read_parquet
from finance_etl_pipeline_spark.sources.writers import write_csv
from finance_etl_pipeline_spark.transform import add_margins

DATA_DICTIONARY = """\
fact_transactions: one row per journal line (txn_id, date, entity, source,
  document_id, account_code, currency, amount, rate, amount_base, description)
kpi_monthly: entity x month pivot of amount_base by account type with
  gross_profit, operating_profit, gross_margin_pct, operating_margin_pct
dq_exceptions: data-quality audit trail (dataset, row_id, column, check,
  failure_case, schema_context, check_number, severity)
dq_summary: per-dataset error/warn counts and PASS/FAIL status
dim_accounts: chart of accounts (account_code, account_name, account_type)
"""


def infer_month(kpi: DataFrame) -> str | None:
    """Latest month present (reference export_bi_datasets.py:30-34)."""
    row = kpi.agg(F.max("month")).first()
    return row[0] if row else None


def export_bi_datasets(
    spark: SparkSession,
    curated_dir: str,
    out_dir: str,
    month: str | None = None,
) -> dict[str, str]:
    fact = read_parquet(spark, os.path.join(curated_dir, "fact_transactions"))
    kpi = read_parquet(spark, os.path.join(curated_dir, "kpi_monthly"))
    dim = read_parquet(spark, os.path.join(curated_dir, "dim_accounts"))

    month = month or infer_month(kpi)
    if month is None:
        raise ValueError("no month to export (empty kpi_monthly)")

    month_dir = os.path.join(out_dir, month)
    fact_m = fact.filter(F.date_format("date", "yyyy-MM") == month)
    kpi_m = add_margins(kpi.filter(F.col("month") == month))

    outputs = {
        "fact_transactions": fact_m,
        "kpi_monthly": kpi_m,
        "dim_accounts": dim,
    }
    # audit CSVs pass through when present (reference :105-109)
    for name in ("dq_exceptions", "dq_summary"):
        path = os.path.join(curated_dir, name)
        if os.path.exists(path):
            outputs[name] = spark.read.option("header", "true").csv(path)

    paths: dict[str, str] = {}
    for name, df in outputs.items():
        paths[name] = os.path.join(month_dir, name)
        write_csv(df, paths[name])

    os.makedirs(month_dir, exist_ok=True)
    dict_path = os.path.join(month_dir, "data_dictionary.txt")
    with open(dict_path, "w") as f:
        f.write(DATA_DICTIONARY)
    paths["data_dictionary"] = dict_path
    return paths
