"""run_month — the finance pipeline orchestration (reference
src/finance_etl/pipeline.py:50-191, re-expressed lazily).

Stage order preserved from the reference: validation sees ALL rows
(DQ gate runs BEFORE month filtering — reference pipeline.py:104-127
precede :164-170), and the gate is forced with an explicit action
because Spark is lazy (SURVEY.md §7.6.7).

Outputs: curated Parquet (fact_transactions, dim_accounts,
kpi_monthly) + CSV audit trail (dq_exceptions, dq_summary).
At scale the fact write partitions by month so downstream month
filters become partition pruning.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from finance_etl_pipeline_spark import finance_checks as FC
from finance_etl_pipeline_spark import schemas, transform
from finance_etl_pipeline_spark.operators import quality as Q
from finance_etl_pipeline_spark.sources.readers import read_csv
from finance_etl_pipeline_spark.sources.writers import write_csv, write_parquet


@dataclass
class Settings:
    """reference src/finance_etl/config.py:8-16."""

    base_currency: str = "USD"
    allowed_currencies: tuple[str, ...] = ("USD", "TZS", "EUR")


class DataQualityGateError(RuntimeError):
    """Raised when the DQ gate fails (reference pipeline.py:145-146)."""


@dataclass
class MonthResult:
    paths: dict[str, str] = field(default_factory=dict)
    status: str = "PASS"
    metrics: dict[str, float] = field(default_factory=dict)


def _month_window(month: str) -> tuple[str, str]:
    """[start, end) bounds for a YYYY-MM month (reference pipeline.py:23-27)."""
    import datetime

    start = datetime.date.fromisoformat(f"{month}-01")
    end = (start.replace(day=28) + datetime.timedelta(days=5)).replace(day=1)
    return start.isoformat(), end.isoformat()


def run_month(
    spark: SparkSession,
    month: str,
    raw_dir: str,
    curated_dir: str,
    reference_dir: str,
    settings: Settings | None = None,
    fail_on: str = "ERROR",
    money_mode: str = "double",
) -> MonthResult:
    settings = settings or Settings()
    fail_on = (fail_on or "ERROR").upper().strip()
    if fail_on not in {"ERROR", "WARN", "NEVER"}:
        raise ValueError(f"invalid fail_on: {fail_on}")
    money_mode = (money_mode or "double").lower().strip()
    if money_mode not in transform.MONEY_MODES:
        raise ValueError(f"invalid money_mode: {money_mode}")

    # --- reference data: chart of accounts → dim_accounts ---------------
    coa = read_csv(
        spark,
        os.path.join(reference_dir, "chart_of_accounts.csv"),
        schemas.CHART_OF_ACCOUNTS,
    )
    dim_accounts = transform.build_dim_accounts(coa)

    # --- raw scans (explicit schemas, no inference pass) ----------------
    raw: dict[str, DataFrame] = {
        name: read_csv(spark, os.path.join(raw_dir, f"{name}.csv"), schema)
        for name, schema in schemas.FINANCE_RAW.items()
    }

    # --- DQ: row-level checks (one scan each), key checks, identity,
    #         referential integrity — all BEFORE month filtering --------
    ids = FC.row_ids()
    check_sets = {
        "sales": FC.sales_checks(),
        "expenses": FC.expenses_checks(),
        "payroll": FC.payroll_checks(),
        "inventory_movements": FC.inventory_checks(),
        "fx_rates": FC.fx_checks(settings.base_currency),
    }
    issues = [
        Q.exceptions_df(raw[name], name, checks, ids[name])
        for name, checks in check_sets.items()
    ]
    issues += [
        Q.duplicate_key_exceptions(raw[name], name, keys)
        for name, keys in FC.UNIQUE_KEYS.items()
    ]
    issues.append(FC.payroll_identity_exceptions(raw["payroll"]))
    issues += [
        Q.referential_exceptions(
            raw[name], name, "account_code", dim_accounts, "account_code",
            "account_in_coa", ids[name],
        )
        for name in ("sales", "expenses")
    ]

    exceptions = issues[0]
    for df in issues[1:]:
        exceptions = exceptions.unionByName(df)
    # referential checks (account_in_coa) carry ERROR from their
    # producer; with_severity fills the rest from the rule set
    exceptions = Q.with_severity(
        exceptions, key_columns=FC.ERROR_COLUMNS, error_datasets=FC.ERROR_DATASETS
    )
    # one materialization: the audit trail is reused by summary + gate
    exceptions = exceptions.cache()

    summary = Q.dq_summary(exceptions, FC.DATASETS, spark, fail_on=fail_on)

    os.makedirs(curated_dir, exist_ok=True)
    write_csv(exceptions, os.path.join(curated_dir, "dq_exceptions"))
    write_csv(summary, os.path.join(curated_dir, "dq_summary"))

    passed = Q.gate(summary)  # the explicit eager action (§7.6.7)
    if not passed and fail_on != "NEVER":
        raise DataQualityGateError(
            f"DQ gate failed for month {month} (fail_on={fail_on}); "
            f"see {curated_dir}/dq_exceptions"
        )

    # --- month filter (reference pipeline.py:164-170) -------------------
    start, end = _month_window(month)
    in_month = lambda df: df.filter(  # noqa: E731
        (F.col("date") >= F.lit(start).cast("timestamp"))
        & (F.col("date") < F.lit(end).cast("timestamp"))
    )
    sales = in_month(raw["sales"])
    expenses = in_month(raw["expenses"])
    inventory = in_month(raw["inventory_movements"])
    payroll = raw["payroll"].filter(F.col("month") == month)

    # --- fact + KPI -----------------------------------------------------
    fx = transform.fx_to_base(raw["fx_rates"], settings.base_currency)
    fact = transform.to_fact_transactions(
        sales, expenses, payroll, inventory, fx, settings.base_currency,
        money_mode=money_mode,
    )
    # run-level metrics ride the write via observe() — collected from
    # the SAME pass that materializes the fact table, no extra scan
    # (the streaming-safe way to count; a .count() here would re-run
    # the whole plan on an uncached frame)
    fact_obs = Observation("fact_metrics")
    fact = fact.observe(
        fact_obs,
        F.count(F.lit(1)).alias("fact_rows"),
        F.sum("amount_base").alias("fact_amount_base_total"),
    )
    fact = fact.cache()  # feeds both the write and the KPI build
    kpi = transform.kpi_monthly(fact, dim_accounts, money_mode=money_mode)

    paths = {
        "fact_transactions": os.path.join(curated_dir, "fact_transactions"),
        "dim_accounts": os.path.join(curated_dir, "dim_accounts"),
        "kpi_monthly": os.path.join(curated_dir, "kpi_monthly"),
        "dq_exceptions": os.path.join(curated_dir, "dq_exceptions"),
        "dq_summary": os.path.join(curated_dir, "dq_summary"),
    }
    write_parquet(fact, paths["fact_transactions"])
    write_parquet(dim_accounts, paths["dim_accounts"])
    write_parquet(kpi, paths["kpi_monthly"])

    # release the per-run caches — multi-month loops over one session
    # would otherwise accumulate stale entries in storage memory
    fact.unpersist()
    exceptions.unpersist()

    obs = dict(fact_obs.get)
    metrics = {
        "fact_rows": float(obs.get("fact_rows", 0) or 0),
        "fact_amount_base_total": float(
            obs.get("fact_amount_base_total", 0.0) or 0.0
        ),
    }
    return MonthResult(
        paths=paths, status="PASS" if passed else "FAIL", metrics=metrics
    )


def run_months(
    spark: SparkSession,
    months: list[str],
    raw_dir: str,
    curated_dir: str,
    reference_dir: str,
    settings: Settings | None = None,
    fail_on: str = "ERROR",
    money_mode: str = "double",
) -> dict[str, MonthResult]:
    """Multi-month orchestration with month-partitioned curated output.

    Each month runs the standard gate+build, then fact/KPI land in a
    single month-partitioned dataset via dynamic partition overwrite —
    re-running one month replaces only that month's partition.  At
    scale this is the layout that turns downstream month filters into
    partition pruning (SURVEY.md §4 'output partitioning').
    """
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        results: dict[str, MonthResult] = {}
        for month in months:
            month_dir = os.path.join(curated_dir, "by_month_staging", month)
            res = run_month(
                spark, month, raw_dir, month_dir, reference_dir, settings,
                fail_on, money_mode,
            )
            fact = spark.read.parquet(res.paths["fact_transactions"]).withColumn(
                "month", F.date_format("date", "yyyy-MM")
            )
            fact.write.mode("overwrite").partitionBy("month").parquet(
                os.path.join(curated_dir, "fact_transactions_by_month")
            )
            kpi = spark.read.parquet(res.paths["kpi_monthly"])
            kpi.write.mode("overwrite").partitionBy("month").parquet(
                os.path.join(curated_dir, "kpi_monthly_by_month")
            )
            results[month] = res
        return results
    finally:
        # don't leak dynamic-overwrite semantics into the caller's
        # later writes on this shared session
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
