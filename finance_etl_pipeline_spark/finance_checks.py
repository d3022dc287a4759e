"""Finance dataset check declarations (reference quality.py:16-95).

Each raw dataset's pandera schema becomes a list of declarative
``Check`` objects for the single-scan DQ engine, plus dataset-level
key/identity checks.  Strictness (unknown columns are errors,
pandera ``strict=True``) is a driver-side column-set comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.operators import quality as Q

ALLOWED_CURRENCIES = ("USD", "TZS", "EUR")
MOVEMENT_TYPES = ("receipt", "issue", "adjustment")

# reference quality.py:150-164 — columns whose failures are critical
ERROR_COLUMNS = (
    "account_code",
    "date",
    "invoice_id",
    "bill_id",
    "employee_id",
    "sku",
    "currency",
    "from_currency",
    "to_currency",
    "rate",
)
ERROR_DATASETS = ("fx_rates",)
DATASETS = ["sales", "expenses", "payroll", "inventory_movements", "fx_rates"]


def sales_checks() -> list[Q.Check]:
    return [
        Q.required("date"),
        Q.required("entity"),
        Q.required("invoice_id"),
        Q.required("account_code"),
        Q.required("currency"),
        Q.isin("currency", ALLOWED_CURRENCIES),
        Q.required("amount"),
        Q.gt("amount", 0),
    ]


def expenses_checks() -> list[Q.Check]:
    return [
        Q.required("date"),
        Q.required("entity"),
        Q.required("bill_id"),
        Q.required("account_code"),
        Q.required("currency"),
        Q.isin("currency", ALLOWED_CURRENCIES),
        Q.required("amount"),
        Q.gt("amount", 0),
    ]


def payroll_checks() -> list[Q.Check]:
    return [
        Q.required("month"),
        Q.required("entity"),
        Q.required("employee_id"),
        Q.required("currency"),
        Q.isin("currency", ALLOWED_CURRENCIES),
        Q.ge("gross", 0),
        Q.ge("deductions", 0),
        Q.ge("net", 0),
    ]


def inventory_checks() -> list[Q.Check]:
    return [
        Q.required("date"),
        Q.required("entity"),
        Q.required("sku"),
        Q.required("movement_type"),
        Q.isin("movement_type", MOVEMENT_TYPES),
        Q.required("qty"),
        Q.ne("qty", 0),
        Q.ge("unit_cost", 0),
        Q.isin("currency", ALLOWED_CURRENCIES),
    ]


def fx_checks(base_currency: str) -> list[Q.Check]:
    return [
        Q.required("date"),
        Q.required("from_currency"),
        Q.isin("from_currency", ALLOWED_CURRENCIES),
        Q.required("to_currency"),
        Q.Check("eq_base", "to_currency", F.col("to_currency") == base_currency),
        Q.required("rate"),
        Q.gt("rate", 0),
    ]


# Natural row keys per dataset — the stable row_id the exception report
# uses in place of the reference's pandas index (SURVEY.md §7.6.1).
def row_ids() -> dict[str, Column]:
    return {
        "sales": F.concat_ws("|", "entity", "invoice_id"),
        "expenses": F.concat_ws("|", "entity", "bill_id"),
        "payroll": F.concat_ws("|", "entity", "employee_id", "month"),
        "inventory_movements": F.concat_ws(
            "|", "entity", "sku", F.to_date("date").cast("string"), "movement_type"
        ),
        "fx_rates": F.concat_ws(
            "|", F.to_date("date").cast("string"), "from_currency", "to_currency"
        ),
    }


UNIQUE_KEYS = {
    "sales": ["entity", "invoice_id"],
    "expenses": ["entity", "bill_id"],
    "fx_rates": ["date", "from_currency", "to_currency"],
}


def payroll_identity_exceptions(payroll: DataFrame) -> DataFrame:
    """|gross − deductions − net| < 0.01 (reference quality.py:59-65)."""
    return Q.identity_exceptions(
        payroll,
        "payroll",
        F.col("gross") - F.col("deductions") - F.col("net"),
        0.01,
        "gross,deductions,net",
        row_ids()["payroll"],
    )

