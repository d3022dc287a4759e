"""Declarative data-quality engine (SURVEY.md §2.9 Q1–Q9).

Re-expresses the reference's pandera-based validation layer
(reference src/finance_etl/quality.py) as pure DataFrame expressions:

- a ``Check`` is (name, column, pass-predicate, optional severity hint);
- ``exceptions_df`` evaluates ALL row-level checks in a single scan:
  each check becomes a struct-or-null expression, the structs are
  packed into an array, nulls filtered with a higher-order function,
  and the array exploded — one pass over the data, fully inside
  whole-stage codegen, instead of the naive union-of-filtered-scans
  which re-reads the input once per check (at 100 TB: 1 scan vs N);
- dataset-level checks (duplicate keys Q3, cross-column identity Q4,
  referential integrity Q5) are aggregates/anti-joins producing the
  same canonical exception schema;
- severity (Q7) is a chained CASE; summary + gate (Q8/Q9) are a pivot
  plus one driver-side scalar decision — the only eager action.

Row identity: the reference records the pandas row index
(quality.py:108). Spark has no stable row index, so the contract here
is a caller-supplied ``row_id`` expression built from the dataset's
natural key columns (documented per dataset) — stable under
partitioning, shuffles, and re-runs, which an index is not.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EXCEPTION_COLS = [
    "dataset",
    "row_id",
    "column",
    "check",
    "failure_case",
    "schema_context",
    "check_number",
    "severity",
]


@dataclass
class Check:
    """One row-level validation rule: ``predicate`` True means PASS."""

    name: str
    column: str
    predicate: Column
    severity: str | None = None  # explicit override; else rules apply


def required(column: str) -> Check:
    """nullable=False (reference quality.py: every non-nullable column)."""
    return Check(f"required", column, F.col(column).isNotNull())


def gt(column: str, bound: float) -> Check:
    return Check(f"gt_{bound}", column, F.col(column) > bound)


def ge(column: str, bound: float) -> Check:
    return Check(f"ge_{bound}", column, F.col(column) >= bound)


def ne(column: str, value: float) -> Check:
    return Check(f"ne_{value}", column, F.col(column) != value)


def isin(column: str, values: tuple) -> Check:
    return Check("isin", column, F.col(column).isin(*values))


def exceptions_df(
    df: DataFrame,
    dataset: str,
    checks: list[Check],
    row_id: Column,
) -> DataFrame:
    """All row-level check failures in ONE scan (Q1/Q2).

    Null column values fail only the ``required`` check (mirrors
    pandera: a null doesn't also fail gt/isin — those predicates are
    null on null input, and we treat null-predicate as pass unless the
    check is ``required``).
    """
    structs = []
    for i, c in enumerate(checks):
        passed = c.predicate
        if c.name != "required":
            # null input -> not this check's business
            passed = F.coalesce(passed, F.col(c.column).isNull())
        structs.append(
            F.when(
                ~passed,
                F.struct(
                    F.lit(c.column).alias("column"),
                    F.lit(c.name).alias("check"),
                    F.col(c.column).cast("string").alias("failure_case"),
                    F.lit(i).alias("check_number"),
                    F.lit(c.severity).cast("string").alias("severity"),
                ),
            )
        )
    fails = F.filter(F.array(*structs), lambda x: x.isNotNull())
    out = (
        df.select(row_id.alias("row_id"), F.explode(fails).alias("f"))
        .select(
            F.lit(dataset).alias("dataset"),
            "row_id",
            F.col("f.column").alias("column"),
            F.col("f.check").alias("check"),
            F.col("f.failure_case").alias("failure_case"),
            F.lit("Column").alias("schema_context"),
            F.col("f.check_number").alias("check_number"),
            F.col("f.severity").alias("severity"),
        )
    )
    return out


def duplicate_key_exceptions(
    df: DataFrame, dataset: str, key_cols: list[str], severity: str | None = None
) -> DataFrame:
    """Q3: rows whose key occurs more than once (reference
    quality.py:8-13). Group-count then filter — one shuffle on the key."""
    keys = [F.col(k) for k in key_cols]
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select(
            F.lit(dataset).alias("dataset"),
            F.concat_ws("|", *[k.cast("string") for k in keys]).alias("row_id"),
            F.lit(",".join(key_cols)).alias("column"),
            F.lit("unique_key").alias("check"),
            F.col("n").cast("string").alias("failure_case"),
            F.lit("DataFrameSchema").alias("schema_context"),
            F.lit(-1).alias("check_number"),
            F.lit(severity).cast("string").alias("severity"),
        )
    )


def identity_exceptions(
    df: DataFrame,
    dataset: str,
    expr: Column,
    tolerance: float,
    columns: str,
    row_id: Column,
) -> DataFrame:
    """Q4: |identity expression| < tolerance per row (reference
    quality.py:59-65 expresses it dataset-level; row-level gives the
    audit trail the exception report needs)."""
    bad = F.abs(expr) >= tolerance
    return df.filter(bad).select(
        F.lit(dataset).alias("dataset"),
        row_id.alias("row_id"),
        F.lit(columns).alias("column"),
        F.lit("identity").alias("check"),
        F.abs(expr).cast("string").alias("failure_case"),
        F.lit("DataFrameSchema").alias("schema_context"),
        F.lit(-2).alias("check_number"),
        F.lit(None).cast("string").alias("severity"),
    )


def referential_exceptions(
    df: DataFrame,
    dataset: str,
    fk_col: str,
    dim: DataFrame,
    pk_col: str,
    check_name: str,
    row_id: Column,
    severity: str | None = "ERROR",
) -> DataFrame:
    """Q5: rows whose FK has no match in the dim — left_anti join
    (the Spark idiom for the reference's ``~isin`` set mask,
    pipeline.py:30-47).  Hint-free: the dim is caller-supplied and may
    grow with SF (part/customer-sized), so a forced broadcast would OOM
    executors at cluster scale — AQE broadcasts the distinct key set
    while it is actually small. Broken FK integrity defaults to ERROR severity
    regardless of the check's name — the severity *rules* only match
    names containing 'referential', and a silent WARN here would let
    the gate pass on corrupt joins."""
    dim_keys = dim.select(F.col(pk_col).alias("__pk")).distinct()
    return (
        df.join(dim_keys, df[fk_col] == F.col("__pk"), "left_anti")
        .select(
            F.lit(dataset).alias("dataset"),
            row_id.alias("row_id"),
            F.lit(fk_col).alias("column"),
            F.lit(check_name).alias("check"),
            F.col(fk_col).cast("string").alias("failure_case"),
            F.lit("DataFrameSchema").alias("schema_context"),
            F.lit(-3).alias("check_number"),
            F.lit(severity).cast("string").alias("severity"),
        )
    )


def with_severity(
    exceptions: DataFrame,
    key_columns: tuple[str, ...] = (),
    error_datasets: tuple[str, ...] = (),
) -> DataFrame:
    """Q7: severity assignment (reference quality.py:150-182):
    an explicit per-exception severity (from Check.severity or a
    producer default like referential_exceptions) wins; else ERROR
    when the column is a key column, the dataset is in the
    always-error set, or the check is required/dtype/referential;
    else WARN."""
    check_lc = F.lower(F.col("check"))
    rules = (
        F.when(F.col("column").isin(*key_columns) if key_columns else F.lit(False), "ERROR")
        .when(F.col("dataset").isin(*error_datasets) if error_datasets else F.lit(False), "ERROR")
        .when(
            check_lc.contains("required")
            | check_lc.contains("dtype")
            | check_lc.contains("referential")
            | check_lc.contains("unique_key"),
            "ERROR",
        )
        .otherwise("WARN")
    )
    preset = F.col("severity") if "severity" in exceptions.columns else F.lit(None)
    return exceptions.withColumn("severity", F.coalesce(preset, rules))


def dq_summary(
    exceptions: DataFrame,
    datasets: list[str],
    spark,
    fail_on: str = "ERROR",
) -> DataFrame:
    """Q8: per-dataset error/warn/issue counts over a fixed dataset
    universe + PASS/FAIL status (reference quality.py:205-249)."""
    base = spark.createDataFrame([(d,) for d in datasets], "dataset string")
    counts = (
        exceptions.groupBy("dataset")
        .pivot("severity", ["ERROR", "WARN"])
        .count()
        .withColumnsRenamed({"ERROR": "error_count", "WARN": "warn_count"})
    )
    out = (
        base.join(counts, "dataset", "left")
        .na.fill(0, ["error_count", "warn_count"])
        .withColumn("issue_count", F.col("error_count") + F.col("warn_count"))
    )
    if fail_on == "ERROR":
        bad = F.col("error_count") > 0
    elif fail_on == "WARN":
        bad = F.col("issue_count") > 0
    else:  # NEVER
        bad = F.lit(False)
    return out.withColumn("status", F.when(bad, "FAIL").otherwise("PASS")).select(
        "dataset", "error_count", "warn_count", "issue_count", "status"
    )


def gate(summary: DataFrame) -> bool:
    """Q9: overall PASS/FAIL — the one eager action in the DQ layer
    (reference quality.py:186-202). Returns True when the run passes."""
    return summary.filter(F.col("status") == "FAIL").limit(1).count() == 0
