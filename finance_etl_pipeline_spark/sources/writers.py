"""Sinks (SURVEY.md §2.1 S3, S4).

- Parquet is the curated format, partitioned when a partition column is
  given (at 100 TB: partition by low-cardinality time/entity keys so
  downstream month-filters become partition pruning, not scans).
- Single-file CSV is a BI-export contract only (reference
  io_utils.py:19-21). ``coalesce(1)`` is deliberately restricted to
  these tiny exports — never used on fact-scale data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", single_file: bool = True) -> None:
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Line-delimited JSON sink (interchange format; stays partitioned
    — JSON is for handoff, never the curated store)."""
    df.write.mode(mode).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink — columnar alternative to Parquet for warehouses
    standardized on ORC (Hive-lineage lakes); same partitioning
    contract as write_parquet."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
