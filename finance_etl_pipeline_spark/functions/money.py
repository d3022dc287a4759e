"""Decimal money mode (SURVEY.md §7.6.9).

Doubles drift under large group-sums: at 100 TB a revenue rollup adds
~10^9 values per group and the accumulated binary error reaches real
cents.  ``DecimalType(18, 4)`` sums are exact (Spark widens the
accumulator internally and raises on true overflow instead of
silently corrupting).

Double stays the default engine-wide because the DuckDB oracle
compares raw doubles; flip a pipeline to decimal at the ingest
boundary with ``as_decimal_money`` and every downstream sum/pivot
keeps exact cents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

MONEY = DecimalType(18, 4)


def as_decimal_money(df: DataFrame, cols: list[str]) -> DataFrame:
    """Cast the given money columns to DecimalType(18, 4)."""
    return df.withColumns({c: F.col(c).cast(MONEY) for c in cols})
