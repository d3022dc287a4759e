"""Upsert (MERGE) for plain-Parquet tables.

Lakehouse formats (Delta/Iceberg) provide transactional MERGE; on
plain Parquet the equivalent is a full-outer key join with
source-wins semantics, rewritten partition-wise.  This operator is
the compute half (the join); `run_months` shows the storage half
(dynamic partition overwrite so only touched partitions rewrite).

Semantics:
- key in both      → source row (update)
- key only in src  → source row (insert)
- key only in tgt  → target row (keep)
Optionally ``delete_col``: source rows flagged true drop the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    delete_col: str | None = None,
) -> DataFrame:
    """Source-wins merge of two same-schema DataFrames on ``keys``."""
    value_cols = [c for c in target.columns if c not in keys]
    if delete_col:
        value_cols = [c for c in value_cols if c != delete_col]

    t = target.select(*keys, *[F.col(c).alias(f"__t_{c}") for c in value_cols])
    src_cols = [F.col(c).alias(f"__s_{c}") for c in value_cols]
    if delete_col:
        src_cols.append(F.col(delete_col).alias("__s_del"))
    s = source.select(*keys, *src_cols).withColumn("__s_present", F.lit(True))

    joined = t.join(s, keys, "full_outer")
    if delete_col:
        joined = joined.filter(
            ~F.coalesce(F.col("__s_del"), F.lit(False))
        )
    picked = [
        F.when(F.col("__s_present").isNotNull(), F.col(f"__s_{c}"))
        .otherwise(F.col(f"__t_{c}"))
        .alias(c)
        for c in value_cols
    ]
    return joined.select(*keys, *picked)
