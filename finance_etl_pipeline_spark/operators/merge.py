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


class DuplicateMergeKeysError(ValueError):
    """Source has multiple rows for one key and no ``order_col`` to
    resolve them — a transactional MERGE would reject this too."""


def upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    delete_col: str | None = None,
    order_col: str | None = None,
    validate_unique: bool = True,
) -> DataFrame:
    """Source-wins merge of two same-schema DataFrames on ``keys``.

    Duplicate source keys violate the one-row-per-key merge invariant
    (Delta/Iceberg MERGE raises on multiple matches).  Pass
    ``order_col`` to compact the source to its latest row per key
    (CDC semantics: highest ``order_col`` wins); otherwise, with
    ``validate_unique`` (default), duplicate keys raise
    ``DuplicateMergeKeysError`` — one cheap early-out aggregation,
    worth it against silent table corruption. Output preserves the
    target's column order."""
    from pyspark.sql import Window

    if order_col is not None:
        w = Window.partitionBy(*keys).orderBy(F.desc(order_col))
        source = (
            source.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    elif validate_unique:
        dup = (
            source.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            key_desc = ", ".join(f"{k}={dup[0][k]}" for k in keys)
            raise DuplicateMergeKeysError(
                f"source has multiple rows for key ({key_desc}); "
                "pass order_col to compact or dedupe upstream"
            )

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
    picked = {
        c: F.when(F.col("__s_present").isNotNull(), F.col(f"__s_{c}"))
        .otherwise(F.col(f"__t_{c}"))
        .alias(c)
        for c in value_cols
    }
    # emit in the target's original column order so positional
    # consumers (union with untouched partitions, headerless exports)
    # stay aligned
    out_order = [c for c in target.columns if c in set(keys) | set(value_cols)]
    return joined.select(
        *[F.col(c) if c in keys else picked[c] for c in out_order]
    )
