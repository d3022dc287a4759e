"""Incremental rollup maintenance (continuous-aggregate / hypertable
rollup shape): keep a time-bucketed aggregate table up to date by
merging *partial aggregate states*, never re-scanning history.

The reference (a monthly-close batch, /root/reference
src/finance_etl/pipeline.py) recomputes everything per run; at 100 TB
the recompute is the bottleneck, so the engine stores mergeable
partials instead of finished numbers:

- partial state per (bucket, key): ``n`` (count) and ``total_e2``
  (sum of exact cent units — money is 2 dp, so the per-row grid is
  exact and the partial is pure BIGINT arithmetic: merges are not
  just lossless but bit-deterministic under any partition order) —
  closed under addition, so ANY of these operations is just a
  group-by-sum over states:
    * ingesting a new chunk of raw events (append + merge);
    * re-rolling a fine grain into a coarser one (hour → day →
      month) without touching raw data;
- finished metrics (avg = total/n) are derived at read time, which is
  why avg itself is never stored (it does not merge).

Merging a chunk shuffles only |affected buckets × keys| rows — the
incremental cost is proportional to the new data, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GRAINS = ("hour", "day", "month")


def rollup_partials(
    events: DataFrame,
    grain: str = "hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Aggregate raw events to partial states at ``grain``:
    (bucket, key, n, total_e2)."""
    from finance_etl_pipeline_spark.functions.scalars import igrid

    if grain not in _GRAINS:
        raise ValueError(f"grain must be one of {_GRAINS}, got {grain!r}")
    return (
        events.groupBy(
            F.date_trunc(grain, F.col(ts_col)).alias("bucket"),
            F.col(key_col).alias("key"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(igrid(value_col, 2)).alias("total_e2"),
        )
    )


def merge_partials(existing: DataFrame, new: DataFrame) -> DataFrame:
    """Fold a new chunk's partials into the stored rollup — states
    are additive, so merge = union + group-by-sum.  Identical result
    to recomputing from all raw data (tests/test_rollup.py)."""
    return (
        existing.unionByName(new)
        .groupBy("bucket", "key")
        .agg(F.sum("n").alias("n"), F.sum("total_e2").alias("total_e2"))
    )


def reroll(partials: DataFrame, grain: str) -> DataFrame:
    """Re-aggregate fine-grain partials to a coarser grain (hour→day,
    day→month) — no raw-data scan; the whole input is already
    |buckets × keys| rows."""
    if grain not in _GRAINS:
        raise ValueError(f"grain must be one of {_GRAINS}, got {grain!r}")
    return (
        partials.groupBy(
            F.date_trunc(grain, F.col("bucket")).alias("bucket"), "key"
        )
        .agg(F.sum("n").alias("n"), F.sum("total_e2").alias("total_e2"))
    )


def finish(partials: DataFrame) -> DataFrame:
    """Derive finished metrics from states: count, exact cent total,
    avg gridded to e4 (computed from the exact integer state)."""
    from finance_etl_pipeline_spark.functions.scalars import igrid

    return partials.select(
        "bucket",
        "key",
        F.col("n").alias("n_events"),
        F.col("total_e2").alias("total_value_e2"),
        igrid(F.col("total_e2") / F.col("n") / 100, 4).alias("avg_value_e4"),
    )
