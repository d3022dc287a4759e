"""Snapshot diff: compare two versions of a keyed table and classify
every key as added / removed / changed / unchanged.

The anti-entropy primitive for plain-Parquet lakes (no table format,
no transaction log): run after a backfill or a CDC replay to see
exactly what moved, feed `changed ∪ added` downstream as the
increment, and alert on unexpected `removed`.

Shape: both sides reduce to (key, row_hash) — the hash is computed
from the non-key columns in a deterministic column order — then one
full outer join on the key classifies everything.  At 100 TB the
join shuffles hashes (16 bytes/row), not rows; pre-bucketed snapshots
co-locate and skip the exchange entirely (tests/test_bucketing.py
shows the layout)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """(keys..., change_type) for every key present in either side.

    ``change_type`` ∈ {'added', 'removed', 'changed', 'unchanged'}.
    Both inputs must share a schema; non-key columns are hashed in
    sorted-name order so column order differences never count as
    changes."""
    if old.columns != new.columns and set(old.columns) != set(new.columns):
        raise ValueError(
            f"snapshot schemas differ: {old.columns} vs {new.columns}"
        )
    value_cols = sorted(c for c in old.columns if c not in keys)
    if not value_cols:
        raise ValueError("no non-key columns to compare")

    def hashed(df: DataFrame, name: str) -> DataFrame:
        # hash each column separately, then hash the fixed-width
        # concatenation: per-column digests cannot bleed into each
        # other, so no separator/sentinel value occurring IN the data
        # can make two different rows collide (md5 output is always
        # 32 hex chars; 'N' marks NULL unambiguously).  The outer
        # digest is unhex'd to a 16-byte BINARY so the join shuffles
        # true 16-byte digests, not 32-char hex strings.
        col_digests = [
            F.coalesce(F.md5(F.col(c).cast("string")), F.lit("N" * 32))
            for c in value_cols
        ]
        h = F.unhex(F.md5(F.concat(*col_digests)))
        return df.select(*keys, h.alias(name))

    o = hashed(old, "h_old")
    n = hashed(new, "h_new")
    change = (
        F.when(F.col("h_old").isNull(), "added")
        .when(F.col("h_new").isNull(), "removed")
        .when(F.col("h_old") != F.col("h_new"), "changed")
        .otherwise("unchanged")
    )
    return o.join(n, keys, "full_outer").select(
        *keys, change.alias("change_type")
    )
