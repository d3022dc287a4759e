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


# ---------------------------------------------------------------------------
# Merkle-style bucket reconciliation: find WHERE two snapshots differ
# without comparing rows, then row-diff only the differing buckets.
# ---------------------------------------------------------------------------

_MOD = 1_000_000_007  # mod-p row digests keep bucket sums in BIGINT


def bucket_digests(
    df: DataFrame, keys: list[str], n_buckets: int = 256
) -> DataFrame:
    """(bucket, n_rows, digest): an order-independent content summary
    per hash bucket of the key space.  The digest is the mod-p sum of
    per-row 60-bit content hashes (key + value columns, sorted column
    order), so two snapshots agree on a bucket iff — up to hash
    collision — that key range's content is identical.  n_buckets
    rows total: the exchange format for anti-entropy between sites
    (ship KBs of digests, not the table)."""
    all_cols = sorted(df.columns)
    row_h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        *[
                            F.coalesce(
                                F.md5(F.col(c).cast("string")),
                                F.lit("N" * 32),
                            )
                            for c in all_cols
                        ]
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % _MOD
    )
    key_h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", *[F.col(k).cast("string") for k in keys])),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return (
        df.select(
            (key_h % n_buckets).cast("int").alias("bucket"),
            row_h.alias("h"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            (F.sum("h") % _MOD).cast("long").alias("digest"),
        )
    )


def differing_buckets(
    old: DataFrame, new: DataFrame, keys: list[str], n_buckets: int = 256
) -> DataFrame:
    """Buckets whose (n_rows, digest) disagree between snapshots —
    a ≤ n_buckets-row frame.  Missing-on-one-side buckets count as
    differing."""
    a = bucket_digests(old, keys, n_buckets).alias("a")
    b = bucket_digests(new, keys, n_buckets).alias("b")
    j = a.join(b, "bucket", "full_outer")
    return j.filter(
        F.col("a.n_rows").isNull()
        | F.col("b.n_rows").isNull()
        | (F.col("a.n_rows") != F.col("b.n_rows"))
        | (F.col("a.digest") != F.col("b.digest"))
    ).select("bucket")


def reconcile(
    old: DataFrame, new: DataFrame, keys: list[str], n_buckets: int = 256
) -> DataFrame:
    """Two-phase anti-entropy: locate differing buckets from digests
    alone, then run ``table_diff`` restricted to rows in those
    buckets.  Cost: one digest pass per side (map-side combined to
    n_buckets rows) + a row-level diff over ONLY the divergent key
    ranges — when drift is sparse, that is a small fraction of the
    table instead of the full-outer join ``table_diff`` alone pays.
    Returns table_diff's classification, which by construction can
    only contain non-'unchanged' rows from differing buckets (rows in
    agreeing buckets are provably identical up to hash collision and
    are skipped, not reported)."""
    # the join column lives under a collision-proof name so a snapshot
    # that itself has a 'bucket' VALUE column is compared, not clobbered
    tmp = "__reconcile_bucket"
    bad = differing_buckets(old, new, keys, n_buckets).withColumnRenamed(
        "bucket", tmp
    )
    key_h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", *[F.col(k).cast("string") for k in keys])),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    bucket = (key_h % n_buckets).cast("int").alias(tmp)

    def restrict(df: DataFrame) -> DataFrame:
        return (
            df.withColumn(tmp, bucket)
            .join(F.broadcast(bad), tmp, "left_semi")
            .drop(tmp)
        )

    return table_diff(restrict(old), restrict(new), keys)
