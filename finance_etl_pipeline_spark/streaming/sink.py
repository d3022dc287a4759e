"""Streaming CDC sinks: foreachBatch → MERGE into a plain-Parquet
table, or exactly-once commits/merges INTO a versioned manifest table.

Connects the streaming layer to the batch merge operator
(operators/merge.py): every micro-batch is upserted into the target
table by key — the standing pattern for maintaining a queryable,
deduplicated "current state" table from an event/CDC stream without a
transactional lake format.

Each batch rewrite is write-to-tmp + directory swap (same crash-safe
protocol as operators/compact.py) because Spark cannot overwrite a
path that the same job is lazily reading.  On a cluster the swap is a
manifest/metastore flip; per-batch full rewrite is the plain-Parquet
cost — with a partitioned target the merge touches only the partitions
a batch's keys land in (run_months shows that storage half).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.operators.merge import upsert


def _recover_replica(path: str, old: str) -> None:
    """Crash recovery, run at batch START: a crash between the two
    swap renames leaves the replica at ``old`` and nothing at
    ``path`` — restore it, or the retried batch would merge into an
    empty target and silently drop the replica's accumulated state.
    A leftover ``old`` WITH ``path`` present means the crash happened
    after the second rename but before the rmtree — just cleanup."""
    if os.path.exists(old):
        if os.path.exists(path):
            shutil.rmtree(old)
        else:
            os.rename(old, path)


def _swap_in(path: str, tmp: str, old: str) -> None:
    """Publish ``tmp`` at ``path`` via rename-through-old.  Callers
    must have run ``_recover_replica`` first, so ``old`` is clear and
    any crash mid-swap is recoverable on the next attempt."""
    if os.path.exists(path):
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
    else:
        os.rename(tmp, path)


def upsert_each_batch(
    stream: DataFrame,
    spark: SparkSession,
    path: str,
    keys: list[str],
    order_col: str | None = None,
):
    """writeStream query that merges every micro-batch into ``path``.

    ``order_col`` resolves duplicate keys within a batch (latest wins
    — CDC compaction) and is required for sources that can replay."""

    def _process(batch_df: DataFrame, _batch_id: int) -> None:
        old = path.rstrip("/") + "._upsert_old"
        _recover_replica(path, old)
        if os.path.exists(path):
            target = spark.read.parquet(path)
        else:
            target = spark.createDataFrame([], batch_df.schema)
        merged = upsert(target, batch_df, keys, order_col=order_col)
        tmp = path.rstrip("/") + "._upsert_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        _swap_in(path, tmp, old)

    return stream.writeStream.foreachBatch(_process)


def apply_changefeed_each_batch(
    stream: DataFrame,
    spark: SparkSession,
    path: str,
    keys: list[str],
):
    """writeStream query that applies a versioned-table CDC feed
    (``operators/manifest.py::changefeed_rows`` rows: change_type +
    version + payload) to a plain-Parquet replica at ``path`` — the
    end-to-end CDC loop: manifest log → changefeed → streaming MERGE.

    Semantics per micro-batch: each key resolves to its highest-
    ``version`` row in the batch (so one batch may safely contain
    several version steps, including a remove-then-re-add);
    'added'/'changed' upsert the payload, 'removed' deletes the key.
    After draining a feed covering v_a → v_b, the replica equals
    ``read_version(v_b)`` exactly — asserted in
    tests/test_streaming_changefeed.py.

    Scale posture: identical to ``upsert_each_batch`` — the merge is
    one full-outer key join per batch ∝ |replica| + |delta|, the
    rewrite is the plain-Parquet cost (partitioned targets rewrite
    only touched partitions); the feed itself is delta-sized by
    construction."""

    def _process(batch_df: DataFrame, _batch_id: int) -> None:
        old = path.rstrip("/") + "._cdc_old"
        _recover_replica(path, old)
        src = batch_df.withColumn(
            "__is_delete", F.col("change_type") == "removed"
        ).drop("change_type")
        if os.path.exists(path):
            target = spark.read.parquet(path)
        else:
            target = spark.createDataFrame(
                [], src.drop("__is_delete", "version").schema
            )
        merged = upsert(
            target, src, keys, delete_col="__is_delete", order_col="version"
        )
        tmp = path.rstrip("/") + "._cdc_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        _swap_in(path, tmp, old)

    return stream.writeStream.foreachBatch(_process)


def _batch_resolver(table_dir: str, warehouse: str | None):
    """Per-batch table-dir resolution.  Without a warehouse the dir is
    literal (resolved once, closure-captured).  WITH a warehouse,
    ``table_dir`` is a catalog NAME re-resolved on EVERY micro-batch:
    a rename/drop that lands mid-stream then fails the next batch
    loudly with the catalog error (stopping the query) instead of
    silently appending versions to a directory the catalog no longer
    maps — the same freshness contract a metastore-backed Delta sink
    gives a long-running stream."""
    if warehouse is None:
        return lambda: table_dir
    from finance_etl_pipeline_spark.operators import catalog as C

    return lambda: C.resolve(warehouse, table_dir)


def append_stream_to_manifest(
    stream: DataFrame,
    table_dir: str,
    app_id: str,
    partition_by: list[str] | None = None,
    warehouse: str | None = None,
):
    """writeStream query that appends every micro-batch to a manifest
    table (operators/manifest.py) EXACTLY ONCE.

    foreachBatch is at-least-once: Spark re-executes a micro-batch
    after a crash between the sink action and the checkpoint advance,
    and a plain append would double-commit it.  Stamping each commit
    with ``txn=(app_id, batch_id)`` (the Delta txnAppId/txnVersion
    pattern) makes the replay a NO-OP: the manifest records the
    writer's highest applied batch and refuses to re-apply — one
    version per batch, no duplicate rows, no dedup state in the
    query.  ``app_id`` must be stable across restarts (use the
    checkpoint's identity, e.g. a pipeline name — NOT the run id,
    which changes per restart).

    ``partition_by`` writes each batch hive-partitioned — the
    streaming-ingest-into-partitioned-table shape (e.g. by event
    date), so downstream ``read_version(where=...)`` prunes whole
    partitions from metadata while the stream keeps appending.

    ``warehouse`` makes ``table_dir`` a catalog NAME (operators/
    catalog.py), re-resolved per micro-batch — see ``_batch_resolver``
    for the rename-mid-stream contract."""
    from finance_etl_pipeline_spark.operators import manifest as M

    resolve = _batch_resolver(table_dir, warehouse)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return  # idle micro-batch: no version spam.  Safe with
            # txn monotonicity: a later batch's stamp covers this id,
            # and replaying an empty batch is a no-op by definition.
        M.commit(
            batch_df,
            resolve(),
            mode="append",
            partition_by=partition_by,
            txn=(app_id, batch_id),
        )

    return stream.writeStream.foreachBatch(_process)


def apply_changefeed_to_manifest_each_batch(
    stream: DataFrame,
    spark: SparkSession,
    table_dir: str,
    keys: list[str],
    app_id: str,
    warehouse: str | None = None,
):
    """``apply_changefeed_each_batch``'s exactly-once twin with a
    MANIFEST TABLE as the replica: each micro-batch of changefeed rows
    (change_type + version + payload) lands as ONE ``merge_into``
    version — per-key latest-``version`` resolution, 'removed' rows
    delete, 'added'/'changed' upsert — stamped ``txn=(app_id,
    batch_id)`` so a replayed batch is a no-op instead of a duplicate
    version.  No directory swap at all: the manifest publish is
    atomic, readers time-travel mid-apply, and a crash at ANY point
    leaves either the old or the new version, never a torn replica.

    ``warehouse`` makes ``table_dir`` a catalog NAME, re-resolved per
    micro-batch — see ``_batch_resolver``."""
    from finance_etl_pipeline_spark.operators import manifest as M

    resolve = _batch_resolver(table_dir, warehouse)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return  # idle micro-batch: no version spam
        src = batch_df.withColumn(
            "__is_delete", F.col("change_type") == "removed"
        ).drop("change_type")
        M.merge_into(
            spark,
            resolve(),
            src,
            keys,
            delete_col="__is_delete",
            order_col="version",
            txn=(app_id, batch_id),
        )

    return stream.writeStream.foreachBatch(_process)
