"""Streaming CDC sink: foreachBatch → MERGE into a plain-Parquet table.

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

from finance_etl_pipeline_spark.operators.merge import upsert


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
        if os.path.exists(path):
            target = spark.read.parquet(path)
        else:
            target = spark.createDataFrame([], batch_df.schema)
        merged = upsert(target, batch_df, keys, order_col=order_col)
        tmp = path.rstrip("/") + "._upsert_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(path):
            old = path.rstrip("/") + "._upsert_old"
            os.rename(path, old)
            os.rename(tmp, path)
            shutil.rmtree(old)
        else:
            os.rename(tmp, path)

    return stream.writeStream.foreachBatch(_process)
