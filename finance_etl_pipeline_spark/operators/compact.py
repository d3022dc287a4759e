"""Small-file compaction for plain-Parquet tables.

Streaming sinks, per-batch upserts, and fine-grained partition writes
all accrete small files; at 100 TB the resulting scan-task explosion
(one task per file, seconds of scheduler overhead per wave) and
NameNode/manifest pressure dominate query latency long before data
volume does.  Compaction is the standing maintenance job that rewrites
a table (or one partition of it) into ~target-sized files.

Plain-Parquet version of what Delta OPTIMIZE / Iceberg rewrite_data_files
do transactionally: size the output file count from the actual on-disk
bytes, rewrite with a single wide shuffle-free coalesce, then swap.
The rewrite preserves rows exactly (tests/test_compact.py) — it's a
physical-layout-only operation.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024  # one HDFS-ish block per file


def data_bytes(path: str) -> int:
    """On-disk bytes of a table directory's data files."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def data_files(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")) and f.endswith(".parquet"):
                out.append(os.path.join(root, f))
    return out


def plan_file_count(path: str, target_bytes: int = DEFAULT_TARGET_BYTES) -> int:
    """ceil(bytes/target), min 1 — computed from real sizes, never
    guessed from row counts (compression ratio varies per table)."""
    return max(1, -(-data_bytes(path) // target_bytes))


def compact(
    spark: SparkSession,
    path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> int:
    """Rewrite the Parquet table at ``path`` into ~target-sized files.

    Uses coalesce (narrow — no shuffle: each output task concatenates
    input splits) and a write-then-swap so a crash mid-rewrite leaves
    the original table intact.  Returns the new file count.

    On a cluster the swap is a metastore/manifest pointer flip; on a
    filesystem it is a directory rename, which is what this does.
    """
    n = plan_file_count(path, target_bytes)
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "._compact_tmp"
    df.coalesce(n).write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "._compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return len(data_files(path))
