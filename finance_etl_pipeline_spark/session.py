"""SparkSession factory.

Defaults are chosen for correctness-parity with the DuckDB oracle
(UTC session timezone, ANSI off so bad casts null out like pandas
``errors="coerce"``) and for scale (AQE on, skew-join handling on).

On a real cluster the same builder applies — only ``master`` and the
shuffle-partition count change (shuffle partitions should be ~2-3x the
total executor cores; AQE coalesces the excess at runtime).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "finance-etl-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default 32).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: one shuffle partition per core keeps every stage
        # wide enough without tiny-task overhead. On a cluster this is
        # set higher and AQE coalesces.
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime coalescing, skew-join splitting, dynamic join
        # strategy switch — the main lever for 100 TB robustness.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # ANSI off: invalid casts -> null (matches pandas to_numeric
        # errors='coerce' semantics the DQ layer depends on).
        .config("spark.sql.ansi.enabled", "false")
        # Arrow for the (few) Pandas-UDF paths.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # Parquet scans: 128 MiB splits; at 100 TB this yields ~800k
        # tasks — reasonable with AQE coalescing and dynamic allocation.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    return builder.getOrCreate()
