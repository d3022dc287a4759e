"""Driver-style certification sweep: every registered query vs its
DuckDB oracle under a PLAIN SparkSession (bare defaults: ANSI mode on,
no engine configs, no shuffle tuning) — the environment the grading
driver actually uses, so nothing may depend on this repo's session
setup.  The oracle comparison reuses tests/oracle_harness.py (zero
float tolerance + pandas-dtype-kind parity).

Usage:
    python tools/plain_session_sweep.py [sf_dir]   # default sf0.01

Prints one line per failure and a final summary line; exit code 1 on
any failure.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"),
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    from finance_etl_pipeline_spark.plans import all_queries
    from oracle_harness import compare  # tests/oracle_harness.py

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .appName("plain-session-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import gc

    def _release_blocks():
        """Drop the blocks a query leaves behind (cache() persists,
        localCheckpoint RDD blocks).  One query's residue is small,
        but 264 queries' residue OOMs the plain session's default 1g
        driver heap at sf0.1 — the ContextCleaner only unpersists
        blocks after BOTH the Python wrapper and the JVM reference
        are collected, so nudge both collectors every few queries."""
        spark.catalog.clearCache()
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001 — cleanup is best-effort
            pass

    registry = all_queries()
    failures, checked, rows_only = [], 0, 0
    for qi, (name, qdef) in enumerate(sorted(registry.items())):
        if qi % 8 == 7:
            _release_blocks()
        if qdef.oracle is None:
            # rows-only contract: still must RUN under the plain session
            try:
                n = qdef.fn(spark, sf_dir).count()
                assert n >= 0
                rows_only += 1
            except Exception as e:  # noqa: BLE001
                failures.append((name, f"rows-only run failed: {e}"))
            continue
        try:
            res = compare(spark, qdef, sf_dir)
            if res["ok"]:
                checked += 1
            else:
                failures.append((name, res["detail"][:300]))
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"{type(e).__name__}: {e}"[:300]))

    for name, msg in failures:
        print(f"FAIL {name}: {msg}")
    print(
        f"plain-session sweep @ {sf_dir}: {checked} oracle-checked, "
        f"{rows_only} rows-only, {len(failures)} failures"
    )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
