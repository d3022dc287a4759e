"""A/B helper for the optimization rounds: oracle-check one or more
queries under a PLAIN session (the driver's environment) and time them
under the bench session (warm-up + best-of-N, noop sink).

Usage:
    python tools/ab_query.py q4_order_priority[,name2,...] \
        [--sf /root/testdata/sf0.1] [--check-sf /root/testdata/sf0.01] \
        [--n 3] [--no-check] [--no-time] [--plan-out DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--check-sf", default="/root/testdata/sf0.01")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--no-check", action="store_true")
    ap.add_argument("--no-time", action="store_true")
    ap.add_argument("--plan-out", default=None)
    args = ap.parse_args()
    names = args.names.split(",")

    from pyspark.sql import SparkSession

    from finance_etl_pipeline_spark.plans import all_queries

    registry = all_queries()
    bad = [n for n in names if n not in registry]
    if bad:
        print(f"unknown queries: {bad}")
        return 2

    failures = 0

    if not args.no_check:
        from oracle_harness import compare

        spark = (
            SparkSession.builder.master(
                f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
            )
            .appName("ab-check")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        for name in names:
            qdef = registry[name]
            if qdef.oracle is None:
                n = qdef.fn(spark, args.check_sf).count()
                print(f"CHECK {name}: rows-only, {n} rows")
                continue
            for sf in (args.check_sf, "/root/testdata/sf0.001"):
                res = compare(spark, qdef, sf)
                tag = "OK" if res["ok"] else "FAIL"
                if not res["ok"]:
                    failures += 1
                print(f"CHECK {name} @ {sf}: {tag} {'' if res['ok'] else res['detail'][:200]}")
        spark.stop()

    if not args.no_time:
        from finance_etl_pipeline_spark.session import get_spark

        SparkSession.getActiveSession() and SparkSession.getActiveSession().stop()
        spark = get_spark(app_name="ab-time", shuffle_partitions=16)
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))
        spark.conf.set("spark.sql.files.openCostInBytes", str(1 << 16))
        spark.sparkContext.setLogLevel("ERROR")
        for name in names:
            qdef = registry[name]
            df = qdef.fn(spark, args.sf)
            if args.plan_out:
                os.makedirs(args.plan_out, exist_ok=True)
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(os.path.join(args.plan_out, f"{name}.txt"), "w") as fh:
                    fh.write(plan)
            df.write.format("noop").mode("overwrite").save()  # warm-up
            best, all_t = float("inf"), []
            for _ in range(args.n):
                t0 = time.perf_counter()
                qdef.fn(spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                all_t.append(round(dt, 3))
                best = min(best, dt)
            print(f"TIME {name}: best {best:.4f}s of {all_t}")
        spark.stop()

    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
