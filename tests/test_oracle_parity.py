"""Every registered query must match its DuckDB oracle at the test SF.

This mirrors the driver's t2 gate (which runs at sf0.01) so breakage is
caught locally before a round ends.
"""

from __future__ import annotations

import pytest

from finance_etl_pipeline_spark.plans import all_queries
from tests.oracle_harness import compare

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    result = compare(spark, QUERIES[name], sf_dir)
    assert result["ok"], f"{name}: {result['detail']}"


def test_session_gap_exact_boundary_cross_engine(spark, tmp_path):
    """Events exactly 30 minutes apart must stay in ONE session in
    both engines: Spark session_window's merge boundary is INCLUSIVE
    (an event at lastEvent + gap still extends the session — verified
    here empirically, contradicting the half-open-window reading), so
    the gaps-and-islands oracle must use strict > INTERVAL 30 MINUTE.
    Constructed boundary data — the testdata's microsecond timestamps
    never land on the boundary naturally."""
    import duckdb
    from pyspark.sql import functions as F

    rows = [
        (1, 100, "2024-01-01 00:00:00", "view", 1.0),
        (2, 100, "2024-01-01 00:30:00", "view", 1.0),  # exactly 30m
        (3, 100, "2024-01-01 00:59:59", "view", 1.0),  # 29m59s after
        (4, 200, "2024-01-01 00:00:00", "view", 1.0),
        (5, 200, "2024-01-01 00:29:59", "purchase", 1.0),  # within gap
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_s string, event_type string, value double"
    ).select(
        "event_id", "user_id",
        F.to_timestamp("ts_s").alias("ts"), "event_type", "value",
    )
    spark_sessions = (
        df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", "n")
        .orderBy("user_id", "n")
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev (event_id BIGINT, user_id BIGINT, ts TIMESTAMP, event_type VARCHAR)"
    )
    for e, u, t, et, _ in rows:
        con.execute("INSERT INTO ev VALUES (?, ?, ?, ?)", [e, u, t, et])
    oracle = con.execute(
        """
        WITH ordered AS (
          SELECT user_id, ts,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                           > INTERVAL 30 MINUTE
                      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS is_new
          FROM ev
        ),
        s AS (
          SELECT user_id,
                 sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS session_no
          FROM ordered
        )
        SELECT user_id, count(*) AS n FROM s
        GROUP BY user_id, session_no ORDER BY user_id, n
        """
    ).fetchall()
    got = [(r["user_id"], r["n"]) for r in spark_sessions]
    # user 100: ONE session of 3 (the exact-boundary event merges)
    assert got == [(100, 3), (200, 2)], got
    assert got == [tuple(r) for r in oracle]


def test_concurrent_sessions_subsecond_hour_boundary(spark):
    """Regression (review finding): bucketing on unix_timestamp()
    truncated to whole seconds, so a session crossing an hour boundary
    only within its fractional-second tail never claimed the last hour
    bucket and overlaps confined there were missed.  Constructed
    counterexample: sessions [09:30:00.2, 10:00:00.2) and
    [10:00:00.1, 10:30:00.1) overlap for 0.1s past the 10:00 boundary."""
    import duckdb
    from pyspark.sql import functions as F

    rows = [
        (1, 1, "2024-01-01 09:30:00.200000", "view", 1.0),
        (2, 2, "2024-01-01 10:00:00.100000", "view", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_s string, event_type string, value double"
    ).select(
        "event_id", "user_id", F.to_timestamp("ts_s").alias("ts"),
        "event_type", "value",
    )
    iv = (
        df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", F.col("w.start").alias("s_start"),
                F.col("w.end").alias("s_end"))
    )
    bucket = F.explode(
        F.sequence(
            F.floor(F.unix_micros("s_start") / 3_600_000_000),
            F.floor((F.unix_micros("s_end") - 1) / 3_600_000_000),
        )
    )
    binned = iv.select("user_id", "s_start", "s_end", bucket.alias("b"))
    a = binned.select(F.col("user_id").alias("ua"), F.col("s_start").alias("as_"),
                      F.col("s_end").alias("ae"), "b")
    b = binned.select(F.col("user_id").alias("ub"), F.col("s_start").alias("bs"),
                      F.col("s_end").alias("be"), "b")
    got = (
        a.join(b, ["b"])
        .filter(F.col("ua") < F.col("ub"))
        .filter((F.col("as_") < F.col("be")) & (F.col("bs") < F.col("ae")))
        .select("ua", "ub")
        .distinct()
        .collect()
    )
    assert [(r["ua"], r["ub"]) for r in got] == [(1, 2)]
