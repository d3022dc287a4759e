"""Property-style cross-engine check of the fround contract.

Batched (one Spark job + one DuckDB query over many random values)
rather than per-example hypothesis — a Spark job per example would be
prohibitive. Seeds are fixed; the value sets include the adversarial
regions (decimal ties, large magnitudes, negatives).
"""

from __future__ import annotations

import random

import duckdb

from finance_etl_pipeline_spark.functions.scalars import fround, sql_round


def _values() -> list[float]:
    rng = random.Random(12345)
    vals = []
    # uniform ranges incl. negatives and large magnitudes
    for _ in range(300):
        vals.append(rng.uniform(-1e6, 1e6))
    # decimal-tie adversaries: exact .xx5 and .xxxx5 patterns
    for _ in range(300):
        base = rng.randint(-10_000_00, 10_000_00) / 100.0
        vals.append(base + 0.005)
        vals.append(base + 0.00005)
    # tiny values around zero
    for _ in range(100):
        vals.append(rng.uniform(-0.01, 0.01))
    return vals


def test_fround_matches_duckdb_bitwise(spark):
    vals = _values()
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got2 = [r[0] for r in df.select(fround("x", 2)).collect()]
    got4 = [r[0] for r in df.select(fround("x", 4)).collect()]

    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    exp2 = [r[0] for r in con.execute(f"SELECT {sql_round('x', 2)} FROM t").fetchall()]
    exp4 = [r[0] for r in con.execute(f"SELECT {sql_round('x', 4)} FROM t").fetchall()]

    assert got2 == exp2  # bit-identical, not approximately equal
    assert got4 == exp4


def test_igrid_matches_duckdb_bitwise(spark):
    """igrid (the hash-proof integer-grid emitter) must agree with its
    SQL twin value-for-value AND land exactly on fround's numerator:
    igrid(x, n) == fround(x, n) * 10^n as an exact integer."""
    from finance_etl_pipeline_spark.functions.scalars import igrid, sql_igrid

    vals = _values()
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got2 = [r[0] for r in df.select(igrid("x", 2)).collect()]
    got6 = [r[0] for r in df.select(igrid("x", 6)).collect()]
    fr2 = [r[0] for r in df.select(fround("x", 2)).collect()]

    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want2 = [r[0] for r in con.execute(
        f"SELECT {sql_igrid('x', 2)} FROM t").fetchall()]
    want6 = [r[0] for r in con.execute(
        f"SELECT {sql_igrid('x', 6)} FROM t").fetchall()]

    assert got2 == want2
    assert got6 == want6
    # integer grid is exactly fround's numerator (no double round-trip)
    for g, f in zip(got2, fr2):
        assert g == round(f * 100) or abs(g - f * 100) < 1e-6, (g, f)
    # dtype contract: all Python ints (LongType), never floats
    assert all(isinstance(g, int) for g in got2 + got6)
