"""Seeded model fuzz for the metadata-only aggregate route.

The property: for ANY table the engine can produce (random
partitioning, schema evolution, NULL/NaN values, numeric-looking
string partitions, tombstones) and ANY statement in the route's
grammar, ``try_metadata_select`` either DECLINES (None) or returns
exactly what ``spark.sql`` returns over the scan — names, dtypes,
nullability, values.  A decline is always legal; a served wrong
answer never is.  The test also asserts a minimum serve rate so the
property cannot pass vacuously by declining everything."""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest

from finance_etl_pipeline_spark.operators import manifest as M
from finance_etl_pipeline_spark.operators.sqldml import (
    try_metadata_select,
)

AGG_COLS = ["k", "x", "p", "q", "s", "e", "nope"]
PREDS = [
    "p = 'a'",
    "p = '01'",
    "p IS NULL",
    "q = 2",
    "q = 9",
    "x = 1.5",
    "p = 5",
]
GROUPS = [["p"], ["q"], ["p", "q"], ["s"]]


def _mk_table(spark, path, rng):
    """One random table; returns its dir."""
    n = rng.randrange(20, 60)
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                float("nan")
                if rng.random() < 0.05
                else round(rng.uniform(0, 100), 2),
                rng.choice(["a", "b", "01", None]),
                rng.randrange(0, 4),
                rng.choice(["w1", "w2", "w3"]),
            )
        )
    df = spark.createDataFrame(
        rows, "k long, x double, p string, q int, s string"
    )
    part = rng.choice([None, ["p"], ["q"], ["p", "q"]])
    cut = rng.randrange(1, n)
    M.commit(
        df.filter(F.col("k") < cut),
        path,
        partition_by=part,
    )
    if rng.random() < 0.7:  # second commit, sometimes evolved
        extra = df.filter(F.col("k") >= cut)
        if rng.random() < 0.5:
            extra = extra.withColumn("e", (F.col("k") * 2))
        M.commit(
            extra,
            path,
            mode="append",
            partition_by=part if rng.random() < 0.8 else None,
        )
    if rng.random() < 0.2:  # tombstones: route must decline
        M.delete_where(path, [("q", "==", 1)])
    return path


def _mk_stmt(rng):
    items = []
    for _ in range(rng.randrange(1, 4)):
        kind = rng.choice(["count_star", "count", "min", "max"])
        if kind == "count_star":
            items.append("count(*)")
        else:
            items.append(f"{kind}({rng.choice(AGG_COLS)})")
    stmt = f"SELECT {', '.join(items)} FROM t"
    if rng.random() < 0.5:
        conj = rng.sample(PREDS, rng.randrange(1, 3))
        stmt += " WHERE " + " AND ".join(conj)
    if rng.random() < 0.4:
        g = rng.choice(GROUPS)
        stmt += " GROUP BY " + ", ".join(g)
        # group cols must appear in the select list to be comparable
        stmt = stmt.replace("SELECT ", f"SELECT {', '.join(g)}, ", 1)
    return stmt


def _triples(df):
    return [(f.name, f.dataType, f.nullable) for f in df.schema.fields]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_metadata_route_never_serves_a_wrong_answer(
    spark, tmp_path, seed
):
    rng = random.Random(seed)
    served = attempted = 0
    for ti in range(3):
        t = str(tmp_path / f"tbl{ti}")
        _mk_table(spark, t, rng)
        view = None
        # three canonical probes (k is never NaN and always present)
        # keep the serve-rate floor honest: they serve whenever the
        # table has no tombstones, whatever the random layout did
        canonical = [
            "SELECT count(*) FROM t",
            "SELECT count(k) FROM t",
            "SELECT min(k), max(k) FROM t",
        ]
        for stmt in canonical + [_mk_stmt(rng) for _ in range(12)]:
            attempted += 1
            md = try_metadata_select(spark, stmt, {"t": t})
            if md is None:
                continue  # declining is always legal
            served += 1
            if view is None:
                M.read_version(spark, t).createOrReplaceTempView("t")
                view = True
            try:
                ref = spark.sql(stmt)
                ref_rows = ref.collect()
            except Exception as e:  # noqa: BLE001
                pytest.fail(
                    f"route served a statement Spark rejects: "
                    f"{stmt!r}: {e}"
                )
            assert _triples(md) == _triples(ref), stmt
            assert sorted(md.collect(), key=str) == sorted(
                ref_rows, key=str
            ), f"served wrong answer for {stmt!r}"
    # the property must not pass by declining everything: unless every
    # random table drew tombstones (p = 0.2^3), the canonical probes
    # alone serve 3+ statements
    assert served >= 3, (
        f"only {served}/{attempted} statements served — the fast "
        "path effectively disabled itself"
    )
