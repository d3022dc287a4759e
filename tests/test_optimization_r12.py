"""Focused regressions for the round-12 optimization rewrites: the
driver-local tiny-commit/read fast paths must be observationally
identical to the Spark paths they shortcut (same snapshot semantics,
same values, same stats-driven skipping), and must FALL BACK rather
than mis-handle snapshots that need the full machinery."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from finance_etl_pipeline_spark.operators import manifest as M


def test_commit_rows_equals_commit(spark, tmp_path):
    """commit_rows and commit publish interchangeable versions: same
    rows, same logical schema, same file-skipping behavior from the
    harvested stats, and they interleave on one table."""
    t = str(tmp_path / "tbl")
    rows1 = [(1, "a", 1.5), (2, "b", None), (3, None, 2.5)]
    ddl = "id long, s string, x double"
    v1 = M.commit_rows(spark, rows1, ddl, t)
    assert v1 == 1
    # a Spark-path append on top of the pyarrow-written v1
    v2 = M.commit(spark.createDataFrame([(4, "d", 4.0)], ddl), t)
    assert v2 == 2
    # and a fast-path append on top of that
    v3 = M.commit_rows(spark, [(5, "e", 5.0)], ddl, t)
    assert v3 == 3
    got = M.read_version(spark, t)
    assert [f.simpleString() for f in got.schema.fields] == [
        "id:bigint",
        "s:string",
        "x:double",
    ]
    assert {
        (r["id"], r["s"], r["x"]) for r in got.collect()
    } == set(rows1) | {(4, "d", 4.0), (5, "e", 5.0)}
    # stats harvested from the pyarrow footer drive file skipping
    # exactly like Spark-written files: id==5 must prune v1's and
    # v2's files from the scan
    pruned = M.read_version(spark, t, where=[("id", "==", 5)])
    assert pruned.count() == 1
    files = {
        os.path.basename(r[0])
        for r in pruned.withColumn("f", F.input_file_name())
        .select("f")
        .distinct()
        .collect()
    }
    assert len(files) == 1


def test_commit_rows_array_column_and_overwrite(spark, tmp_path):
    t = str(tmp_path / "cent")
    rows = [(0, [1.0, 2.0], 2.23606797749979), (1, [0.0, 0.0], 0.0)]
    M.commit_rows(
        spark, rows, "cell_id long, cv array<double>, cn double", t,
        mode="overwrite",
    )
    M.commit_rows(
        spark, [(7, [9.0], 9.0)],
        "cell_id long, cv array<double>, cn double", t, mode="overwrite",
    )
    got = M.read_version(spark, t).collect()
    assert [(r["cell_id"], list(r["cv"]), r["cn"]) for r in got] == [
        (7, [9.0], 9.0)
    ]
    assert M.latest_version(t) == 2


def test_commit_rows_unsupported_type_falls_back(spark, tmp_path):
    """A schema outside the pyarrow mirror (decimal) must fall back to
    the Spark write path and still publish correctly."""
    from decimal import Decimal

    t = str(tmp_path / "dec")
    v = M.commit_rows(
        spark, [(1, Decimal("2.50"))], "id long, amt decimal(10,2)", t
    )
    assert v == 1
    r = M.read_version(spark, t).collect()[0]
    assert r["id"] == 1 and r["amt"] == Decimal("2.50")


def test_commit_rows_txn_idempotent(spark, tmp_path):
    t = str(tmp_path / "txn")
    v1 = M.commit_rows(spark, [(1,)], "x long", t, txn=("app", 1))
    v2 = M.commit_rows(spark, [(1,)], "x long", t, txn=("app", 1))
    assert (v1, v2) == (1, 1)  # replay is a no-op at the tip
    assert M.read_version(spark, t).count() == 1


def test_read_rows_local_equals_read_version(spark, tmp_path):
    t = str(tmp_path / "mix")
    M.commit_rows(spark, [(1, "a"), (2, "b")], "id long, s string", t)
    M.commit(spark.createDataFrame([(3, "c")], "id long, s string"), t)
    local = M.read_rows_local(t)
    via_spark = [r.asDict() for r in M.read_version(spark, t).collect()]
    assert sorted(local, key=lambda r: r["id"]) == sorted(
        via_spark, key=lambda r: r["id"]
    )
    df = M.read_version_local(spark, t)
    assert df.schema == M.read_version(spark, t).schema
    assert {tuple(r) for r in df.collect()} == {(1, "a"), (2, "b"), (3, "c")}


def test_read_rows_local_falls_back_on_tombstones_and_partitions(
    spark, tmp_path
):
    """Snapshots the local reader does not replicate must return None
    (caller falls back), never wrong rows."""
    t = str(tmp_path / "del")
    M.commit_rows(spark, [(1, 0), (2, 1)], "id long, k int", t)
    assert M.read_rows_local(t) is not None
    M.delete_where(t, [("id", "==", 1)])
    assert M.read_rows_local(t) is None  # merge-on-read tombstone
    p = str(tmp_path / "part")
    M.commit(
        spark.createDataFrame([(1, 0), (2, 1)], "id long, k int"),
        p,
        partition_by=["k"],
    )
    assert M.read_rows_local(p) is None  # hive partition layout
    assert M.read_rows_local(str(tmp_path / "nope")) is None  # no table


def test_read_rows_local_schema_evolution(spark, tmp_path):
    """An appended column surfaces as None for pre-evolution files —
    the unionByName(allowMissingColumns) semantics of the full path."""
    t = str(tmp_path / "evo")
    M.commit_rows(spark, [(1,)], "id long", t)
    M.commit_rows(spark, [(2, "b")], "id long, s string", t)
    local = sorted(M.read_rows_local(t), key=lambda r: r["id"])
    assert local == [{"id": 1, "s": None}, {"id": 2, "s": "b"}]
