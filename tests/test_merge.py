"""Upsert operator: update/insert/keep/delete semantics."""

from __future__ import annotations

from finance_etl_pipeline_spark.operators.merge import upsert


def test_upsert_update_insert_keep(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, amount double",
    )
    source = spark.createDataFrame(
        [(2, "B", 25.0), (4, "d", 40.0)],
        "id long, name string, amount double",
    )
    got = {r.id: (r.name, r.amount) for r in upsert(target, source, ["id"]).collect()}
    assert got == {
        1: ("a", 10.0),   # keep
        2: ("B", 25.0),   # update (source wins)
        3: ("c", 30.0),   # keep
        4: ("d", 40.0),   # insert
    }


def test_upsert_with_deletes(spark):
    target = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    )
    source = spark.createDataFrame(
        [(2, None, True), (3, "c", False)],
        "id long, name string, is_deleted boolean",
    )
    got = {r.id: r.name for r in upsert(target, source, ["id"], "is_deleted").collect()}
    assert got == {1: "a", 3: "c"}  # id=2 deleted


def test_upsert_duplicate_source_keys_raise(spark):
    import pytest

    from finance_etl_pipeline_spark.operators.merge import DuplicateMergeKeysError

    target = spark.createDataFrame([(1, "a")], "id long, name string")
    source = spark.createDataFrame([(1, "x"), (1, "y")], "id long, name string")
    with pytest.raises(DuplicateMergeKeysError):
        upsert(target, source, ["id"]).collect()


def test_upsert_order_col_compacts_cdc_source(spark):
    target = spark.createDataFrame([(1, "a", 0)], "id long, name string, v long")
    source = spark.createDataFrame(
        [(1, "mid", 5), (1, "latest", 9), (2, "new", 1)],
        "id long, name string, v long",
    )
    got = {r.id: r.name for r in upsert(target, source, ["id"], order_col="v").collect()}
    assert got == {1: "latest", 2: "new"}


def test_upsert_preserves_target_column_order(spark):
    target = spark.createDataFrame([("a", 1, 2.0)], "name string, id long, amount double")
    source = spark.createDataFrame([("b", 2, 3.0)], "name string, id long, amount double")
    out = upsert(target, source, ["id"])
    assert out.columns == ["name", "id", "amount"]
