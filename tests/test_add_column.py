"""ALTER TABLE ... ADD COLUMN (manifest.add_column): metadata-only
schema widening — NULL reads from existing files, later writes supply
values, dropped-then-re-added names never resurrect old bytes."""

from __future__ import annotations

import pytest

from finance_etl_pipeline_spark.operators import manifest as M
from finance_etl_pipeline_spark.operators.sqldml import (
    SqlDmlError,
    execute_dml,
)


@pytest.fixture()
def tbl(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(
        spark.createDataFrame(
            [(1, 10), (2, 20)], "id int, val int"
        ).coalesce(1),
        t,
    )
    return t


def test_add_column_reads_null_then_writable(spark, tbl):
    v = M.add_column(tbl, "note", "string")
    assert v == 2
    df = M.read_version(spark, tbl)
    assert df.columns == ["id", "val", "note"]
    assert all(r.note is None for r in df.collect())
    # pruned reads and predicates on the new column behave
    assert (
        M.read_version(spark, tbl, where=[("note", "is_null")]).count() == 2
    )
    # a later write supplies values; earlier rows stay NULL
    M.commit(
        spark.createDataFrame(
            [(3, 30, "x")], "id int, val int, note string"
        ).coalesce(1),
        tbl,
    )
    got = {r.id: r.note for r in M.read_version(spark, tbl).collect()}
    assert got == {1: None, 2: None, 3: "x"}
    # time travel: the pre-add version keeps the narrow schema
    assert M.read_version(spark, tbl, 1).columns == ["id", "val"]


def test_re_added_name_never_resurrects_dropped_bytes(spark, tbl):
    M.drop_column(tbl, "val")  # v2: physical 'val' retired
    M.add_column(tbl, "val", "int")  # v3: fresh physical
    df = M.read_version(spark, tbl)
    assert df.columns == ["id", "val"]
    assert all(r.val is None for r in df.collect())  # never 10/20


def test_add_column_validation_and_sql(spark, tbl):
    with pytest.raises(ValueError, match="already exists"):
        M.add_column(tbl, "val", "int")
    with pytest.raises(Exception):
        M.add_column(tbl, "bad", "not_a_type")
    res = execute_dml(
        spark, "ALTER TABLE t ADD COLUMN scores array<double>", {"t": tbl}
    )
    assert res == {"op": "add_column", "table": "t", "version": 2}
    f = dict(
        (fl.name, fl.dataType.simpleString())
        for fl in M.read_version(spark, tbl).schema.fields
    )
    assert f["scores"] == "array<double>"
    with pytest.raises(SqlDmlError, match="malformed ALTER"):
        execute_dml(spark, "ALTER TABLE t ADD COLUMN", {"t": tbl})
