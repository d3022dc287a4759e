"""VACUUM DRY RUN, DESCRIBE DETAIL, and time travel composing inside
INSERT / CTAS / MERGE payloads (r11 surface additions)."""

from __future__ import annotations

import os

import pytest

from finance_etl_pipeline_spark.operators import manifest as M
from finance_etl_pipeline_spark.operators.sqldml import (
    execute_ddl,
    execute_dml,
)


@pytest.fixture()
def tbl(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(
        spark.createDataFrame(
            [(i, i * 10) for i in range(6)], "id int, val int"
        ).coalesce(1),
        t,
    )  # v1
    M.commit(
        spark.createDataFrame([(9, 90)], "id int, val int").coalesce(1),
        t,
        mode="overwrite",
    )  # v2: v1's dir is now reclaimable
    return t


def test_vacuum_dry_run_reports_without_deleting(spark, tbl):
    res = execute_dml(
        spark, "VACUUM t RETAIN 0 HOURS KEEP LAST 1 DRY RUN", {"t": tbl}
    )
    assert res["op"] == "vacuum_dry_run" and res["removed"] == 1
    # nothing touched: the old version still reads, the path exists
    assert os.path.isdir(os.path.join(tbl, res["paths"][0]))
    assert M.read_version(spark, tbl, 1).count() == 6
    # the real vacuum then removes exactly what the dry run promised
    res2 = execute_dml(
        spark, "VACUUM t RETAIN 0 HOURS KEEP LAST 1", {"t": tbl}
    )
    assert res2["removed"] == 1
    assert not os.path.exists(os.path.join(tbl, res["paths"][0]))


def test_describe_detail(spark, tbl):
    M.add_constraint(spark, tbl, "pos", "val >= 0")  # v3
    res = execute_dml(spark, "DESCRIBE DETAIL t", {"t": tbl})
    d = res["detail"]
    assert d["version"] == 3
    assert d["n_rows"] == 1 and d["n_files"] == 1
    assert d["size_bytes"] > 0
    assert d["constraints"] == ["pos"]
    assert d["schema_fields"] == 2
    assert d["column_mapping"] is False
    assert d["partition_layouts"] == []
    assert d["n_tombstones"] == 0
    # empty table: minimal dict, no crash
    assert M.describe_detail(str(tbl) + "_nope")["version"] == 0


def test_time_travel_composes_in_dml_payloads(spark, tbl, tmp_path):
    # INSERT INTO t SELECT ... FROM t VERSION AS OF 1 — the
    # restore-into-copy shape (v2 overwrote down to 1 row)
    execute_dml(
        spark,
        "INSERT INTO t SELECT id, val FROM t VERSION AS OF 1",
        {"t": tbl},
    )
    assert M.read_version(spark, tbl).count() == 7
    # MERGE with a time-traveled subquery source
    execute_dml(
        spark,
        "MERGE INTO t USING (SELECT id, val + 1 AS val FROM t@1 "
        "WHERE id < 2) AS s ON t.id = s.id",
        {"t": tbl},
    )
    rows = {
        r.id: r.val for r in M.read_version(spark, tbl).collect()
    }
    assert rows[0] == 1 and rows[1] == 11  # merged from the v1 values
    # CTAS from a pinned version of a CATALOG table
    from finance_etl_pipeline_spark.operators import catalog as C

    root = str(tmp_path / "wh")
    C.create_table(root, "src", location=tbl)
    res = execute_ddl(
        spark,
        "CREATE TABLE frozen AS SELECT * FROM src VERSION AS OF 1",
        root,
    )
    assert res["op"] == "create_table_as"
    assert M.read_version(spark, C.resolve(root, "frozen")).count() == 6
