"""Catalog VIEWS (operators/catalog.py + the sqldml/CLI DDL surface):
persisted SELECT texts with one shared namespace against tables,
CREATE OR REPLACE, cycle rejection, fixpoint registration, and the
CLI end-to-end."""

from __future__ import annotations

import pytest

from finance_etl_pipeline_spark.cli import main as cli_main
from finance_etl_pipeline_spark.operators import catalog as C
from finance_etl_pipeline_spark.operators import manifest as M
from finance_etl_pipeline_spark.operators.sqldml import (
    SqlDmlError,
    execute_ddl,
    register_catalog_views,
)


@pytest.fixture()
def wh(spark, tmp_path):
    root = str(tmp_path / "wh")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(8)], "id int, val int"
    ).coalesce(1)
    C.create_table_as(spark, root, "base", df)
    M.read_version(spark, C.resolve(root, "base")).createOrReplaceTempView(
        "base"
    )
    return root


def test_create_show_drop_view(spark, wh):
    C.create_view(wh, "v1", "SELECT id FROM base WHERE id < 4")
    assert C.show_views(wh) == [
        {"name": "v1", "sql": "SELECT id FROM base WHERE id < 4"}
    ]
    assert "id < 4" in C.view_sql(wh, "v1")
    # replace requires the flag
    with pytest.raises(C.TableExistsError, match="OR REPLACE"):
        C.create_view(wh, "v1", "SELECT id FROM base")
    C.create_view(wh, "v1", "SELECT id FROM base", or_replace=True)
    assert C.view_sql(wh, "v1") == "SELECT id FROM base"
    C.drop_view(wh, "v1")
    assert C.show_views(wh) == []
    with pytest.raises(C.CatalogError, match="unknown view"):
        C.drop_view(wh, "v1")
    with pytest.raises(C.CatalogError, match="unknown view"):
        C.view_sql(wh, "v1")


def test_namespace_is_shared_with_tables(spark, wh):
    with pytest.raises(C.TableExistsError, match="TABLE"):
        C.create_view(wh, "base", "SELECT 1 AS x")
    C.create_view(wh, "v1", "SELECT 1 AS x")
    with pytest.raises(C.TableExistsError, match="VIEW"):
        C.create_table(wh, "v1")
    # rename onto a view name refuses too
    with pytest.raises(C.TableExistsError, match="VIEW"):
        C.rename_table(wh, "base", "v1")


def test_circular_references_rejected(spark, wh):
    C.create_view(wh, "va", "SELECT id FROM base")
    C.create_view(wh, "vb", "SELECT id FROM va")
    # direct self-reference
    with pytest.raises(C.CatalogError, match="circular"):
        C.create_view(wh, "vs", "SELECT id FROM vs")
    # closing a 2-cycle via OR REPLACE: va -> vb -> va
    with pytest.raises(C.CatalogError, match="circular"):
        C.create_view(wh, "va", "SELECT id FROM vb", or_replace=True)
    # a table named like the view text token is NOT a view ref
    C.create_view(wh, "vc", "SELECT id FROM base WHERE 'va' = 'va'")


def test_fixpoint_registration_and_current_state(spark, wh):
    """Views over views register regardless of name order, and a view
    answers from the CURRENT table snapshot."""
    C.create_view(wh, "a_outer", "SELECT * FROM z_inner WHERE id < 6")
    C.create_view(wh, "z_inner", "SELECT id, val FROM base WHERE id % 2 = 0")
    status = register_catalog_views(spark, wh)
    assert status == {"a_outer": None, "z_inner": None}
    assert spark.sql("SELECT count(*) AS n FROM a_outer").collect()[0][
        "n"
    ] == 3  # ids 0,2,4
    # table grows -> re-registration reflects it (views store text)
    M.commit(
        spark.createDataFrame([(10, 100), (12, 120)], "id int, val int"),
        C.resolve(wh, "base"),
    )
    M.read_version(spark, C.resolve(wh, "base")).createOrReplaceTempView(
        "base"
    )
    register_catalog_views(spark, wh)
    assert spark.sql(
        "SELECT count(*) AS n FROM z_inner"
    ).collect()[0]["n"] == 6  # 0,2,4,6,10,12


def test_broken_view_degrades_to_status(spark, wh):
    C.create_view(wh, "vbad", "SELECT nope_col FROM base")
    status = register_catalog_views(spark, wh)
    assert status["vbad"] is not None  # analysis error captured


def test_ddl_surface_validates_and_round_trips(spark, wh):
    res = execute_ddl(
        spark, "CREATE VIEW v1 AS SELECT id FROM base WHERE id < 3", wh
    )
    assert res == {"op": "create_view", "table": "v1"}
    # typo'd column fails at CREATE, nothing persisted
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        execute_ddl(spark, "CREATE VIEW v2 AS SELECT nope FROM base", wh)
    assert [v["name"] for v in C.show_views(wh)] == ["v1"]
    res = execute_ddl(
        spark,
        "CREATE OR REPLACE VIEW v1 AS SELECT id FROM base WHERE id < 5",
        wh,
    )
    assert res["op"] == "create_view"
    rows = execute_ddl(spark, "SHOW VIEWS", wh)["rows"]
    assert rows == [{"name": "v1", "sql": "SELECT id FROM base WHERE id < 5"}]
    assert execute_ddl(spark, "DROP VIEW v1", wh) == {
        "op": "drop_view",
        "table": "v1",
    }
    with pytest.raises(SqlDmlError, match="SHOW TABLES, SHOW VIEWS"):
        execute_ddl(spark, "SHOW GRANTS", wh)


def test_cli_view_end_to_end(wh, capsys, sf_dir):
    rc = cli_main(
        [
            "sql",
            "CREATE VIEW small AS SELECT id FROM base WHERE id <= 2",
            "--sf-dir",
            sf_dir,
            "--warehouse",
            wh,
        ]
    )
    assert rc == 0
    capsys.readouterr()
    rc = cli_main(
        [
            "sql",
            "SELECT count(*) AS n FROM small",
            "--sf-dir",
            sf_dir,
            "--warehouse",
            wh,
        ]
    )
    assert rc == 0
    assert "3" in capsys.readouterr().out
    rc = cli_main(
        ["sql", "SHOW VIEWS", "--sf-dir", sf_dir, "--warehouse", wh]
    )
    assert rc == 0
    assert "small" in capsys.readouterr().out
