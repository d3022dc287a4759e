"""SELECT-surface time travel (operators/sqldml.py::
expand_time_travel + the CLI `sql` wiring): `FROM t VERSION AS OF n`,
`FROM t TIMESTAMP AS OF '...'`, and the `t@n` shorthand rewrite to
pinned snapshot views; bad pins and unknown tables fail loudly."""

from __future__ import annotations

import pytest

from finance_etl_pipeline_spark.cli import main as cli_main
from finance_etl_pipeline_spark.operators import manifest as M
from finance_etl_pipeline_spark.operators.sqldml import (
    SqlDmlError,
    expand_time_travel,
)


@pytest.fixture()
def tbl(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(
        spark.createDataFrame(
            [(i, i * 10) for i in range(5)], "id int, val int"
        ).coalesce(1),
        t,
    )  # v1
    M.commit(
        spark.createDataFrame(
            [(i, i * 10) for i in range(5, 9)], "id int, val int"
        ).coalesce(1),
        t,
    )  # v2
    return t


def test_version_as_of_pins_the_snapshot(spark, tbl):
    stmt = expand_time_travel(
        spark,
        "SELECT count(*) AS n FROM t VERSION AS OF 1",
        {"t": tbl},
    )
    assert "t__asof_v1" in stmt and "VERSION" not in stmt
    assert spark.sql(stmt).collect()[0]["n"] == 5
    # latest (unpinned name is the caller's business) differs
    assert M.read_version(spark, tbl).count() == 9


def test_shorthand_and_alias_and_joins(spark, tbl):
    stmt = expand_time_travel(
        spark,
        "SELECT a.id FROM t@1 AS a JOIN t@2 AS b ON a.id = b.id",
        {"t": tbl},
    )
    assert "t__asof_v1" in stmt and "t__asof_v2" in stmt
    assert spark.sql(stmt).count() == 5


def test_timestamp_as_of_resolves_by_commit_ts(spark, tbl):
    ts1 = M._read_manifest(tbl, 1)["ts"]
    stmt = expand_time_travel(
        spark,
        f"SELECT count(*) AS n FROM t TIMESTAMP AS OF {ts1}",
        {"t": tbl},
    )
    assert spark.sql(stmt).collect()[0]["n"] == 5
    # ISO-8601 string form (after both commits -> v2)
    import datetime

    iso = datetime.datetime.fromtimestamp(
        M._read_manifest(tbl, 2)["ts"] + 1
    ).isoformat()
    stmt = expand_time_travel(
        spark,
        f"SELECT count(*) AS n FROM t TIMESTAMP AS OF '{iso}'",
        {"t": tbl},
    )
    assert spark.sql(stmt).collect()[0]["n"] == 9


def test_quoted_literals_are_never_rewritten(spark, tbl):
    stmt = expand_time_travel(
        spark,
        "SELECT 'mail: t@1 and t VERSION AS OF 1' AS s FROM t VERSION AS OF 2",
        {"t": tbl},
    )
    assert "'mail: t@1 and t VERSION AS OF 1'" in stmt
    assert stmt.count("t__asof_v2") == 1
    assert spark.sql(stmt).count() == 9


def test_unknown_table_with_explicit_travel_errors(spark, tbl):
    with pytest.raises(SqlDmlError, match="not a registered"):
        expand_time_travel(
            spark, "SELECT * FROM nope VERSION AS OF 1", {"t": tbl}
        )
    # the @ shorthand on an unknown name is left for Spark (it may be
    # non-travel syntax) — no rewrite, no error here
    out = expand_time_travel(spark, "SELECT * FROM nope@1", {"t": tbl})
    assert out == "SELECT * FROM nope@1"


def test_bad_version_and_vacuumed_version_error(spark, tbl):
    with pytest.raises(M.VersionNotFoundError):
        expand_time_travel(
            spark, "SELECT * FROM t VERSION AS OF 99", {"t": tbl}
        )
    with pytest.raises(M.VersionNotFoundError, match="predates"):
        expand_time_travel(
            spark, "SELECT * FROM t TIMESTAMP AS OF 1.5", {"t": tbl}
        )
    M.vacuum(tbl, keep_last=1, retention_seconds=0.0)
    with pytest.raises(M.VersionNotFoundError):
        expand_time_travel(
            spark, "SELECT * FROM t VERSION AS OF 1", {"t": tbl}
        )


def test_cli_sql_time_travel_end_to_end(tbl, capsys, sf_dir):
    rc = cli_main(
        [
            "sql",
            "SELECT count(*) AS n FROM t VERSION AS OF 1",
            "--sf-dir",
            sf_dir,
            "--manifest-table",
            f"t={tbl}",
        ]
    )
    assert rc == 0
    assert "5" in capsys.readouterr().out
    rc = cli_main(
        [
            "sql",
            "SELECT count(*) AS n FROM t VERSION AS OF 99",
            "--sf-dir",
            sf_dir,
            "--manifest-table",
            f"t={tbl}",
        ]
    )
    assert rc == 2
    assert "time travel error" in capsys.readouterr().err
