"""SQL DML over manifest tables: UPDATE / DELETE / MERGE INTO text
dispatched onto the versioned-table operators, end-to-end through the
CLI ``sql`` subcommand (in-process ``cli.main`` — same code path the
subprocess runs, without a JVM spin-up per case)."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F
import pytest

from finance_etl_pipeline_spark.cli import main as cli_main
from finance_etl_pipeline_spark.operators import manifest as M
from finance_etl_pipeline_spark.operators.sqldml import (
    SqlDmlError,
    execute_dml,
    parse_where,
)
from finance_etl_pipeline_spark.sources.readers import table


# ------------------------------------------------------ parser units


def test_parse_where_ops_and_types():
    assert parse_where("a = 1 AND b != 'x' AND c <= 2.5") == [
        ("a", "==", 1),
        ("b", "!=", "x"),
        ("c", "<=", 2.5),
    ]
    assert parse_where("a <> 'it''s'") == [("a", "!=", "it's")]
    assert parse_where("a IS NULL AND b IS NOT NULL") == [
        ("a", "is_null"),
        ("b", "is_not_null"),
    ]
    assert parse_where("k IN (1, 2, 3)") == [("k", "in", [1, 2, 3])]
    assert parse_where("d >= DATE '2024-01-02'") == [
        ("d", ">=", datetime.date(2024, 1, 2))
    ]
    assert parse_where("t < TIMESTAMP '2024-01-02 03:04:05'") == [
        ("t", "<", datetime.datetime(2024, 1, 2, 3, 4, 5))
    ]


def test_parse_where_rejects_unsupported_shapes():
    with pytest.raises(SqlDmlError, match="OR is not supported"):
        parse_where("a = 1 OR b = 2")
    with pytest.raises(SqlDmlError, match="unsupported literal"):
        parse_where("a = b")  # column-to-column: not stats-provable
    with pytest.raises(SqlDmlError, match="unsupported WHERE term"):
        parse_where("upper(a) = 'X'")


# --------------------------------------------------------- fixtures


def _make_table(spark, sf_dir, tmp_path, name="tbl"):
    t = str(tmp_path / name)
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    M.commit(o.repartitionByRange(4, "o_orderkey"), t)
    return t, o


# ----------------------------------------------------- CLI e2e: verbs


def test_cli_sql_delete(spark, sf_dir, tmp_path, capsys):
    t, o = _make_table(spark, sf_dir, tmp_path)
    rc = cli_main(
        [
            "sql",
            "--manifest-table",
            f"tgt={t}",
            "DELETE FROM tgt WHERE o_orderstatus = 'F'",
        ]
    )
    assert rc == 0
    assert "tgt -> v2 (delete)" in capsys.readouterr().out
    got = M.read_version(spark, t)
    assert got.filter(F.col("o_orderstatus") == "F").count() == 0
    assert (
        got.count()
        == o.filter(F.col("o_orderstatus") != "F").count()
    )
    # time travel still sees the deleted rows
    assert M.read_version(spark, t, 1).count() == o.count()


def test_cli_sql_update_with_expression(spark, sf_dir, tmp_path, capsys):
    t, o = _make_table(spark, sf_dir, tmp_path)
    rc = cli_main(
        [
            "sql",
            "--manifest-table",
            f"tgt={t}",
            "UPDATE tgt SET o_totalprice = o_totalprice * 2.0, "
            "o_orderstatus = upper(concat(o_orderstatus, 'x')) "
            "WHERE o_totalprice < 50000.0 AND o_orderstatus = 'O'",
        ]
    )
    assert rc == 0
    assert "tgt -> v2 (update)" in capsys.readouterr().out
    got = M.read_version(spark, t)
    assert got.count() == o.count()  # UPDATE never changes cardinality
    changed = got.filter(F.col("o_orderstatus") == "OX")
    exp = o.filter(
        (F.col("o_totalprice") < 50000.0) & (F.col("o_orderstatus") == "O")
    )
    assert changed.count() == exp.count()
    lo = exp.agg(F.min("o_orderkey")).first()[0]
    if lo is not None:
        before = o.filter(F.col("o_orderkey") == lo).first()["o_totalprice"]
        after = changed.filter(F.col("o_orderkey") == lo).first()[
            "o_totalprice"
        ]
        assert after == before * 2.0


def test_cli_sql_merge_with_subquery_and_delete_clause(
    spark, sf_dir, tmp_path, capsys
):
    t = str(tmp_path / "tbl")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    M.commit(o.filter(F.col("o_orderkey") % 2 == 0), t)
    rc = cli_main(
        [
            "sql",
            "--manifest-table",
            f"tgt={t}",
            """MERGE INTO tgt USING (
                 SELECT o_orderkey, o_totalprice * 2.0 AS o_totalprice,
                        o_orderkey % 10 = 0 AS is_del
                 FROM orders WHERE o_orderkey % 5 = 0
               ) AS s
               ON tgt.o_orderkey = s.o_orderkey
               WHEN MATCHED THEN UPDATE SET *
               WHEN NOT MATCHED THEN INSERT *
               WHEN MATCHED AND s.is_del THEN DELETE""",
        ]
    )
    assert rc == 0
    assert "tgt -> v2 (merge)" in capsys.readouterr().out
    got = M.read_version(spark, t)
    # surviving keys: (even ∪ %5) minus %10
    exp = o.filter(
        ((F.col("o_orderkey") % 2 == 0) | (F.col("o_orderkey") % 5 == 0))
        & ~(F.col("o_orderkey") % 10 == 0)
    )
    assert got.count() == exp.count()
    # a matched-and-updated key carries the doubled price
    k = (
        o.filter(
            (F.col("o_orderkey") % 10 != 0)
            & (F.col("o_orderkey") % 2 == 0)
            & (F.col("o_orderkey") % 5 == 0)
        )
        .agg(F.min("o_orderkey"))
        .first()[0]
    )
    if k is not None:
        before = o.filter(F.col("o_orderkey") == k).first()["o_totalprice"]
        assert (
            got.filter(F.col("o_orderkey") == k).first()["o_totalprice"]
            == before * 2.0
        )


def test_cli_sql_merge_txn_replay_is_noop(spark, sf_dir, tmp_path, capsys):
    t = str(tmp_path / "tbl")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    M.commit(o.limit(50), t)
    stmt = (
        "MERGE INTO tgt USING "
        "(SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice "
        "FROM orders WHERE o_orderkey % 7 = 0) AS s "
        "ON tgt.o_orderkey = s.o_orderkey"
    )
    args = ["sql", "--manifest-table", f"tgt={t}", "--txn", "app1:5", stmt]
    assert cli_main(args) == 0
    assert "v2 (merge)" in capsys.readouterr().out
    # identical replay (crash-recovery re-run): NO new version
    assert cli_main(args) == 0
    assert "v2 (merge)" in capsys.readouterr().out
    assert M.latest_version(t) == 2


def test_cli_sql_merge_conflict_abort_exit_3(
    spark, sf_dir, tmp_path, capsys
):
    t, o = _make_table(spark, sf_dir, tmp_path)
    real_publish = M._publish

    def racing_publish(table_dir, build):
        M._publish = real_publish
        M.commit(o.limit(3), t)  # interleaved commit moves the tip
        return real_publish(table_dir, build)

    M._publish = racing_publish
    try:
        rc = cli_main(
            [
                "sql",
                "--manifest-table",
                f"tgt={t}",
                "MERGE INTO tgt USING "
                "(SELECT o_orderkey, 'X' AS o_orderstatus, "
                "o_totalprice FROM orders WHERE o_orderkey % 11 = 0) AS s "
                "ON tgt.o_orderkey = s.o_orderkey",
            ]
        )
    finally:
        M._publish = real_publish
    assert rc == 3  # conflict-abort, loud and re-runnable
    assert "conflict" in capsys.readouterr().err
    assert M.latest_version(t) == 2  # only the interleaved append landed


# ------------------------------------------------------- guard rails


def test_cli_dml_rejects_version_pinned_view(spark, sf_dir, tmp_path, capsys):
    t, _ = _make_table(spark, sf_dir, tmp_path)
    rc = cli_main(
        [
            "sql",
            "--manifest-table",
            f"tgt={t}@1",
            "DELETE FROM tgt WHERE o_orderstatus = 'F'",
        ]
    )
    assert rc == 2
    assert "not a registered manifest table" in capsys.readouterr().err
    assert M.latest_version(t) == 1  # nothing published


def test_cli_dml_error_messages(spark, sf_dir, tmp_path, capsys):
    t, _ = _make_table(spark, sf_dir, tmp_path)
    mt = ["sql", "--manifest-table", f"tgt={t}"]
    # unconditional forms are rejected (whole-table rewrite by accident)
    assert cli_main(mt + ["DELETE FROM tgt"]) == 2
    assert "malformed DELETE" in capsys.readouterr().err
    assert cli_main(mt + ["UPDATE tgt SET o_totalprice = 0.0"]) == 2
    assert "WHERE clause" in capsys.readouterr().err
    # MERGE column-level SET lists point at UPDATE
    assert (
        cli_main(
            mt
            + [
                "MERGE INTO tgt USING orders AS s "
                "ON tgt.o_orderkey = s.o_orderkey "
                "WHEN MATCHED THEN UPDATE SET o_totalprice = 0.0"
            ]
        )
        == 2
    )
    assert "unsupported MERGE clause" in capsys.readouterr().err
    assert M.latest_version(t) == 1


def test_execute_dml_merge_view_source_and_alias_checks(
    spark, sf_dir, tmp_path
):
    t = str(tmp_path / "tbl")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    M.commit(o.limit(20), t)
    o.filter(F.col("o_orderkey") % 13 == 0).createOrReplaceTempView(
        "sqldml_src_view"
    )
    res = execute_dml(
        spark,
        "MERGE INTO tgt AS tg USING sqldml_src_view AS s "
        "ON tg.o_orderkey = s.o_orderkey",
        {"tgt": t},
    )
    assert res == {"op": "merge", "table": "tgt", "version": 2}
    # differing key names on the two sides are rejected, not guessed
    with pytest.raises(SqlDmlError, match="same column name"):
        execute_dml(
            spark,
            "MERGE INTO tgt AS tg USING sqldml_src_view AS s "
            "ON tg.o_orderkey = s.o_totalprice",
            {"tgt": t},
        )


def test_cli_sql_merge_evolve_schema_flag(spark, sf_dir, tmp_path, capsys):
    t = str(tmp_path / "tbl")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    M.commit(o.limit(40), t)
    stmt = (
        "MERGE INTO tgt USING "
        "(SELECT o_orderkey, o_totalprice, 'web' AS channel "
        "FROM orders WHERE o_orderkey % 9 = 0) AS s "
        "ON tgt.o_orderkey = s.o_orderkey"
    )
    # without the flag: loud abort, nothing published
    assert cli_main(["sql", "--manifest-table", f"tgt={t}", stmt]) != 0
    assert "evolve_schema" in capsys.readouterr().err
    assert M.latest_version(t) == 1
    # with the flag: the table widens
    assert (
        cli_main(
            ["sql", "--manifest-table", f"tgt={t}", "--evolve-schema", stmt]
        )
        == 0
    )
    capsys.readouterr()
    got = M.read_version(spark, t)
    assert "channel" in got.columns
    assert got.filter(F.col("channel") == "web").count() > 0


def test_cli_sql_alter_constraint_lifecycle(spark, sf_dir, tmp_path, capsys):
    t, o = _make_table(spark, sf_dir, tmp_path)
    mt = ["sql", "--manifest-table", f"tgt={t}"]
    assert (
        cli_main(
            mt
            + ["ALTER TABLE tgt ADD CONSTRAINT price_pos "
               "CHECK (o_totalprice > 0)"]
        )
        == 0
    )
    assert "v2 (add_constraint)" in capsys.readouterr().out
    assert M.table_constraints(t) == {"price_pos": "o_totalprice > 0"}
    # a violating UPDATE through the SQL surface now aborts, exit 2
    assert (
        cli_main(
            mt
            + ["UPDATE tgt SET o_totalprice = -1.0 "
               "WHERE o_orderstatus = 'F'"]
        )
        == 2
    )
    assert "price_pos" in capsys.readouterr().err
    assert M.latest_version(t) == 2
    assert cli_main(mt + ["ALTER TABLE tgt DROP CONSTRAINT price_pos"]) == 0
    capsys.readouterr()
    assert M.table_constraints(t) == {}
    # malformed ALTER: loud subset message
    assert cli_main(mt + ["ALTER TABLE tgt RENAME TO other"]) == 2
    assert "malformed ALTER" in capsys.readouterr().err


def test_update_set_preserves_column_type(spark, sf_dir, tmp_path):
    """SQL UPDATE assignment-casts the SET expression to the column's
    existing type: a `-1.0` literal (DECIMAL(1,1) under ANSI parsing)
    must not silently flip the rewritten dir's physical type."""
    t, o = _make_table(spark, sf_dir, tmp_path)
    execute_dml(
        spark,
        "UPDATE tgt SET o_totalprice = -1.0 WHERE o_orderstatus = 'F'",
        {"tgt": t},
    )
    got = M.read_version(spark, t)
    assert dict(got.dtypes)["o_totalprice"] == "double"
    assert (
        got.filter(F.col("o_orderstatus") == "F")
        .agg(F.max("o_totalprice"))
        .first()[0]
        == -1.0
    )
    assert got.count() == o.count()
