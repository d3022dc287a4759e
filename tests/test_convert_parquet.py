"""CONVERT TO MANIFEST (``manifest.convert_parquet``): in-place
adoption of an existing parquet directory — flat or hive-partitioned,
foreign writers, arbitrary file names — with the foreign-stats honesty
contract: skipping works, exact metadata min/max declines until a
first-party rewrite, and the user's source bytes are never deleted."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

from finance_etl_pipeline_spark.operators import manifest as M
from finance_etl_pipeline_spark.operators.sqldml import (
    try_metadata_select,
)


@pytest.fixture()
def foreign_src(tmp_path):
    """A pyarrow-written (foreign) hive dir with non-part-* names."""
    src = str(tmp_path / "src")
    for p in ("a", "b"):
        os.makedirs(f"{src}/cat={p}")
        pq.write_table(
            pa.table(
                {
                    "k": list(range(5)),
                    "x": [1.5 * i for i in range(5)],
                }
            ),
            f"{src}/cat={p}/data_0.parquet",
        )
    return src


def test_adopt_read_and_prune(spark, tmp_path, foreign_src):
    t = str(tmp_path / "tbl")
    v = M.convert_parquet(spark, foreign_src, t)
    assert v == 1
    df = M.read_version(spark, t)
    assert df.count() == 10
    assert sorted(r["cat"] for r in df.select("cat").distinct().collect()) == ["a", "b"]
    # partition pruning over path-derived identities
    assert (
        M.read_version(spark, t, where=[("cat", "==", "a")]).count()
        == 5
    )
    assert (
        len(M.files_for_version(t, where=[("cat", "==", "a")])) == 1
    )
    # zero-copy: the source files are the table's files
    assert all(
        f.startswith(os.path.realpath(foreign_src))
        for f in M.files_for_version(t)
    )


def test_foreign_stats_honesty(spark, tmp_path, foreign_src):
    t = str(tmp_path / "tbl")
    M.convert_parquet(spark, foreign_src, t)
    # counts + partition shapes serve from metadata
    md = try_metadata_select(
        spark,
        "SELECT cat, count(*) AS n, count(k) AS nk FROM t "
        "WHERE cat = 'a' GROUP BY cat",
        {"t": t},
    )
    assert md is not None
    assert md.collect()[0].asDict() == {"cat": "a", "n": 5, "nk": 5}
    # exact min/max declines on foreign footers (possible truncation)
    assert (
        try_metadata_select(spark, "SELECT max(x) FROM t", {"t": t})
        is None
    )
    assert M.describe_detail(t)["foreign_stats_dirs"] == 1


def test_first_party_rewrite_reenables_minmax(
    spark, tmp_path, foreign_src
):
    """OPTIMIZE rewrites the adopted files through this engine's own
    writer — the foreign marker drops (carry intersects the live dir
    set) and exact metadata min/max serves again; the user's source
    files are untouched throughout."""
    t = str(tmp_path / "tbl")
    M.convert_parquet(spark, foreign_src, t)
    M.compact_table(spark, t)
    m = M._read_manifest(t, M.latest_version(t))
    assert "foreign_stats_dirs" not in m
    md = try_metadata_select(
        spark, "SELECT max(x) AS mx, count(*) AS n FROM t", {"t": t}
    )
    assert md is not None
    assert md.collect()[0].asDict() == {"mx": 6.0, "n": 10}
    # zero-copy promise kept: source bytes still on disk
    assert (
        len(glob.glob(os.path.join(foreign_src, "**", "*.parquet"),
                      recursive=True))
        == 2
    )
    # and vacuum of the table never reaches the external source
    M.vacuum(t, keep_last=1, retention_seconds=0.0)
    assert (
        len(glob.glob(os.path.join(foreign_src, "**", "*.parquet"),
                      recursive=True))
        == 2
    )


def test_append_and_dml_after_convert(spark, tmp_path, foreign_src):
    t = str(tmp_path / "tbl")
    M.convert_parquet(spark, foreign_src, t)
    M.commit(
        spark.createDataFrame(
            [(99, 0.25, "c")], "k long, x double, cat string"
        ),
        t,
        mode="append",
    )
    assert M.read_version(spark, t).count() == 11
    M.delete_where(t, [("k", "==", 0)])  # one per adopted partition
    assert M.read_version(spark, t).count() == 9
    # the foreign marker survives appends (adopted dir still live)
    m = M._read_manifest(t, M.latest_version(t))
    assert m.get("foreign_stats_dirs")


def test_errors(spark, tmp_path, foreign_src):
    t = str(tmp_path / "tbl")
    with pytest.raises(ValueError, match="not a directory"):
        M.convert_parquet(spark, str(tmp_path / "missing"), t)
    os_empty = tmp_path / "empty"
    os_empty.mkdir()
    with pytest.raises(ValueError, match="no parquet files"):
        M.convert_parquet(spark, str(os_empty), t)
    M.convert_parquet(spark, foreign_src, t)
    with pytest.raises(ValueError, match="already has versions"):
        M.convert_parquet(spark, foreign_src, t)
    # mixed layouts refuse
    mixed = str(tmp_path / "mixed")
    os.makedirs(f"{mixed}/cat=a")
    pq.write_table(pa.table({"k": [1]}), f"{mixed}/cat=a/f.parquet")
    pq.write_table(pa.table({"k": [2]}), f"{mixed}/flat.parquet")
    with pytest.raises(ValueError, match="inconsistent partition"):
        M.convert_parquet(spark, mixed, str(tmp_path / "t2"))
    # partition column duplicated inside the data files
    dup = str(tmp_path / "dup")
    os.makedirs(f"{dup}/cat=a")
    pq.write_table(
        pa.table({"k": [1], "cat": ["a"]}), f"{dup}/cat=a/f.parquet"
    )
    with pytest.raises(ValueError, match="also present"):
        M.convert_parquet(spark, dup, str(tmp_path / "t3"))
    # nesting refused
    with pytest.raises(ValueError, match="must not nest"):
        M.convert_parquet(
            spark, foreign_src, os.path.join(foreign_src, "tbl")
        )


def test_cli_convert(spark, tmp_path, foreign_src, capsys):
    from finance_etl_pipeline_spark.cli import main as cli_main

    t = str(tmp_path / "tbl")
    rc = cli_main(["table", "convert", foreign_src, "--into", t])
    assert rc == 0
    out = capsys.readouterr().out
    assert "zero bytes copied" in out and "2 file(s)" in out
    assert M.latest_version(t) == 1


# ------------------------------------------------- review-pass fixes


def test_clone_carries_foreign_marker(spark, tmp_path, foreign_src):
    t = str(tmp_path / "tbl")
    M.convert_parquet(spark, foreign_src, t)
    c = str(tmp_path / "clone")
    M.clone_table(t, c)
    # the clone references the same foreign files: min/max declines
    assert (
        try_metadata_select(spark, "SELECT max(x) FROM t", {"t": c})
        is None
    )
    md = try_metadata_select(
        spark, "SELECT count(*) AS n FROM t", {"t": c}
    )
    assert md is not None and md.collect()[0]["n"] == 10


def test_restore_carries_foreign_marker(spark, tmp_path, foreign_src):
    """v1 convert (marker), v2 OPTIMIZE (first-party, marker drops),
    restore to v1 -> the restored tip must decline again."""
    t = str(tmp_path / "tbl")
    M.convert_parquet(spark, foreign_src, t)
    M.compact_table(spark, t)
    assert (
        try_metadata_select(spark, "SELECT max(x) FROM t", {"t": t})
        is not None
    )
    M.restore_table(t, version=1)
    assert (
        try_metadata_select(spark, "SELECT max(x) FROM t", {"t": t})
        is None
    )
    md = try_metadata_select(
        spark, "SELECT count(*) AS n FROM t", {"t": t}
    )
    assert md is not None and md.collect()[0]["n"] == 10


def test_hidden_paths_excluded(spark, tmp_path, foreign_src):
    """_temporary task-attempt leftovers and _-prefixed files are
    ignored, matching Spark's own listing — adopting them would
    double-count aborted writes."""
    leftover = os.path.join(
        foreign_src, "_temporary", "0", "cat=a"
    )
    os.makedirs(leftover)
    pq.write_table(
        pa.table({"k": [999], "x": [0.0]}),
        os.path.join(leftover, "part-0.parquet"),
    )
    pq.write_table(
        pa.table({"k": [998], "x": [0.0]}),
        os.path.join(foreign_src, "cat=a", "_committing.parquet"),
    )
    t = str(tmp_path / "tbl")
    M.convert_parquet(spark, foreign_src, t)
    df = M.read_version(spark, t)
    assert df.count() == 10  # neither leftover adopted
    assert df.filter(F.col("k") > 900).count() == 0


def test_convert_from_another_tables_data_dir(spark, tmp_path):
    """Adopting a dir inside another manifest table's data root
    registers at the owner like a clone, so the owner's vacuum keeps
    the referenced files alive."""
    owner = str(tmp_path / "owner")
    M.commit(
        spark.createDataFrame([(1, 2.0), (2, 4.0)], "k long, x double")
        .coalesce(1),
        owner,
    )
    data_dir = os.path.dirname(M.files_for_version(owner)[0])
    t = str(tmp_path / "derived")
    M.convert_parquet(spark, data_dir, t)
    assert M.read_version(spark, t).count() == 2
    # owner rewrites + vacuums: the adopted files must survive
    M.commit(
        spark.createDataFrame([(3, 6.0)], "k long, x double"),
        owner,
        mode="overwrite",
    )
    M.vacuum(owner, keep_last=1, retention_seconds=0.0)
    assert M.read_version(spark, t).count() == 2, (
        "owner vacuum deleted files a converted table references"
    )


def test_cli_warehouse_rollback_on_failure(spark, tmp_path, capsys):
    from finance_etl_pipeline_spark.cli import main as cli_main
    from finance_etl_pipeline_spark.operators import catalog as C

    wh = str(tmp_path / "wh")
    empty = tmp_path / "empty"
    empty.mkdir()
    rc = cli_main(
        ["table", "convert", str(empty), "--into", "sales",
         "--warehouse", wh]
    )
    assert rc == 2
    # the transient registration was rolled back
    assert [r["name"] for r in C.show_tables(wh)] == []


def test_sql_convert_verb(spark, tmp_path, foreign_src):
    from finance_etl_pipeline_spark.operators.sqldml import (
        SqlDmlError,
        execute_dml,
        is_dml,
    )

    t = str(tmp_path / "tbl")
    stmt = f"CONVERT TO MANIFEST '{foreign_src}' AS t"
    assert is_dml(stmt)
    res = execute_dml(spark, stmt, {"t": t})
    assert res == {"op": "convert", "table": "t", "version": 1}
    assert M.read_version(spark, t).count() == 10
    with pytest.raises(ValueError, match="already has versions"):
        execute_dml(spark, stmt, {"t": t})
    with pytest.raises(SqlDmlError, match="malformed CONVERT"):
        execute_dml(spark, "CONVERT t TO parquet", {"t": t})
