"""Warehouse catalog (operators/catalog.py + the sqldml DDL subset):
name→dir resolution published with the manifest log's link-CAS
protocol — create / CTAS / DML by name / SHOW / DROP-refuses-with-data
/ DROP PURGE, plus the concurrent-CREATE race."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from finance_etl_pipeline_spark.cli import main as cli_main
from finance_etl_pipeline_spark.operators import catalog as C
from finance_etl_pipeline_spark.operators import manifest as M
from finance_etl_pipeline_spark.operators.sqldml import (
    execute_ddl,
    execute_dml,
    is_ddl,
)


def test_create_resolve_show_drop(spark, tmp_path):
    root = str(tmp_path / "wh")
    d = C.create_table(root, "t1")
    assert d == os.path.join(root, "t1")
    assert C.resolve(root, "t1") == d
    with pytest.raises(C.TableExistsError):
        C.create_table(root, "t1")
    ext = str(tmp_path / "elsewhere" / "tbl")
    C.create_table(root, "t2", location=ext)
    rows = C.show_tables(root)
    assert [(r["name"], r["managed"]) for r in rows] == [
        ("t1", True),
        ("t2", False),
    ]
    C.drop_table(root, "t1")  # no data: plain drop fine
    C.drop_table(root, "t2")
    assert C.show_tables(root) == []
    with pytest.raises(C.CatalogError):
        C.resolve(root, "t1")


def test_ctas_dml_by_name_and_drop_purge(spark, tmp_path):
    root = str(tmp_path / "wh")
    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "id int, amt double"
    )
    df.createOrReplaceTempView("ctas_src")
    res = execute_ddl(
        spark, "CREATE TABLE fact AS SELECT * FROM ctas_src", root
    )
    assert res["op"] == "create_table_as" and res["version"] == 1
    tdir = C.resolve(root, "fact")
    assert M.count_rows(tdir) == 3

    # DML by NAME: the catalog supplies the dir map
    out = execute_dml(
        spark,
        "UPDATE fact SET amt = amt * 10 WHERE id <= 2",
        {r["name"]: r["dir"] for r in C.show_tables(root)},
    )
    assert out["version"] == 2
    got = {
        (r.id, r.amt) for r in M.read_version(spark, tdir).collect()
    }
    assert got == {(1, 100.0), (2, 200.0), (3, 30.0)}

    # a managed table holding data refuses a plain DROP
    with pytest.raises(C.CatalogError, match="PURGE"):
        C.drop_table(root, "fact")
    assert C.resolve(root, "fact") == tdir  # refusal published nothing
    C.drop_table(root, "fact", purge=True)
    assert not os.path.exists(tdir)
    assert C.show_tables(root) == []


def test_drop_external_never_deletes_data(spark, tmp_path):
    root = str(tmp_path / "wh")
    ext = str(tmp_path / "ext_tbl")
    M.commit(spark.createDataFrame([(1,)], "id int"), ext)
    C.create_table(root, "ext", location=ext)
    C.drop_table(root, "ext", purge=True)  # purge is a no-op here
    assert M.latest_version(ext) == 1  # data intact


def test_ctas_partitioned(spark, tmp_path):
    root = str(tmp_path / "wh")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], "id int, grp string"
    ).createOrReplaceTempView("psrc")
    execute_ddl(
        spark,
        "CREATE TABLE pt PARTITIONED BY (grp) AS SELECT * FROM psrc",
        root,
    )
    tdir = C.resolve(root, "pt")
    pruned = M.read_version(spark, tdir, where=[("grp", "==", "a")])
    assert sorted(r.id for r in pruned.collect()) == [1, 3]


def test_failed_ctas_rolls_back_the_name(spark, tmp_path):
    root = str(tmp_path / "wh")

    class Boom(RuntimeError):
        pass

    class FakeDF:
        def __getattr__(self, _):
            raise Boom("no data for you")

    with pytest.raises(Exception):
        C.create_table_as(spark, root, "ghost", FakeDF())
    assert C.show_tables(root) == []  # claim rolled back: retryable
    C.create_table(root, "ghost")  # and the name is free again


def test_concurrent_create_race(spark, tmp_path):
    """Two writers racing on version N+1: the loser recomposes against
    the winner — same-name CREATE aborts, distinct names both land."""
    root = str(tmp_path / "wh")
    orig = C._publish

    def racing(r, build, _armed=[True]):
        if _armed[0]:
            _armed[0] = False
            C.create_table(r, "raced")  # the winner lands first
        return orig(r, build)

    C._publish = racing
    try:
        with pytest.raises(C.TableExistsError):
            C.create_table(root, "raced")
    finally:
        C._publish = orig

    # distinct names: both land via retry
    orig2 = C._publish
    armed = [True]

    def racing2(r, build):
        if armed[0]:
            armed[0] = False
            C.create_table(r, "other")
        return orig2(r, build)

    C._publish = racing2
    try:
        C.create_table(root, "mine")
    finally:
        C._publish = orig2
    names = [r["name"] for r in C.show_tables(root)]
    assert names == ["mine", "other", "raced"]


def test_ddl_statement_validation(spark, tmp_path):
    root = str(tmp_path / "wh")
    from finance_etl_pipeline_spark.operators.sqldml import SqlDmlError

    assert is_ddl("CREATE TABLE x") and is_ddl("show tables")
    assert not is_ddl("SELECT 1")
    with pytest.raises(SqlDmlError, match="SHOW TABLES"):
        execute_ddl(spark, "SHOW PARTITIONS x", root)
    with pytest.raises(SqlDmlError, match="pick one"):
        execute_ddl(
            spark,
            "CREATE TABLE x LOCATION '/tmp/x' AS SELECT 1",
            root,
        )
    with pytest.raises(SqlDmlError, match="PARTITIONED"):
        execute_ddl(spark, "CREATE TABLE x PARTITIONED BY (a)", root)
    with pytest.raises(C.CatalogError, match="invalid"):
        execute_ddl(spark, "CREATE TABLE 1bad", root)


def test_cli_warehouse_end_to_end(spark, tmp_path, capsys):
    root = str(tmp_path / "wh")
    sf = "/root/testdata/sf0.001"
    rc = cli_main(
        [
            "sql",
            "CREATE TABLE big_orders AS SELECT o_orderkey, "
            "o_totalprice FROM orders WHERE o_totalprice > 100000",
            "--sf-dir",
            sf,
            "--warehouse",
            root,
        ]
    )
    assert rc == 0
    rc = cli_main(
        ["sql", "SHOW TABLES", "--sf-dir", sf, "--warehouse", root]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "big_orders" in out and "managed" in out
    # DML by catalog name through the CLI
    rc = cli_main(
        [
            "sql",
            "DELETE FROM big_orders WHERE o_totalprice <= 200000",
            "--sf-dir",
            sf,
            "--warehouse",
            root,
        ]
    )
    assert rc == 0
    # read back by name (temp view via the catalog)
    rc = cli_main(
        [
            "sql",
            "SELECT count(*) AS n FROM big_orders "
            "WHERE o_totalprice <= 200000",
            "--sf-dir",
            sf,
            "--warehouse",
            root,
        ]
    )
    assert rc == 0
    assert "| 0 " in capsys.readouterr().out.replace("|0", "| 0")
    # table maintenance by name
    rc = cli_main(
        ["table", "history", "big_orders", "--warehouse", root]
    )
    assert rc == 0
    # plain DROP refuses (exit 2), PURGE lands
    rc = cli_main(
        ["sql", "DROP TABLE big_orders", "--sf-dir", sf,
         "--warehouse", root]
    )
    assert rc == 2
    rc = cli_main(
        ["sql", "DROP TABLE big_orders PURGE", "--sf-dir", sf,
         "--warehouse", root]
    )
    assert rc == 0
    assert C.show_tables(root) == []


# --------------------------------------- r10: utility SQL verbs


def test_insert_into_by_name(spark, tmp_path):
    root = str(tmp_path / "wh")
    execute_ddl(
        spark,
        "CREATE TABLE inv AS SELECT CAST(1 AS INT) AS id, 'a' AS tag",
        root,
    )
    names = {r["name"]: r["dir"] for r in C.show_tables(root)}
    # bare VALUES map positionally onto the table schema
    res = execute_dml(
        spark, "INSERT INTO inv VALUES (2, 'b')", names
    )
    assert res["op"] == "insert_append" and res["version"] == 2
    tdir = C.resolve(root, "inv")
    # a NAMED source in a different column order matches by name
    spark.createDataFrame(
        [("c", 3)], "tag string, id int"
    ).createOrReplaceTempView("ins_src")
    execute_dml(spark, "INSERT INTO inv SELECT * FROM ins_src", names)
    got = sorted(
        (r.id, r.tag) for r in M.read_version(spark, tdir).collect()
    )
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    # unknown extra column aborts loudly
    spark.createDataFrame(
        [(9, "z", 1.0)], "id int, tag string, ghost double"
    ).createOrReplaceTempView("ins_bad")
    from finance_etl_pipeline_spark.operators.sqldml import SqlDmlError

    with pytest.raises(SqlDmlError, match="ghost"):
        execute_dml(spark, "INSERT INTO inv SELECT * FROM ins_bad", names)
    # OVERWRITE replaces
    res = execute_dml(
        spark, "INSERT OVERWRITE inv SELECT CAST(7 AS INT) AS id, "
        "'x' AS tag", names
    )
    assert res["op"] == "insert_overwrite"
    assert M.count_rows(tdir) == 1


def test_insert_inherits_partition_layout(spark, tmp_path):
    root = str(tmp_path / "wh")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id int, grp string"
    ).createOrReplaceTempView("part_src")
    execute_ddl(
        spark,
        "CREATE TABLE pt2 PARTITIONED BY (grp) AS "
        "SELECT * FROM part_src",
        root,
    )
    names = {r["name"]: r["dir"] for r in C.show_tables(root)}
    execute_dml(spark, "INSERT INTO pt2 VALUES (3, 'a')", names)
    tdir = C.resolve(root, "pt2")
    m = M._read_manifest(tdir, M.latest_version(tdir))
    assert set(m["partitioned_dirs"]) == set(m["dirs"])  # inherited
    pruned = M.read_version(spark, tdir, where=[("grp", "==", "a")])
    assert sorted(r.id for r in pruned.collect()) == [1, 3]


def test_optimize_vacuum_describe_by_name(spark, tmp_path):
    root = str(tmp_path / "wh")
    spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "id int, amt double"
    ).createOrReplaceTempView("ov_src")
    execute_ddl(spark, "CREATE TABLE ov AS SELECT * FROM ov_src", root)
    names = {r["name"]: r["dir"] for r in C.show_tables(root)}
    for _ in range(2):
        execute_dml(spark, "INSERT INTO ov SELECT * FROM ov_src", names)
    tdir = C.resolve(root, "ov")
    res = execute_dml(spark, "OPTIMIZE ov", names)
    assert res["op"] == "optimize" and res["version"] == 4
    m = M._read_manifest(tdir, 4)
    assert len(m["dirs"]) == 1  # compacted
    res = execute_dml(
        spark, "VACUUM ov RETAIN 0 HOURS KEEP LAST 1", names
    )
    assert res["op"] == "vacuum" and res["removed"] >= 3
    res = execute_dml(spark, "DESCRIBE HISTORY ov", names)
    assert [r["version"] for r in res["rows"]] == [4]
    assert res["rows"][0]["mode"] in ("compact", "overwrite")
    assert M.count_rows(tdir) == 60


def test_insert_txn_idempotent(spark, tmp_path):
    root = str(tmp_path / "wh")
    execute_ddl(spark, "CREATE TABLE tx1", root)
    names = {r["name"]: r["dir"] for r in C.show_tables(root)}
    execute_dml(
        spark, "INSERT INTO tx1 VALUES (1)", names, txn=("job", 5)
    )
    # replay with the same stamp is a no-op
    execute_dml(
        spark, "INSERT INTO tx1 VALUES (1)", names, txn=("job", 5)
    )
    tdir = C.resolve(root, "tx1")
    assert M.count_rows(tdir) == 1


def test_rename_table(spark, tmp_path):
    root = str(tmp_path / "wh")
    spark.createDataFrame([(1,)], "id int").createOrReplaceTempView(
        "rn_src"
    )
    execute_ddl(spark, "CREATE TABLE before AS SELECT * FROM rn_src", root)
    old_dir = C.resolve(root, "before")
    res = execute_ddl(spark, "ALTER TABLE before RENAME TO after", root)
    assert res["op"] == "rename_table" and res["dir"] == old_dir
    with pytest.raises(C.CatalogError):
        C.resolve(root, "before")
    assert C.resolve(root, "after") == old_dir  # dir untouched
    # DML by the NEW name works; renaming onto a taken name refuses
    names = {r["name"]: r["dir"] for r in C.show_tables(root)}
    execute_dml(spark, "INSERT INTO after VALUES (2)", names)
    assert M.count_rows(old_dir) == 2
    C.create_table(root, "squatter")
    with pytest.raises(C.TableExistsError):
        C.rename_table(root, "after", "squatter")
    with pytest.raises(C.CatalogError, match="invalid"):
        C.rename_table(root, "after", "9bad")
    # the renamed managed table still PURGEs its (old-named) dir
    C.drop_table(root, "after", purge=True)
    assert not os.path.exists(old_dir)


def test_catalog_model_fuzz(spark, tmp_path):
    """Random create/rename/drop sequences against a dict model, with
    an adversarial interleaved writer racing every 3rd publish — the
    catalog must match the model exactly after every op (link-CAS
    recompose, never a lost update)."""
    import random

    root = str(tmp_path / "wh")
    rng = random.Random(42)
    model: dict[str, str] = {}  # name -> stored dir
    orig = C._publish
    counter = {"n": 0, "extra": 0}

    def racing(r, build):
        counter["n"] += 1
        if counter["n"] % 3 == 0:
            nm = f"racer_{counter['extra']}"
            counter["extra"] += 1
            orig(
                r,
                lambda tables, views: (
                    {**tables, nm: {"dir": nm, "created_ts": 0.0}},
                    views,
                    f"race {nm}",
                ),
            )
            model[nm] = nm
        return orig(r, build)

    C._publish = racing
    try:
        for step in range(60):
            op = rng.choice(["create", "rename", "drop", "create_ext"])
            if op == "create":
                nm = f"t{rng.randint(0, 20)}"
                if nm in model:
                    with pytest.raises(C.TableExistsError):
                        C.create_table(root, nm)
                else:
                    C.create_table(root, nm)
                    model[nm] = nm
            elif op == "create_ext":
                nm = f"e{rng.randint(0, 20)}"
                loc = str(tmp_path / "ext" / nm)
                if nm in model:
                    with pytest.raises(C.TableExistsError):
                        C.create_table(root, nm, location=loc)
                else:
                    C.create_table(root, nm, location=loc)
                    model[nm] = os.path.abspath(loc)
            elif op == "rename" and model:
                old_n = rng.choice(sorted(model))
                new_n = f"t{rng.randint(0, 20)}"
                if new_n in model:
                    with pytest.raises(C.TableExistsError):
                        C.rename_table(root, old_n, new_n)
                else:
                    C.rename_table(root, old_n, new_n)
                    model[new_n] = model.pop(old_n)
            elif op == "drop" and model:
                nm = rng.choice(sorted(model))
                C.drop_table(root, nm)  # none hold data
                del model[nm]
            got = {
                r["name"]: r["dir"] for r in C.show_tables(root)
            }
            want = {n: C._to_abs(root, d) for n, d in model.items()}
            assert got == want, f"step {step} op {op}"
    finally:
        C._publish = orig


# ----------------------------------------- r10 self-review regressions


def test_reserved_underscore_names_refused(spark, tmp_path):
    root = str(tmp_path / "wh")
    with pytest.raises(C.CatalogError, match="reserved"):
        C.create_table(root, "_catalog")
    with pytest.raises(C.CatalogError, match="reserved"):
        C.create_table(root, "_anything")
    C.create_table(root, "ok")
    with pytest.raises(C.CatalogError, match="reserved"):
        C.rename_table(root, "ok", "_catalog")


def test_plain_spark_describe_still_works(spark, capsys):
    """DESCRIBE <view> is plain Spark SQL, not our DESCRIBE HISTORY —
    it must reach spark.sql, not die in the DML parser."""
    rc = cli_main(
        ["sql", "DESCRIBE orders", "--sf-dir", "/root/testdata/sf0.001"]
    )
    assert rc == 0
    assert "o_orderkey" in capsys.readouterr().out


def test_ctas_from_cataloged_table(spark, tmp_path, capsys):
    """CTAS selecting FROM another cataloged table: the views register
    before DDL routing, and analysis errors exit 2, not traceback."""
    root = str(tmp_path / "wh")
    sf = "/root/testdata/sf0.001"
    rc = cli_main(
        [
            "sql",
            "CREATE TABLE base_t AS SELECT o_orderkey FROM orders "
            "WHERE o_orderkey <= 100",
            "--sf-dir", sf, "--warehouse", root,
        ]
    )
    assert rc == 0
    rc = cli_main(
        [
            "sql",
            "CREATE TABLE derived_t AS SELECT * FROM base_t "
            "WHERE o_orderkey <= 50",
            "--sf-dir", sf, "--warehouse", root,
        ]
    )
    assert rc == 0
    assert M.count_rows(C.resolve(root, "derived_t")) is not None
    # an unknown view in the CTAS is a clean exit-2, not a traceback
    rc = cli_main(
        [
            "sql",
            "CREATE TABLE bad_t AS SELECT * FROM no_such_view",
            "--sf-dir", sf, "--warehouse", root,
        ]
    )
    assert rc == 2
    with pytest.raises(C.CatalogError):
        C.resolve(root, "bad_t")  # CTAS claim rolled back
