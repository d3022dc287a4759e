"""Column mapping: RENAME / DROP COLUMN as metadata-only versions
(data files keep their physical names — the Delta columnMapping /
Iceberg field-id pattern reduced to its core).  Covers time travel,
stats skipping on renamed columns, every DML path over a mapped
table, dropped-column non-resurrection, the SQL ALTER surface, the
DataSource read path, streaming, clone, and OPTIMIZE's mapping
purge."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from finance_etl_pipeline_spark.operators import manifest as M
from finance_etl_pipeline_spark.operators.sqldml import execute_dml


def _base(spark, t, rows=((1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c"))):
    df = spark.createDataFrame(
        list(rows), "id int, amt double, tag string"
    )
    M.commit(df.repartition(2), t)
    return df


def test_rename_is_metadata_only_and_time_travels(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _base(spark, t)
    files_before = sorted(M.files_for_version(t, 1))
    v = M.rename_column(t, "amt", "price")
    assert v == 2
    # zero data movement: the new version references the same files
    assert sorted(M.files_for_version(t, 2)) == files_before
    assert M.table_column_mapping(t) == {"price": "amt"}
    assert M.read_version(spark, t).columns == ["id", "price", "tag"]
    # time travel shows the old name
    assert M.read_version(spark, t, 1).columns == ["id", "amt", "tag"]
    # values unchanged
    assert sorted(
        (r.id, r.price) for r in M.read_version(spark, t).collect()
    ) == [(1, 10.0), (2, 20.0), (3, 30.0)]


def test_rename_validation(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _base(spark, t)
    with pytest.raises(ValueError, match="no column"):
        M.rename_column(t, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        M.rename_column(t, "amt", "tag")
    M.add_constraint(spark, t, "amt_pos", "amt > 0")
    with pytest.raises(ValueError, match="constraint"):
        M.rename_column(t, "amt", "price")
    M.drop_constraint(t, "amt_pos")
    M.rename_column(t, "amt", "price")


def test_stats_skipping_prunes_on_renamed_column(spark, tmp_path):
    t = str(tmp_path / "tbl")
    li = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "k int, v double"
    )
    M.commit(li.repartitionByRange(4, "k"), t)
    M.rename_column(t, "k", "key")
    # pruned read over the LOGICAL name must open fewer files
    full = M.read_version(spark, t)
    pruned = M.read_version(spark, t, where=[("key", ">=", 90)])
    n_full = full.select(F.input_file_name()).distinct().count()
    n_pruned = pruned.select(F.input_file_name()).distinct().count()
    assert n_pruned < n_full
    assert sorted(r.key for r in pruned.collect()) == list(range(90, 100))


def test_dml_over_mapped_table(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _base(spark, t)
    M.rename_column(t, "amt", "price")
    # append with the new logical name
    M.commit(
        spark.createDataFrame(
            [(4, 40.0, "d")], "id int, price double, tag string"
        ),
        t,
    )
    # update / delete via logical predicates
    M.update_where(
        spark, t, [("price", ">=", 40.0)], {"price": F.col("price") + 1}
    )
    M.delete_where(t, [("price", "==", 10.0)])
    # merge
    src = spark.createDataFrame(
        [(2, 99.0, "B"), (5, 50.0, "e")], "id int, price double, tag string"
    )
    M.merge_into(spark, t, src, ["id"])
    got = sorted(
        (r.id, r.price, r.tag)
        for r in M.read_version(spark, t).collect()
    )
    assert got == [
        (2, 99.0, "B"),
        (3, 30.0, "c"),
        (4, 41.0, "d"),
        (5, 50.0, "e"),
    ]
    # constraints evaluate against logical names on mapped tables
    M.add_constraint(spark, t, "price_pos", "price > 0")
    with pytest.raises(M.ConstraintViolationError):
        M.commit(
            spark.createDataFrame(
                [(9, -1.0, "x")], "id int, price double, tag string"
            ),
            t,
        )


def test_drop_column_retires_physical_name(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _base(spark, t)
    v = M.drop_column(t, "tag")
    assert M.read_version(spark, t).columns == ["id", "amt"]
    assert M.read_version(spark, t, v - 1).columns == ["id", "amt", "tag"]
    # re-adding 'tag' must NOT resurrect the dropped bytes
    M.commit(
        spark.createDataFrame(
            [(4, 40.0, "NEW")], "id int, amt double, tag string"
        ),
        t,
    )
    got = {r.id: r.tag for r in M.read_version(spark, t).collect()}
    assert got == {1: None, 2: None, 3: None, 4: "NEW"}
    mapping = M.table_column_mapping(t)
    assert mapping["tag"] != "tag"  # fresh physical name


def test_drop_column_validation(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "x")], "id int, p string")
    M.commit(df, t, partition_by=["p"])
    with pytest.raises(ValueError, match="partition column"):
        M.drop_column(t, "p")
    M.add_constraint(spark, t, "idpos", "id > 0")
    with pytest.raises(ValueError, match="constraint"):
        M.drop_column(t, "id")


def test_sql_alter_surface(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _base(spark, t)
    out = execute_dml(
        spark, "ALTER TABLE tb RENAME COLUMN amt TO price", {"tb": t}
    )
    assert out["op"] == "rename_column"
    out = execute_dml(spark, "ALTER TABLE tb DROP COLUMN tag", {"tb": t})
    assert out["op"] == "drop_column"
    assert M.read_version(spark, t).columns == ["id", "price"]
    # logical-name DML text over the mapped table
    execute_dml(
        spark, "UPDATE tb SET price = price * 2 WHERE id = 1", {"tb": t}
    )
    got = {r.id: r.price for r in M.read_version(spark, t).collect()}
    assert got == {1: 20.0, 2: 20.0, 3: 30.0}


def test_datasource_read_and_stream_over_mapped_table(spark, tmp_path):
    from finance_etl_pipeline_spark.sources.lakestream import (
        ManifestTableDataSource,
    )

    spark.dataSource.register(ManifestTableDataSource)
    t, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ck")
    _base(spark, t)
    M.rename_column(t, "amt", "price")
    M.commit(
        spark.createDataFrame(
            [(4, 40.0, "d")], "id int, price double, tag string"
        ),
        t,
    )
    ds = spark.read.format("manifest_table").option("table_dir", t).load()
    assert ds.columns == ["id", "price", "tag"]
    assert sorted((r.id, r.price) for r in ds.collect()) == [
        (1, 10.0),
        (2, 20.0),
        (3, 30.0),
        (4, 40.0),
    ]
    # DataSource writes are refused on mapped tables (they would
    # write logical names into a physical layout)
    with pytest.raises(Exception, match="column mapping|renamed"):
        ds.limit(1).write.format("manifest_table").option(
            "table_dir", t
        ).mode("append").save()

    # streaming from a post-rename starting_version emits logical names
    q = (
        spark.readStream.format("manifest_table")
        .option("table_dir", t)
        .option("starting_version", "2")
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(got.columns) == ["id", "price", "tag"]
    assert [(r.id, r.price) for r in got.collect()] == [(4, 40.0)]


def test_clone_carries_mapping(spark, tmp_path):
    t, c = str(tmp_path / "tbl"), str(tmp_path / "clone")
    _base(spark, t)
    M.rename_column(t, "amt", "price")
    M.clone_table(t, c)
    assert M.table_column_mapping(c) == {"price": "amt"}
    assert sorted(
        (r.id, r.price) for r in M.read_version(spark, c).collect()
    ) == [(1, 10.0), (2, 20.0), (3, 30.0)]


def test_optimize_purges_mapping(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _base(spark, t)
    M.rename_column(t, "amt", "price")
    M.drop_column(t, "tag")
    M.compact_table(spark, t)
    assert M.table_column_mapping(t) == {}
    assert M.read_version(spark, t).columns == ["id", "price"]
    assert sorted(
        (r.id, r.price) for r in M.read_version(spark, t).collect()
    ) == [(1, 10.0), (2, 20.0), (3, 30.0)]


def test_rename_partition_column(spark, tmp_path):
    """Renaming a hive partition column: paths keep the physical
    name, reads surface the logical one, partition pruning holds."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "x")], "id int, region string"
    )
    M.commit(df, t, partition_by=["region"])
    M.rename_column(t, "region", "zone")
    got = M.read_version(spark, t, where=[("zone", "==", "x")])
    assert sorted((r.id, r.zone) for r in got.collect()) == [
        (1, "x"),
        (3, "x"),
    ]
    # post-rename partitioned append still lands under the physical
    # path component and reads back merged
    M.commit(
        spark.createDataFrame([(4, "z")], "id int, zone string"),
        t,
        partition_by=["zone"],
    )
    assert sorted(
        (r.id, r.zone) for r in M.read_version(spark, t).collect()
    ) == [(1, "x"), (2, "y"), (3, "x"), (4, "z")]


def test_changefeed_across_rename(spark, tmp_path):
    """A feed straddling a RENAME must diff the column as ITSELF (by
    physical identity) under the CURRENT names — not as a drop plus an
    unrelated add, which would flag every row changed."""
    t = str(tmp_path / "tbl")
    _base(spark, t)  # v1: (id, amt, tag)
    M.rename_column(t, "amt", "price")  # v2
    # v3: change one row's price, add a row (under current names)
    M.update_where(spark, t, [("id", "==", 2)], {"price": F.lit(99.0)})
    M.commit(
        spark.createDataFrame(
            [(4, 40.0, "d")], "id int, price double, tag string"
        ),
        t,
    )
    feed = M.changefeed_rows(spark, t, ["id"], 1, 4)
    got = {
        (r["change_type"], r["id"], r["price"]) for r in feed.collect()
    }
    # ONLY the genuinely changed/added rows ship; renamed-but-equal
    # rows are 'unchanged' and dropped from the feed
    assert got == {("changed", 2, 99.0), ("added", 4, 40.0)}


def test_changefeed_rename_plus_fresh_same_named_column(spark, tmp_path):
    """rename a->b then ADD a new column named a: the feed must track
    OLD a into b (physical identity) and treat the fresh a as a new
    column that flags rows only where it is non-NULL."""
    t = str(tmp_path / "tbl")
    _base(spark, t)
    M.rename_column(t, "amt", "price")
    M.commit(
        spark.createDataFrame(
            [(9, 90.0, "z", 1.5)],
            "id int, price double, tag string, amt double",
        ),
        t,
    )
    feed = M.changefeed_rows(spark, t, ["id"], 1, 3)
    got = {(r["change_type"], r["id"]) for r in feed.collect()}
    # rows 1-3 are unchanged (their renamed price is equal, their new
    # amt is NULL); only the appended row ships
    assert got == {("added", 9)}


def test_merge_evolution_avoids_retired_physical(spark, tmp_path):
    """An evolving MERGE whose new column name matches a RETIRED
    physical name must take a fresh physical name — never resurrect
    the dropped column's bytes in old files."""
    t = str(tmp_path / "tbl")
    _base(spark, t)  # (id, amt, tag)
    M.drop_column(t, "tag")
    src = spark.createDataFrame(
        [(1, 11.0, "fresh")], "id int, amt double, tag string"
    )
    M.merge_into(spark, t, src, ["id"], evolve_schema=True)
    got = {r.id: (r.amt, r.tag) for r in M.read_version(spark, t).collect()}
    # old rows: tag NULL (not the dropped 'a'/'b'/'c' bytes)
    assert got == {
        1: (11.0, "fresh"),
        2: (20.0, None),
        3: (30.0, None),
    }
    assert M.table_column_mapping(t)["tag"] != "tag"


def test_table_partitions_metadata_only(spark, tmp_path):
    """SHOW PARTITIONS from the manifest: exact combos (string
    identity preserved), per-partition file/row counts, rename-aware
    logical names, no file opened."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, "01"), (2, "1"), (3, "1"), (4, "x")], "id int, mkey string"
    )
    M.commit(df, t, partition_by=["mkey"])
    M.commit(
        spark.createDataFrame([(5, "1")], "id int, mkey string"),
        t,
        partition_by=["mkey"],
    )
    M.rename_column(t, "mkey", "bucket")
    parts = M.table_partitions(t)
    got = {p["values"]["bucket"]: p for p in parts}
    # '01' and '1' stay distinct; the second commit added files to '1'
    assert got["01"]["n_rows"] == 1
    assert got["1"]["n_rows"] == 3 and got["1"]["n_files"] >= 2
    assert got["x"]["n_rows"] == 1
    assert not got["1"]["approx"]
    with pytest.raises(ValueError, match="not hive-partitioned"):
        t2 = str(tmp_path / "plain")
        M.commit(spark.createDataFrame([(1,)], "id int"), t2)
        M.table_partitions(t2)
