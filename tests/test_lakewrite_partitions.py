"""Partitioned writes + dynamic partition overwrite on the DataSource
write path: ``df.write.format("manifest_table")`` with option
``partition_by`` lays out hive dirs (executor-side Arrow split, one
file per partition a task sees), and ``mode("overwrite")`` with
``partition_overwrite_mode=dynamic`` replaces ONLY the partitions
present in the written data as one version — other partitions' files
must be carried by IDENTITY (same paths, untouched bytes)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from finance_etl_pipeline_spark.operators import manifest as M
from finance_etl_pipeline_spark.sources.lakestream import (
    ManifestTableDataSource,
)
from finance_etl_pipeline_spark.sources.readers import table


def _write(df, tbl, mode="append", **opts):
    df.sparkSession.dataSource.register(ManifestTableDataSource)
    w = df.write.format("manifest_table").option("table_dir", tbl)
    for k, v in opts.items():
        w = w.option(k, v)
    w.mode(mode).save()


def _orders(spark, sf_dir):
    return table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


def test_partition_by_writes_hive_layout_and_prunes(
    spark, sf_dir, tmp_path
):
    tbl = str(tmp_path / "tbl")
    o = _orders(spark, sf_dir)
    _write(o, tbl, partition_by="o_orderstatus")
    # hive layout on disk, partition column stripped from the files
    fs = M.files_for_version(tbl)
    assert fs and all(f"o_orderstatus=" in f for f in fs)
    # read path reconstructs the partition column exactly
    got = M.read_version(spark, tbl)
    assert sorted(got.columns) == sorted(o.columns)
    assert got.count() == o.count()
    assert (
        got.groupBy("o_orderstatus").count().orderBy("o_orderstatus").collect()
        == o.groupBy("o_orderstatus").count().orderBy("o_orderstatus").collect()
    )
    # partition pruning from the manifest stats: only that value's files
    f_files = M.files_for_version(tbl, where=[("o_orderstatus", "==", "F")])
    assert f_files and all("o_orderstatus=F" in f for f in f_files)
    assert len(f_files) < len(fs)


def test_dynamic_overwrite_replaces_only_written_partitions(
    spark, sf_dir, tmp_path
):
    tbl = str(tmp_path / "tbl")
    o = _orders(spark, sf_dir)
    _write(o, tbl, partition_by="o_orderstatus")
    before = set(M.files_for_version(tbl, 1))
    keep_before = {f for f in before if "o_orderstatus=F" not in f}

    # rewrite ONLY partition F, with halved prices
    f_new = o.filter(F.col("o_orderstatus") == "F").withColumn(
        "o_totalprice", F.col("o_totalprice") / 2.0
    )
    _write(
        f_new,
        tbl,
        mode="overwrite",
        partition_by="o_orderstatus",
        partition_overwrite_mode="dynamic",
    )
    assert M.latest_version(tbl) == 2
    after = set(M.files_for_version(tbl, 2))
    keep_after = {f for f in after if "o_orderstatus=F" not in f}
    # untouched partitions: same FILES by identity, not rewritten
    assert keep_after == keep_before
    assert all(os.path.exists(f) for f in keep_after)
    # replaced partition: all-new files
    assert not {f for f in after if "o_orderstatus=F" in f} & before
    got = M.read_version(spark, tbl)
    assert got.count() == o.count()
    lo = (
        o.filter(F.col("o_orderstatus") == "F")
        .agg(F.min("o_orderkey"))
        .first()[0]
    )
    orig = o.filter(F.col("o_orderkey") == lo).first()["o_totalprice"]
    assert (
        got.filter(F.col("o_orderkey") == lo).first()["o_totalprice"]
        == orig / 2.0
    )
    # time travel: the pre-overwrite version still reads the old F rows
    v1 = M.read_version(spark, tbl, 1)
    assert v1.filter(F.col("o_orderkey") == lo).first()["o_totalprice"] == orig


def test_dynamic_overwrite_new_partition_is_pure_insert(
    spark, sf_dir, tmp_path
):
    tbl = str(tmp_path / "tbl")
    o = _orders(spark, sf_dir)
    _write(o, tbl, partition_by="o_orderstatus")
    before = set(M.files_for_version(tbl))
    new_part = o.limit(7).withColumn("o_orderstatus", F.lit("Z"))
    _write(
        new_part,
        tbl,
        mode="overwrite",
        partition_by="o_orderstatus",
        partition_overwrite_mode="dynamic",
    )
    after = set(M.files_for_version(tbl))
    assert before <= after  # nothing replaced — Z did not exist before
    got = M.read_version(spark, tbl)
    assert got.filter(F.col("o_orderstatus") == "Z").count() == 7
    assert got.count() == o.count() + 7


def test_dynamic_overwrite_null_partition_value(spark, sf_dir, tmp_path):
    tbl = str(tmp_path / "tbl")
    o = _orders(spark, sf_dir).limit(40)
    base = o.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 2 == 0, F.lit(None)).otherwise(
            F.col("o_orderstatus")
        ),
    )
    _write(base, tbl, partition_by="o_orderstatus")
    got = M.read_version(spark, tbl)
    n_null = base.filter(F.col("o_orderstatus").isNull()).count()
    assert got.filter(F.col("o_orderstatus").isNull()).count() == n_null
    # replace exactly the NULL partition
    repl = base.filter(F.col("o_orderstatus").isNull()).limit(3)
    _write(
        repl,
        tbl,
        mode="overwrite",
        partition_by="o_orderstatus",
        partition_overwrite_mode="dynamic",
    )
    got2 = M.read_version(spark, tbl)
    assert got2.filter(F.col("o_orderstatus").isNull()).count() == 3
    assert (
        got2.filter(F.col("o_orderstatus").isNotNull()).count()
        == base.filter(F.col("o_orderstatus").isNotNull()).count()
    )


def test_dynamic_overwrite_guardrails(spark, sf_dir, tmp_path):
    tbl = str(tmp_path / "tbl")
    o = _orders(spark, sf_dir).limit(30)
    # dynamic needs overwrite mode and partition_by
    with pytest.raises(Exception, match="mode\\('overwrite'\\)"):
        _write(
            o,
            tbl,
            partition_by="o_orderstatus",
            partition_overwrite_mode="dynamic",
        )
    with pytest.raises(Exception, match="needs partition_by"):
        _write(o, tbl, mode="overwrite", partition_overwrite_mode="dynamic")
    # a prior UNPARTITIONED dir cannot be partition-replaced
    M.commit(o, tbl)
    with pytest.raises(Exception, match="partitioned by"):
        _write(
            o.limit(5),
            tbl,
            mode="overwrite",
            partition_by="o_orderstatus",
            partition_overwrite_mode="dynamic",
        )
    assert M.latest_version(tbl) == 1  # nothing published


def test_python_api_overwrite_partitions(spark, sf_dir, tmp_path):
    tbl = str(tmp_path / "tbl")
    o = _orders(spark, sf_dir)
    M.commit(o, tbl, partition_by=["o_orderstatus"])
    repl = o.filter(F.col("o_orderstatus") == "P").withColumn(
        "o_totalprice", F.lit(1.0)
    )
    v = M.overwrite_partitions(repl, tbl, ["o_orderstatus"])
    assert v == 2
    got = M.read_version(spark, tbl)
    assert got.count() == o.count()
    p = got.filter(F.col("o_orderstatus") == "P")
    assert p.count() == repl.count()
    assert p.agg(F.max("o_totalprice")).first()[0] == 1.0
    # idempotent replay via txn
    v = M.overwrite_partitions(repl, tbl, ["o_orderstatus"], txn=("a", 1))
    assert v == 3
    v = M.overwrite_partitions(repl, tbl, ["o_orderstatus"], txn=("a", 1))
    assert v == 3  # replay: no new version
    assert M.latest_version(tbl) == 3


def test_partitioned_append_via_datasource_then_sql_read(
    spark, sf_dir, tmp_path
):
    """The written hive layout must be consumable by the SQL surface
    (batch reader reconstructs partition constants per file)."""
    tbl = str(tmp_path / "tbl")
    o = _orders(spark, sf_dir)
    _write(o, tbl, partition_by="o_orderstatus")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    (
        spark.read.format("manifest_table")
        .option("table_dir", tbl)
        .option("pushdown", "true")
        .load()
        .createOrReplaceTempView("lakewrite_part_tbl")
    )
    got = spark.sql(
        "SELECT o_orderstatus, count(*) AS n FROM lakewrite_part_tbl "
        "GROUP BY o_orderstatus ORDER BY o_orderstatus"
    ).collect()
    want = (
        o.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderstatus")
        .collect()
    )
    assert got == want


def test_vacuum_reclaims_replaced_partition_files(spark, sf_dir, tmp_path):
    """Dynamic overwrite drops the replaced partition's entries while
    its dir stays live — the FILE-granular vacuum must reclaim those
    bytes once the pre-overwrite version expires."""
    tbl = str(tmp_path / "tbl")
    o = _orders(spark, sf_dir)
    _write(o, tbl, partition_by="o_orderstatus")
    dead = {
        f for f in M.files_for_version(tbl, 1) if "o_orderstatus=F" in f
    }
    assert dead
    _write(
        o.filter(F.col("o_orderstatus") == "F").limit(5),
        tbl,
        mode="overwrite",
        partition_by="o_orderstatus",
        partition_overwrite_mode="dynamic",
    )
    # v1 retained: replaced files must survive for time travel
    assert M.vacuum(tbl, keep_last=2, retention_seconds=0.0) == []
    assert all(os.path.exists(f) for f in dead)
    # v1 expired: the old F-partition files are reclaimed
    removed = set(M.vacuum(tbl, keep_last=1, retention_seconds=0.0))
    dead_rel = {os.path.relpath(f, tbl) for f in dead}
    assert dead_rel <= removed
    got = M.read_version(spark, tbl)
    assert got.filter(F.col("o_orderstatus") == "F").count() == 5
    assert (
        got.count()
        == o.filter(F.col("o_orderstatus") != "F").count() + 5
    )
