"""CHECK constraints on manifest tables (the Delta constraint model):
table properties validated against every write path's NEW rows inside
the publish, so a violating write aborts with nothing referenced."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from finance_etl_pipeline_spark.operators import manifest as M
from finance_etl_pipeline_spark.sources.readers import table


def _orders(spark, sf_dir):
    return table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


def test_add_validates_existing_and_gates_commits(spark, sf_dir, tmp_path):
    t = str(tmp_path / "tbl")
    o = _orders(spark, sf_dir)
    M.commit(o, t)
    # a constraint current rows break is rejected up front
    with pytest.raises(M.ConstraintViolationError, match="existing"):
        M.add_constraint(spark, t, "impossible", "o_totalprice < 0")
    v = M.add_constraint(spark, t, "price_pos", "o_totalprice > 0")
    assert v == 2
    assert M.table_constraints(t) == {"price_pos": "o_totalprice > 0"}

    # a clean append passes; a violating one aborts with no version
    M.commit(o.limit(5), t)
    assert M.latest_version(t) == 3
    bad = o.limit(3).withColumn("o_totalprice", F.lit(-1.0))
    with pytest.raises(M.ConstraintViolationError, match="price_pos"):
        M.commit(bad, t)
    assert M.latest_version(t) == 3
    assert (
        M.read_version(spark, t)
        .filter(F.col("o_totalprice") <= 0)
        .count()
        == 0
    )


def test_constraints_gate_update_merge_and_dynamic(spark, sf_dir, tmp_path):
    t = str(tmp_path / "tbl")
    o = _orders(spark, sf_dir)
    M.commit(o, t, partition_by=["o_orderstatus"])
    M.add_constraint(spark, t, "price_pos", "o_totalprice > 0")
    tip = M.latest_version(t)

    # UPDATE writing violating rows aborts
    with pytest.raises(M.ConstraintViolationError):
        M.update_where(
            spark, t, [("o_orderstatus", "==", "F")],
            {"o_totalprice": F.lit(-5.0)},
        )
    assert M.latest_version(t) == tip

    # MERGE with violating source aborts
    src = o.limit(4).withColumn("o_totalprice", F.lit(-2.0))
    with pytest.raises(M.ConstraintViolationError):
        M.merge_into(spark, t, src, ["o_orderkey"])
    assert M.latest_version(t) == tip

    # dynamic partition overwrite with violating rows aborts
    repl = (
        o.filter(F.col("o_orderstatus") == "F")
        .limit(3)
        .withColumn("o_totalprice", F.lit(-9.0))
    )
    with pytest.raises(M.ConstraintViolationError):
        M.overwrite_partitions(repl, t, ["o_orderstatus"])
    assert M.latest_version(t) == tip

    # the clean variants all pass
    M.update_where(
        spark, t, [("o_orderstatus", "==", "F")],
        {"o_totalprice": F.col("o_totalprice") + 1.0},
    )
    M.merge_into(
        spark, t,
        o.limit(4).withColumn("o_totalprice", F.lit(7.0)),
        ["o_orderkey"],
    )
    assert M.latest_version(t) == tip + 2


def test_constraint_survives_overwrite_and_drop_works(
    spark, sf_dir, tmp_path
):
    t = str(tmp_path / "tbl")
    o = _orders(spark, sf_dir)
    M.commit(o.limit(50), t)
    M.add_constraint(spark, t, "price_pos", "o_totalprice > 0")
    # constraints are table properties: overwrite keeps them
    M.commit(o.limit(10), t, mode="overwrite")
    assert M.table_constraints(t) == {"price_pos": "o_totalprice > 0"}
    bad = o.limit(2).withColumn("o_totalprice", F.lit(-1.0))
    with pytest.raises(M.ConstraintViolationError):
        M.commit(bad, t)
    # the DataSource write path cannot run the validating Spark job
    # (isolated Python runner, no session) — it must refuse LOUDLY at
    # plan time, never publish unvalidated rows
    from finance_etl_pipeline_spark.sources.lakestream import (
        ManifestTableDataSource,
    )

    spark.dataSource.register(ManifestTableDataSource)
    tip = M.latest_version(t)
    with pytest.raises(Exception, match="CHECK constraints"):
        (
            bad.write.format("manifest_table")
            .option("table_dir", t)
            .mode("append")
            .save()
        )
    assert M.latest_version(t) == tip
    # drop, then the same write passes; unknown drops raise
    M.drop_constraint(t, "price_pos")
    assert M.table_constraints(t) == {}
    with pytest.raises(ValueError, match="no constraint"):
        M.drop_constraint(t, "nope")
    M.commit(bad, t)
    assert (
        M.read_version(spark, t).filter(F.col("o_totalprice") < 0).count()
        == 2
    )


def test_null_passes_check_on_evolved_column(spark, sf_dir, tmp_path):
    """SQL-standard CHECK: NULL passes — a constraint on an evolved
    column never rejects NULL-filled rows, including a later append
    that omits the column entirely."""
    t = str(tmp_path / "tbl")
    o = _orders(spark, sf_dir)
    M.commit(o.limit(30), t)
    # evolve: add a column, constrain it; NULL-filled old rows pass
    M.commit(o.limit(5).withColumn("score", F.lit(10.0)), t)
    M.add_constraint(spark, t, "score_pos", "score > 0")
    M.commit(o.limit(3), t)  # no score column at all: NULLs pass
    assert M.latest_version(t) == 4
    got = M.read_version(spark, t)
    assert got.count() == 38
    # the constraint still bites on actual violations
    with pytest.raises(M.ConstraintViolationError, match="score_pos"):
        M.commit(o.limit(2).withColumn("score", F.lit(-1.0)), t)


def test_stream_passes_through_constraint_versions(spark, sf_dir, tmp_path):
    """A set_constraint version is metadata-only (no dirs added, no
    tombstone change), so an append-only STREAM passes through it
    instead of failing like it must for deletes/updates."""
    t = str(tmp_path / "tbl")
    o = _orders(spark, sf_dir)
    M.commit(o.limit(30), t)
    M.add_constraint(spark, t, "price_pos", "o_totalprice > 0")
    M.commit(o.limit(38).subtract(o.limit(30)), t)
    assert M.latest_version(t) == 3

    from finance_etl_pipeline_spark.sources.lakestream import (
        ManifestTableDataSource,
    )

    spark.dataSource.register(ManifestTableDataSource)
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("manifest_table")
        .option("table_dir", t)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    assert spark.read.parquet(out).count() == 38
