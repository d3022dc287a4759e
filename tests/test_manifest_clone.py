"""SHALLOW CLONE: zero-copy table branches.  The clone references the
source snapshot's files in place (absolute dirs); DML on the clone is
copy-on-write into the clone's own data root, and the clone's vacuum
is structurally unable to touch source bytes."""

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


def test_clone_is_zero_copy_and_reads_equal(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    o = _orders(spark, sf_dir)
    M.commit(o.repartitionByRange(4, "o_orderkey"), src)
    M.delete_where(src, [("o_orderstatus", "==", "F")])
    v = M.clone_table(src, dst)
    assert v == 1
    # zero data copied: the clone's data root does not even exist
    assert not os.path.isdir(os.path.join(dst, "data"))
    got = M.read_version(spark, dst)
    want = M.read_version(spark, src)
    assert got.count() == want.count()
    assert got.filter(F.col("o_orderstatus") == "F").count() == 0
    # file skipping answers from the cloned entries
    fs = M.files_for_version(dst, where=[("o_orderkey", "<", 100)])
    assert fs and len(fs) < len(M.files_for_version(dst))
    # metadata COUNT unavailable (tombstones) — but n_files flows
    assert M.history(dst)[0]["n_files"] == 4


def test_clone_writes_never_touch_source(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    o = _orders(spark, sf_dir)
    M.commit(o, src)
    n_src = o.count()
    M.clone_table(src, dst)

    # append + merge + update on the CLONE (fresh negative keys so
    # the append duplicates nothing)
    M.commit(
        o.limit(5)
        .withColumn("o_orderkey", -(F.col("o_orderkey") + 1))
        .withColumn("o_totalprice", F.lit(1.0)),
        dst,
    )
    lo = o.agg(F.min("o_orderkey")).first()[0]
    M.merge_into(
        spark,
        dst,
        o.filter(F.col("o_orderkey") == lo).withColumn(
            "o_totalprice", F.lit(42.0)
        ),
        ["o_orderkey"],
    )
    M.update_where(
        spark, dst, [("o_orderstatus", "==", "P")],
        {"o_totalprice": F.col("o_totalprice") + 0.5},
    )
    # the source is byte-for-byte unaffected
    assert M.latest_version(src) == 1
    s = M.read_version(spark, src)
    assert s.count() == n_src
    assert s.filter(F.col("o_orderkey") == lo).first()["o_totalprice"] != 42.0
    # the clone sees all its own DML
    d = M.read_version(spark, dst)
    assert d.count() == n_src + 5
    assert (
        d.filter(
            (F.col("o_orderkey") == lo) & (F.col("o_totalprice") == 42.0)
        ).count()
        == 1
    )


def test_clone_vacuum_cannot_reclaim_source_bytes(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    o = _orders(spark, sf_dir)
    M.commit(o.repartition(3), src)
    src_files = set(M.files_for_version(src))
    M.clone_table(src, dst)
    # clone overwrites itself: the source refs expire at the clone
    M.commit(o.limit(10), dst, mode="overwrite")
    removed = M.vacuum(dst, keep_last=1, retention_seconds=0.0)
    # nothing of the source was removed — structurally out of scope
    assert all(os.path.exists(f) for f in src_files)
    assert not any(str(src) in r for r in removed)
    assert M.read_version(spark, src).count() == o.count()


def test_clone_carries_constraints_not_txns(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    o = _orders(spark, sf_dir)
    M.commit(o.limit(40), src, txn=("writer-a", 7))
    M.add_constraint(spark, src, "price_pos", "o_totalprice > 0")
    M.clone_table(src, dst)
    # constraint traveled: violating writes abort on the clone
    assert M.table_constraints(dst) == {"price_pos": "o_totalprice > 0"}
    with pytest.raises(M.ConstraintViolationError):
        M.commit(o.limit(2).withColumn("o_totalprice", F.lit(-1.0)), dst)
    # writer txns did NOT: the same (app, ver) applies fresh here
    v = M.commit(o.limit(3), dst, txn=("writer-a", 7))
    assert v == 2


def test_clone_of_version_and_guardrails(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    o = _orders(spark, sf_dir)
    M.commit(o.limit(10), src)
    M.commit(o.limit(25).subtract(o.limit(10)), src)
    # pin the clone to v1
    M.clone_table(src, dst, version=1)
    assert M.read_version(spark, dst).count() == 10
    # a non-empty target refuses
    with pytest.raises(ValueError, match="not empty"):
        M.clone_table(src, dst)


def test_clone_partitioned_source_prunes(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    o = _orders(spark, sf_dir)
    M.commit(o, src, partition_by=["o_orderstatus"])
    M.clone_table(src, dst)
    got = M.read_version(spark, dst)
    assert got.count() == o.count()
    assert "o_orderstatus" in got.columns
    pruned = M.files_for_version(dst, where=[("o_orderstatus", "==", "F")])
    assert pruned and all("o_orderstatus=F" in f for f in pruned)
    assert len(pruned) < len(M.files_for_version(dst))


# --------------------------------------------- r10: clone-safe vacuum


def test_source_vacuum_keeps_clone_referenced_dirs(
    spark, sf_dir, tmp_path
):
    """Vacuum on the SOURCE is clone-aware (beyond Delta): dirs a live
    clone still references survive a keep_last=1 sweep after the
    source overwrote itself; the clone keeps reading; once the clone
    is deleted, the next vacuum reclaims both dirs and registry."""
    import shutil

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    M.commit(_orders(spark, sf_dir).limit(50), src)
    M.clone_table(src, dst)
    before = {tuple(r) for r in M.read_version(spark, dst).collect()}

    # source moves on: the v1 dirs are unreferenced by its tip
    M.commit(_orders(spark, sf_dir).limit(5), src, mode="overwrite")
    removed = M.vacuum(src, keep_last=1, retention_seconds=0.0)
    assert removed == []  # protected by the clone registry
    after = {tuple(r) for r in M.read_version(spark, dst).collect()}
    assert after == before  # clone intact

    # clone abandoned -> registry pruned, dirs reclaimed
    shutil.rmtree(dst)
    removed = M.vacuum(src, keep_last=1, retention_seconds=0.0)
    assert removed, "clone gone: v1 dirs must be reclaimable"
    reg = os.path.join(src, M._MANIFESTS, "clones")
    assert os.listdir(reg) == []


def test_clone_of_clone_protects_the_original(spark, sf_dir, tmp_path):
    """A second-level clone references the ORIGINAL table's dirs
    directly; it registers there, so vacuuming the original keeps its
    dirs even after the FIRST clone is gone."""
    import shutil

    src = str(tmp_path / "src")
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    M.commit(_orders(spark, sf_dir).limit(30), src)
    M.clone_table(src, a)
    M.clone_table(a, b)
    want = {tuple(r) for r in M.read_version(spark, b).collect()}

    shutil.rmtree(a)  # the intermediate clone dies
    M.commit(_orders(spark, sf_dir).limit(3), src, mode="overwrite")
    removed = M.vacuum(src, keep_last=1, retention_seconds=0.0)
    assert removed == []  # b registered at src directly
    got = {tuple(r) for r in M.read_version(spark, b).collect()}
    assert got == want


def test_file_granular_sweep_respects_clone_files(
    spark, sf_dir, tmp_path
):
    """A merge on the source rewrites files inside a still-live dir;
    the swept leftovers must exclude files the clone still reads."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    o = _orders(spark, sf_dir).limit(40)
    M.commit(o.repartition(4), src)
    M.clone_table(src, dst)
    before = {tuple(r) for r in M.read_version(spark, dst).collect()}
    upd = o.limit(5).withColumn("o_totalprice", F.lit(1.0))
    M.merge_into(spark, src, upd, ["o_orderkey"])
    M.vacuum(src, keep_last=1, retention_seconds=0.0)
    assert {
        tuple(r) for r in M.read_version(spark, dst).collect()
    } == before


def test_inflight_clone_blocks_the_sweep(spark, sf_dir, tmp_path):
    """A registered-but-unpublished clone (the creation window) makes
    vacuum return [] instead of racing the clone's read set; the
    stale claim of a CRASHED clone ages out and is pruned."""
    src = str(tmp_path / "src")
    M.commit(_orders(spark, sf_dir).limit(20), src)
    M.commit(_orders(spark, sf_dir).limit(5), src, mode="overwrite")
    # age every data dir past retention: without the in-flight claim
    # the v1 dirs would sweep
    data_root = os.path.join(src, "data")
    for d in os.listdir(data_root):
        os.utime(os.path.join(data_root, d), (1, 1))
    # simulate a clone mid-creation: fresh registry entry, no manifest
    M._register_clone(src, str(tmp_path / "never_published"))
    assert M.vacuum(src, keep_last=1, retention_seconds=60.0) == []
    # the CRASHED clone's claim ages out: pruned, sweep proceeds
    reg = os.path.join(src, M._MANIFESTS, "clones")
    entry = os.path.join(reg, os.listdir(reg)[0])
    os.utime(entry, (1, 1))
    removed = M.vacuum(src, keep_last=1, retention_seconds=60.0)
    assert removed  # v1 dirs reclaimed
    assert os.listdir(reg) == []


def test_corrupt_clone_registry_entry_never_crashes(spark, sf_dir, tmp_path):
    import json as _json

    src = str(tmp_path / "src")
    M.commit(_orders(spark, sf_dir).limit(10), src)
    reg = os.path.join(src, M._MANIFESTS, "clones")
    os.makedirs(reg, exist_ok=True)
    with open(os.path.join(reg, "bad1.json"), "w") as fh:
        fh.write("{not json")
    with open(os.path.join(reg, "bad2.json"), "w") as fh:
        _json.dump({"clone": 5}, fh)
    assert M.vacuum(src, keep_last=1, retention_seconds=0.0) == []
