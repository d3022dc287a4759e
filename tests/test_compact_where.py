"""Scoped OPTIMIZE (compact_where): compacts only the files matching
a file-aligned predicate, carries everything else by reference,
keeps tombstone and mapping semantics, and rebases over concurrent
appends."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from finance_etl_pipeline_spark.operators import manifest as M


def _files_of(t, version=None):
    v = M.latest_version(t) if version is None else version
    m = M._read_manifest(t, v)
    files = M._load_files(t, m)
    return {
        d: sorted(e["path"] for e in es) for d, es in files.items() if es
    }


def _mk_partitioned(spark, t, n_appends=4):
    """A hive-partitioned table whose grp='a' partition fragments into
    one file per append — the hot-partition shape."""
    for i in range(n_appends):
        df = spark.createDataFrame(
            [(i * 10 + j, "a" if j < 8 else "b") for j in range(10)],
            "id int, grp string",
        )
        M.commit(df, t, partition_by=["grp"])


def test_compact_where_rewrites_only_matching_partition(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _mk_partitioned(spark, t)
    before = _files_of(t)
    b_files_before = {
        (d, p)
        for d, ps in before.items()
        for p in ps
        if "grp=b" in p
    }
    n_a_before = sum(
        1 for ps in before.values() for p in ps if "grp=a" in p
    )
    assert n_a_before >= 4  # fragmented

    v = M.compact_where(spark, t, [("grp", "==", "a")])
    after = _files_of(t)
    # grp=b files are bit-identical references, untouched
    b_files_after = {
        (d, p) for d, ps in after.items() for p in ps if "grp=b" in p
    }
    assert b_files_after == b_files_before
    # grp=a collapsed into the new dir (fewer files than before)
    n_a_after = sum(
        1 for ps in after.values() for p in ps if "grp=a" in p
    )
    assert n_a_after < n_a_before
    # content identical; partition pruning still works on both sides
    got = {(r.id, r.grp) for r in M.read_version(spark, t).collect()}
    want = {
        (i * 10 + j, "a" if j < 8 else "b")
        for i in range(4)
        for j in range(10)
    }
    assert got == want
    pruned = M.read_version(spark, t, where=[("grp", "==", "b")])
    assert {r.grp for r in pruned.collect()} == {"b"}
    # time travel: pre-compaction snapshot intact
    assert {
        (r.id, r.grp) for r in M.read_version(spark, t, v - 1).collect()
    } == want


def test_compact_where_rejects_misaligned_predicate(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(
        spark.createDataFrame(
            [(i, float(i)) for i in range(100)], "id int, amt double"
        ).coalesce(1),
        t,
    )
    with pytest.raises(ValueError, match="align"):
        M.compact_where(spark, t, [("id", "<", 50)])


def test_compact_where_range_clustered_files_align(spark, tmp_path):
    """Disjoint per-file ranges make range predicates file-aligned —
    the clustered-table case where scoped compaction works without
    hive partitioning."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "id int, amt double"
    )
    M.commit(df.repartitionByRange(4, "id"), t)
    # append a second fragmented range-clustered batch
    df2 = spark.createDataFrame(
        [(i, float(i)) for i in range(100, 200)], "id int, amt double"
    )
    M.commit(df2.repartitionByRange(4, "id"), t)
    n_before = sum(len(ps) for ps in _files_of(t).values())
    # compact everything above the range boundary 100
    M.compact_where(spark, t, [("id", ">=", 100)])
    n_after = sum(len(ps) for ps in _files_of(t).values())
    assert n_after < n_before
    got = sorted(r.id for r in M.read_version(spark, t).collect())
    assert got == list(range(200))


def test_compact_where_materializes_tombstones_in_scope(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _mk_partitioned(spark, t)
    M.delete_where(t, [("id", "==", 3)])  # lives in grp='a'
    M.compact_where(spark, t, [("grp", "==", "a")])
    got = {r.id for r in M.read_version(spark, t).collect()}
    assert 3 not in got and len(got) == 39
    # the tombstone list is carried (still governs untouched dirs)
    assert M._read_manifest(t, M.latest_version(t)).get("deletes")
    # metadata count is still unanswerable only if tombstones COULD
    # affect rows; a scan agrees either way
    assert M.read_version(spark, t).count() == 39


def test_compact_where_rebases_over_append(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _mk_partitioned(spark, t)

    orig = M._publish
    state = {"armed": True}

    def hooked(table_dir, build):
        if state["armed"]:
            state["armed"] = False
            M.commit(
                spark.createDataFrame(
                    [(900, "z")], "id int, grp string"
                ),
                table_dir,
                partition_by=["grp"],
            )
        return orig(table_dir, build)

    M._publish = hooked
    try:
        M.compact_where(spark, t, [("grp", "==", "a")])
    finally:
        M._publish = orig
    got = {(r.id, r.grp) for r in M.read_version(spark, t).collect()}
    assert (900, "z") in got and len(got) == 41


def test_compact_where_keeps_column_mapping(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _mk_partitioned(spark, t)
    M.rename_column(t, "id", "key")
    M.compact_where(spark, t, [("grp", "==", "a")])
    assert M.table_column_mapping(t) == {"key": "id"}
    got = {(r.key, r.grp) for r in M.read_version(spark, t).collect()}
    assert len(got) == 40
    # pruning on the renamed column still proves on physical stats
    pruned = M.read_version(spark, t, where=[("key", "==", 11)])
    assert [(r.key, r.grp) for r in pruned.collect()] == [(11, "a")]


def test_compact_where_no_match_is_noop(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _mk_partitioned(spark, t, n_appends=1)
    v = M.latest_version(t)
    assert M.compact_where(spark, t, [("grp", "==", "zzz")]) == v
    assert M.latest_version(t) == v
