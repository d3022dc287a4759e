"""RESTORE TABLE (manifest.restore_table + the SQL surface): rollback
as a new history-preserving version — bit-identical reads, changefeed
undo delta, vacuum keeping the restored read set, conflict-abort on an
interleaved commit, and loud errors for bad targets."""

from __future__ import annotations

import os

import pytest

from finance_etl_pipeline_spark.operators import manifest as M
from finance_etl_pipeline_spark.operators.sqldml import (
    SqlDmlError,
    execute_dml,
)


def _rows(spark, t, version=None):
    return sorted(
        (r.id, r.val)
        for r in M.read_version(spark, t, version=version).collect()
    )


@pytest.fixture()
def tbl(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(
        spark.createDataFrame(
            [(i, i * 10) for i in range(6)], "id int, val int"
        ).coalesce(1),
        t,
    )  # v1: the good state
    return t


def test_restore_after_bad_merge_is_bit_identical(spark, tbl):
    good = _rows(spark, tbl, 1)
    bad = spark.createDataFrame(
        [(0, -1), (99, -1)], "id int, val int"
    )
    M.merge_into(spark, tbl, bad, ["id"])  # v2: the bad merge
    assert _rows(spark, tbl) != good
    v = M.restore_table(tbl, 1)
    assert v == 3
    assert _rows(spark, tbl) == good
    # history preserved: the bad version still reads
    assert (0, -1) in _rows(spark, tbl, 2)
    assert M._read_manifest(tbl, 3)["mode"] == "restore"
    assert M._read_manifest(tbl, 3)["restore_of"] == 1


def test_restore_with_tombstones_and_schema(spark, tbl):
    """The restored state must carry the target's tombstones and
    schema, not the tip's."""
    M.delete_where(tbl, [("id", "<", 2)])  # v2: target has a tombstone
    at_v2 = _rows(spark, tbl, 2)
    M.commit(
        spark.createDataFrame(
            [(100, 1, "x")], "id int, val int, extra string"
        ).coalesce(1),
        tbl,
    )  # v3: schema evolved past the target
    v = M.restore_table(tbl, 2)
    assert v == 4
    assert _rows(spark, tbl) == at_v2
    cols = M.read_version(spark, tbl).columns
    assert cols == ["id", "val"]  # evolution rolled back with the data


def test_restore_to_tip_is_a_noop(spark, tbl):
    assert M.restore_table(tbl, 1) == 1
    assert M.latest_version(tbl) == 1


def test_restore_bad_targets_error(spark, tbl):
    with pytest.raises(M.VersionNotFoundError):
        M.restore_table(tbl, 42)
    with pytest.raises(ValueError, match=">= 1"):
        M.restore_table(tbl, 0)
    M.commit(
        spark.createDataFrame([(9, 9)], "id int, val int").coalesce(1),
        tbl,
    )  # v2
    M.vacuum(tbl, keep_last=1, retention_seconds=0.0)
    with pytest.raises(M.VersionNotFoundError):
        M.restore_table(tbl, 1)


def test_restore_conflict_aborts_on_interleaved_commit(
    spark, tbl, monkeypatch
):
    M.delete_where(tbl, [("id", "==", 0)])  # v2
    real_publish = M._publish
    state = {"raced": False}

    def racing_publish(table_dir, build):
        if not state["raced"]:
            state["raced"] = True
            M.commit(
                spark.createDataFrame(
                    [(77, 77)], "id int, val int"
                ).coalesce(1),
                table_dir,
            )
        return real_publish(table_dir, build)

    monkeypatch.setattr(M, "_publish", racing_publish)
    with pytest.raises(M.ConcurrentTableModificationError):
        M.restore_table(tbl, 1)


def test_restore_txns_carry_from_tip_not_target(spark, tbl):
    """Writer idempotence must survive the rollback: a streaming sink
    replaying its last batch after a restore stays a no-op."""
    df = spark.createDataFrame([(50, 50)], "id int, val int").coalesce(1)
    M.commit(df, tbl, txn=("app", 7))  # v2
    M.restore_table(tbl, 1)  # v3: data rolls back, txns do not
    tip = M.latest_version(tbl)
    assert M.commit(df, tbl, txn=("app", 7)) == tip  # replay: no-op
    assert M._read_manifest(tbl, tip)["txns"] == {"app": 7}


def test_vacuum_respects_restored_read_set(spark, tbl):
    good = _rows(spark, tbl, 1)
    v1_dirs = set(M._read_manifest(tbl, 1)["dirs"])
    M.commit(
        spark.createDataFrame([(9, 9)], "id int, val int").coalesce(1),
        tbl,
        mode="overwrite",
    )  # v2: v1's dirs now unreferenced by the tip
    M.restore_table(tbl, 1)  # v3 re-references them
    removed = M.vacuum(tbl, keep_last=1, retention_seconds=0.0)
    assert not (v1_dirs & set(removed))
    assert _rows(spark, tbl) == good
    for d in v1_dirs:
        assert os.path.isdir(os.path.join(tbl, d))


def test_changefeed_shows_the_restore_delta(spark, tbl):
    M.delete_where(tbl, [("id", ">=", 3)])  # v2 drops 3,4,5
    M.restore_table(tbl, 1)  # v3 brings them back
    feed = {
        r.id: r.change_type
        for r in M.changes(spark, tbl, ["id"], 2, 3).collect()
    }
    assert {k: v for k, v in feed.items() if v != "unchanged"} == {
        3: "added",
        4: "added",
        5: "added",
    }


def test_restore_sql_surface_and_timestamp_form(spark, tbl):
    good = _rows(spark, tbl, 1)
    ts1 = M._read_manifest(tbl, 1)["ts"]
    M.delete_where(tbl, [("id", ">", -1)])  # v2: drop everything
    res = execute_dml(
        spark, f"RESTORE TABLE t TO TIMESTAMP AS OF {ts1}", {"t": tbl}
    )
    assert res == {"op": "restore", "table": "t", "version": 3}
    assert _rows(spark, tbl) == good
    with pytest.raises(SqlDmlError, match="malformed RESTORE"):
        execute_dml(spark, "RESTORE TABLE t", {"t": tbl})
