"""Regressions for the round-11 self-review findings: restore vs
concurrent vacuum (touch protection + post-publish self-heal), the
catalog trash janitor, describe_detail honesty, CLI restore conflict
exit code, and backtick-identifier time-travel immunity."""

from __future__ import annotations

import json
import os
import time

import pytest

from finance_etl_pipeline_spark.cli import main as cli_main
from finance_etl_pipeline_spark.operators import catalog as C
from finance_etl_pipeline_spark.operators import manifest as M
from finance_etl_pipeline_spark.operators.sqldml import expand_time_travel


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
            [(i, i * 10) for i in range(5)], "id int, val int"
        ).coalesce(1),
        t,
    )  # v1
    M.commit(
        spark.createDataFrame([(9, 90)], "id int, val int").coalesce(1),
        t,
        mode="overwrite",
    )  # v2: v1's dirs are vacuum-reclaimable
    return t


def test_restore_touch_protects_against_sane_vacuum(
    spark, tbl, monkeypatch
):
    """A concurrent vacuum with a normal retention window must skip
    the restore's (touched) target files — the in-flight-writer
    contract — so the restore lands intact."""
    good = _rows(spark, tbl, 1)
    old = time.time() - 10_000
    for d in M._read_manifest(tbl, 1)["dirs"]:
        absd = os.path.join(tbl, d)
        os.utime(absd, (old, old))
        for f in os.listdir(absd):
            os.utime(os.path.join(absd, f), (old, old))
    real_publish = M._publish
    state = {"armed": True}

    def racing(table_dir, build):
        if state["armed"]:
            state["armed"] = False
            M.vacuum(table_dir, keep_last=1, retention_seconds=3600.0)
        return real_publish(table_dir, build)

    monkeypatch.setattr(M, "_publish", racing)
    v = M.restore_table(tbl, 1)
    monkeypatch.undo()
    assert v == 3
    assert _rows(spark, tbl) == good


def test_restore_self_heals_against_zero_retention_vacuum(
    spark, tbl, monkeypatch
):
    """retention 0 is documented as 'no concurrent writers' — if an
    operator runs it against a mid-flight restore anyway, the restore
    must detect the swept files, roll the tip back to the pre-restore
    state, and raise — never leave a tip referencing vanished files."""
    pre = _rows(spark, tbl)  # the v2 state
    real_publish = M._publish
    state = {"armed": True}

    def racing(table_dir, build):
        if state["armed"]:
            state["armed"] = False
            M.vacuum(table_dir, keep_last=1, retention_seconds=0.0)
        return real_publish(table_dir, build)

    monkeypatch.setattr(M, "_publish", racing)
    with pytest.raises(
        M.ConcurrentTableModificationError, match="raced a concurrent vacuum"
    ):
        M.restore_table(tbl, 1)
    monkeypatch.undo()
    # the healed tip reads the pre-restore content without errors
    assert _rows(spark, tbl) == pre
    assert M._read_manifest(tbl, M.latest_version(tbl))["mode"] == "restore"


def test_catalog_trash_janitor(spark, tmp_path):
    root = str(tmp_path / "wh")
    df = spark.createDataFrame([(1,)], "id int").coalesce(1)
    C.create_table_as(spark, root, "a", df)
    C.create_table_as(spark, root, "b", df)
    # a crashed PURGE left stale trash; a fresh one is mid-flight
    stale = os.path.join(root, ".trash-stale")
    fresh = os.path.join(root, ".trash-fresh")
    os.makedirs(stale)
    os.makedirs(fresh)
    old = time.time() - 10_000
    os.utime(stale, (old, old))
    C.drop_table(root, "a", purge=True)  # janitor runs at drop start
    assert not os.path.exists(stale)
    assert os.path.exists(fresh)  # younger than retention: kept
    # and the drop's own data is gone with no new trash left behind
    assert [
        f for f in os.listdir(root) if f.startswith(".trash-")
    ] == [".trash-fresh"]


def test_describe_detail_legacy_reports_none(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(
        spark.createDataFrame([(1, 1)], "id int, val int").coalesce(1), t
    )
    p = M._manifest_path(t, 1)
    with open(p) as fh:
        m = json.load(fh)
    m.pop("files_ref", None)
    m.pop("files", None)
    os.remove(p)
    with open(p, "w") as fh:
        json.dump(m, fh)
    d = M.describe_detail(t)
    assert d["n_files"] is None and d["size_bytes"] is None
    assert d["n_rows"] is None  # same no-partial-numbers contract


def test_cli_restore_conflict_exits_3(spark, tbl, monkeypatch, capsys):
    real_publish = M._publish
    state = {"armed": True}

    def racing(table_dir, build):
        if state["armed"]:
            state["armed"] = False
            M.commit(
                spark.createDataFrame([(7, 7)], "id int, val int")
                .coalesce(1),
                table_dir,
            )
        return real_publish(table_dir, build)

    monkeypatch.setattr(M, "_publish", racing)
    rc = cli_main(["table", "restore", tbl, "--version", "1"])
    monkeypatch.undo()
    assert rc == 3
    assert "conflict" in capsys.readouterr().err


def test_backticked_identifiers_are_never_time_traveled(spark, tbl):
    stmt = (
        "SELECT `t@1` FROM t VERSION AS OF 1"
    )
    out = expand_time_travel(spark, stmt, {"t": tbl})
    assert out.startswith("SELECT `t@1` FROM t__asof_v1")
