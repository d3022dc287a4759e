"""Regressions for the round-10 ADVICE items:

1. (medium) _interleaved_commits_disjoint must treat a dir WITHOUT
   per-file entries (legacy manifest) as unprovable — abort — never as
   an empty dir (the `or []` masking bug).
2. (low) a shard expired by a concurrent vacuum mid-walk surfaces as a
   clean (False, reason), never a raw FileNotFoundError.
3. (low) vacuum blocked by an in-flight clone claim skips ONLY the
   data sweep (with a warning naming the entry); manifest expiry of
   the source's own versions still runs.
4. (low) drop_table(purge=True) renames the managed dir aside BEFORE
   the unregister publishes, so a concurrently re-created name never
   shares the doomed directory.
5. (low) INSERT detects VALUES syntactically: a genuine SELECT whose
   source columns are literally named col1..colN errors on the name
   mismatch instead of being silently positionally renamed.
"""

from __future__ import annotations

import json
import os
import time

import pytest

from finance_etl_pipeline_spark.operators import catalog as C
from finance_etl_pipeline_spark.operators import manifest as M
from finance_etl_pipeline_spark.operators.sqldml import (
    SqlDmlError,
    execute_dml,
)


def _two_version_table(spark, tmp_path, name="tbl"):
    t = str(tmp_path / name)
    df1 = spark.createDataFrame(
        [(i, i * 10) for i in range(10)], "id int, val int"
    ).coalesce(1)
    df2 = spark.createDataFrame(
        [(i, i * 10) for i in range(10, 20)], "id int, val int"
    ).coalesce(1)
    M.commit(df1, t)
    M.commit(df2, t)
    return t


def _strip_per_file_entries(t: str, version: int, only_new: bool) -> None:
    """Rewrite a manifest so (some of) its dirs carry NO per-file
    entries — the legacy-manifest shape."""
    p = M._manifest_path(t, version)
    with open(p) as fh:
        m = json.load(fh)
    refs = m.get("files_ref", {})
    if only_new:
        prev = M._read_manifest(t, version - 1)
        for d in list(refs):
            if d not in prev.get("files_ref", {}):
                del refs[d]
    else:
        m["files_ref"] = {}
    os.remove(p)
    with open(p, "w") as fh:
        json.dump(m, fh)


def test_rebase_walk_aborts_on_legacy_dir_without_entries(
    spark, tmp_path
):
    """v2 appended a dir, then its per-file entries are stripped
    (legacy shape).  The walk cannot prove v2's files disjoint from
    ANY read set, so it must abort — not treat the dir as empty."""
    t = _two_version_table(spark, tmp_path)
    # sanity: with entries intact, a read set provably missing the
    # appended keys rebases fine
    ok, why = M._interleaved_commits_disjoint(t, 1, 2, [("id", "<", 5)])
    assert ok, why
    _strip_per_file_entries(t, 2, only_new=True)
    ok, why = M._interleaved_commits_disjoint(t, 1, 2, [("id", "<", 5)])
    assert not ok
    assert "no per-file entries" in why


def test_rebase_walk_clean_abort_on_vacuumed_shard(spark, tmp_path):
    """Deleting an interleaved version's shard (what a concurrent
    vacuum does) must yield (False, reason), not FileNotFoundError."""
    t = _two_version_table(spark, tmp_path)
    m2 = M._read_manifest(t, 2)
    prev_shards = {
        r["shard"] for r in M._read_manifest(t, 1)["files_ref"].values()
    }
    new_shards = {
        r["shard"]
        for r in m2["files_ref"].values()
        if r["shard"] not in prev_shards
    }
    assert new_shards
    for s in new_shards:
        path = os.path.join(t, M._MANIFESTS, s)
        os.remove(path)
        M._SHARD_CACHE.pop(path, None)
    ok, why = M._interleaved_commits_disjoint(t, 1, 2, [("id", "<", 5)])
    assert not ok
    assert "vacuum" in why


def test_vacuum_inflight_clone_blocks_only_data_sweep(spark, tmp_path):
    """An in-flight clone claim (registered, no published clone
    version, younger than retention) must block the DATA sweep with a
    warning — while manifest expiry of the source's own versions still
    runs — and never silently return [] for the whole vacuum."""
    t = str(tmp_path / "src")
    df = spark.createDataFrame([(1, 1)], "id int, val int").coalesce(1)
    M.commit(df, t)  # v1
    M.commit(df, t, mode="overwrite")  # v2: v1's dir now expirable
    v1_dir = M._read_manifest(t, 1)["dirs"][0]
    # fake in-flight clone: registered claim, clone dir has no versions
    reg_dir = os.path.join(t, M._MANIFESTS, "clones")
    os.makedirs(reg_dir, exist_ok=True)
    claim = os.path.join(reg_dir, "claim-test.json")
    with open(claim, "w") as fh:
        json.dump({"clone": str(tmp_path / "nonexistent_clone")}, fh)
    # age the data dirs well past any retention we pass
    old = time.time() - 10_000
    for d in os.listdir(os.path.join(t, M._DATA)):
        os.utime(os.path.join(t, M._DATA, d), (old, old))
    with pytest.warns(UserWarning, match="data sweep skipped"):
        removed = M.vacuum(t, keep_last=1, retention_seconds=3600.0)
    assert removed == []  # data untouched while the claim is live
    assert os.path.isdir(os.path.join(t, v1_dir))  # dir kept
    with pytest.raises(M.VersionNotFoundError):
        M._read_manifest(t, 1)  # manifest expiry still ran
    # claim expires (ages past retention): next vacuum prunes it and
    # sweeps the dead dir
    os.utime(claim, (old, old))
    removed = M.vacuum(t, keep_last=1, retention_seconds=3600.0)
    assert v1_dir in removed
    assert not os.path.exists(claim)


def test_drop_purge_renames_aside_before_publish(spark, tmp_path, monkeypatch):
    """At the instant the unregister publishes, the managed directory
    must already be vacant — a concurrent create_table of the same
    name then never shares the doomed path."""
    root = str(tmp_path / "wh")
    df = spark.createDataFrame([(1,)], "id int").coalesce(1)
    C.create_table_as(spark, root, "victim", df)
    tdir = C.resolve(root, "victim")
    assert M.latest_version(tdir) == 1

    real_publish = C._publish
    seen = {}

    def checking_publish(r, build):
        # not the catalog's own dir: the victim's data path is vacant
        seen["dir_exists_at_publish"] = os.path.exists(tdir)
        return real_publish(r, build)

    monkeypatch.setattr(C, "_publish", checking_publish)
    C.drop_table(root, "victim", purge=True)
    monkeypatch.undo()
    assert seen["dir_exists_at_publish"] is False
    assert not os.path.exists(tdir)
    assert not [f for f in os.listdir(root) if f.startswith(".trash-")]
    # the name is immediately reusable with a fresh directory
    C.create_table_as(spark, root, "victim", df)
    assert M.read_version(spark, C.resolve(root, "victim")).count() == 1


def test_insert_select_with_colN_names_is_not_positionally_renamed(
    spark, tmp_path
):
    t = str(tmp_path / "tbl")
    M.commit(
        spark.createDataFrame([(1, 100)], "a int, b int").coalesce(1), t
    )
    spark.createDataFrame([(7, 700)], "col1 int, col2 int").coalesce(
        1
    ).createOrReplaceTempView("advice_r10_coln_src")
    with pytest.raises(SqlDmlError, match="col1"):
        execute_dml(
            spark,
            "INSERT INTO t SELECT col1, col2 FROM advice_r10_coln_src",
            {"t": t},
        )
    # bare VALUES still maps positionally...
    execute_dml(spark, "INSERT INTO t VALUES (2, 200)", {"t": t})
    rows = sorted(
        (r.a, r.b) for r in M.read_version(spark, t).collect()
    )
    assert rows == [(1, 100), (2, 200)]
    # ...and a wrong-arity VALUES errors loudly
    with pytest.raises(SqlDmlError, match="arity"):
        execute_dml(spark, "INSERT INTO t VALUES (3, 300, 9)", {"t": t})
