"""Longevity stress of the sharded manifest log: a long interleaved
DML history (appends / metadata deletes / updates / merges) with
vacuum cycling through it — every retained version must keep
resolving its shards, time travel must reach the oldest retained
snapshot, and the tip manifest must stay free of inline file
entries no matter how the history churned."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from finance_etl_pipeline_spark.operators import manifest as M
from finance_etl_pipeline_spark.sources.readers import table


def test_long_history_with_vacuum_cycles(spark, sf_dir, tmp_path):
    t = str(tmp_path / "tbl")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    M.commit(o.repartition(4), t)
    for i in range(1, 22):
        k = i % 6
        if k in (0, 1, 2):
            # appends under fresh negative keys: no collisions
            M.commit(
                o.limit(10).withColumn(
                    "o_orderkey", -(F.col("o_orderkey") + 1 + 10000 * i)
                ),
                t,
            )
        elif k == 3:
            M.delete_where(t, [("o_orderkey", "<", -10000 * i)])
        elif k == 4:
            M.update_where(
                spark,
                t,
                [("o_orderkey", ">=", 0), ("o_orderkey", "<", 50)],
                {"o_totalprice": F.col("o_totalprice") + 1.0},
            )
        else:
            M.merge_into(
                spark,
                t,
                o.limit(5).withColumn("o_totalprice", F.lit(9.0)),
                ["o_orderkey"],
            )
        if i % 10 == 0:
            M.vacuum(t, keep_last=5, retention_seconds=0.0)

    tip = M.latest_version(t)
    assert tip == 22
    mdir = os.path.join(t, M._MANIFESTS)
    manifests = sorted(
        int(f[1:7]) for f in os.listdir(mdir) if f.startswith("v")
    )
    # vacuum kept a suffix window; every retained version still
    # resolves ALL its shards and reads end to end
    assert manifests[-1] == tip and len(manifests) >= 5
    for v in manifests:
        files = M._load_files(t, M._read_manifest(t, v))
        assert set(M._read_manifest(t, v)["dirs"]) == set(files)
    oldest = manifests[0]
    assert M.read_version(spark, t, oldest).count() > 0
    got = M.read_version(spark, t)
    assert got.count() > 0
    # merged keys hold the merged value exactly once each
    merged_keys = [r.o_orderkey for r in o.limit(5).collect()]
    mk = got.filter(F.col("o_orderkey").isin(merged_keys))
    assert mk.count() == 5
    assert mk.agg(F.min("o_totalprice")).first()[0] == 9.0
    # the tip manifest carries refs only — no inline entry payload
    with open(M._manifest_path(t, tip)) as fh:
        m = json.load(fh)
    assert "files" not in m and set(m["files_ref"]) == set(m["dirs"])
    # orphaned shards were reclaimed: on-disk shard count is bounded
    # by the retained versions' references (plus nothing else)
    live = {
        r["shard"]
        for v in manifests
        for r in M._read_manifest(t, v).get("files_ref", {}).values()
    }
    on_disk = {
        f
        for f in os.listdir(mdir)
        if f.startswith(M._SHARD_PREFIX) and f.endswith(".json")
    }
    assert live <= on_disk
    # stale shards may linger only from the pre-latest-vacuum era;
    # after one more vacuum with zero retention they are exactly live
    M.vacuum(t, keep_last=len(manifests), retention_seconds=0.0)
    on_disk2 = {
        f
        for f in os.listdir(mdir)
        if f.startswith(M._SHARD_PREFIX) and f.endswith(".json")
    }
    assert on_disk2 == live


def test_checkpointed_200_version_history(spark, tmp_path):
    """r10 manifest-log checkpoints: 200+ versions resolve timestamp
    travel and DESCRIBE HISTORY through block summaries — byte-
    identical to the per-manifest linear walk, at O(versions/10) file
    opens — and vacuum prunes checkpoints with the manifests they
    summarize (stale ones are ignored, never resurrect expired
    versions)."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(200)], "k int, p double"
    )
    for _ in range(4):
        M.commit(df.coalesce(1), t)
    # metadata-only versions build deep history fast
    for i in range(196):
        M.delete_where(t, [("k", "==", 100000 + i)])  # no-op tombstones
    tip = M.latest_version(t)
    assert tip == 200
    mdir = os.path.join(t, M._MANIFESTS)
    ckpts = sorted(
        int(f[5:-5])
        for f in os.listdir(mdir)
        if f.startswith("ckpt-")
    )
    assert ckpts == list(range(10, 201, 10))

    # history: checkpoint-served rows byte-identical to the linear walk
    fast = M.history(t)
    orig_read_ck = M._read_checkpoint
    M._read_checkpoint = lambda *_a, **_k: None
    try:
        linear = M.history(t)
    finally:
        M._read_checkpoint = orig_read_ck
    assert fast == linear and len(fast) == 200

    # timestamp travel resolves identically through checkpoints, and
    # opens O(versions/10) manifests, not O(versions)
    ts_of = {
        v: M._read_manifest(t, v)["ts"] for v in (1, 7, 95, 150, 200)
    }
    orig_read = M._read_manifest
    opens = {"n": 0}

    def counting(table_dir, version):
        opens["n"] += 1
        return orig_read(table_dir, version)

    M._read_manifest = counting
    try:
        for v, ts in ts_of.items():
            assert M.version_as_of(t, ts) == v
            if v > 1:
                assert M.version_as_of(t, ts - 5e-7) == v - 1
    finally:
        M._read_manifest = orig_read
    # deepest resolution (v1) walked 20 blocks via ckpt files; the
    # budget is blocks + slack, nowhere near the 200 manifests
    assert opens["n"] <= 40, opens["n"]

    # a STALE checkpoint (crash window) is ignored, not trusted
    import json as _json

    fake = M._checkpoint_path(t, 10)
    with open(fake) as fh:
        good = _json.load(fh)
    M.vacuum(t, keep_last=50, retention_seconds=0.0)
    assert not os.path.exists(fake)  # pruned with its manifests
    with open(fake, "w") as fh:
        _json.dump(good, fh)  # resurrect a stale ckpt by hand
    with pytest.raises(M.VersionNotFoundError):
        M.version_as_of(t, ts_of[7])  # expired stays expired
    assert [r["version"] for r in M.history(t)] == list(
        range(200, 150, -1)
    )
    os.unlink(fake)  # drop the hand-resurrected stale ckpt
    # retained checkpoints still serve the fast path
    kept_ck = sorted(
        int(f[5:-5])
        for f in os.listdir(mdir)
        if f.startswith("ckpt-")
    )
    assert kept_ck and all(cv - 9 >= 151 for cv in kept_ck)
    assert M.version_as_of(t, ts_of[200]) == 200
    assert M.read_version(spark, t, 151).count() == 800


def test_partial_checkpoint_falls_back(spark, tmp_path):
    """A ckpt file whose summaries miss a covered version (corrupt /
    foreign) is IGNORED by both consumers — per-manifest fallback, no
    wrong rows, no infinite loop in version_as_of."""
    import json as _json

    t = str(tmp_path / "tbl")
    M.commit(spark.createDataFrame([(1,)], "k int").coalesce(1), t)
    for i in range(11):
        M.delete_where(t, [("k", "==", 1000 + i)])
    ck = M._checkpoint_path(t, 10)
    assert os.path.exists(ck)
    with open(ck) as fh:
        payload = _json.load(fh)
    del payload["summaries"]["10"]  # corrupt: drop its own version
    with open(ck, "w") as fh:
        _json.dump(payload, fh)
    assert M._read_checkpoint(t, 10) is None  # fails validation
    ts7 = M._read_manifest(t, 7)["ts"]
    assert M.version_as_of(t, ts7) == 7  # resolves, terminates
    assert [r["version"] for r in M.history(t)] == list(
        range(12, 0, -1)
    )
