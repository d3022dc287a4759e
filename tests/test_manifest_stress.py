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
