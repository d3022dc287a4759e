"""Sharded manifest log (format v2): commit cost must be O(changed
dirs/files), never O(all files) — the property that keeps a 10⁶-file
table committable.  Per-file entries live in immutable per-dir shard
files (``_manifests/s-*.json``); each version manifest carries only
{shard, n, rows} refs and a deduplicated schema list.

Reference parity note: the reference pipeline (single-process pandas)
has no table format at all; this layer's shape follows the PUBLIC
Iceberg manifest-list / manifest-file split and Delta's checkpoint
idea, re-expressed on plain JSON + parquet.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from finance_etl_pipeline_spark.operators import manifest as M
from finance_etl_pipeline_spark.sources.readers import table


def _manifest_bytes(t: str, v: int) -> int:
    return os.path.getsize(M._manifest_path(t, v))


def _shards(t: str) -> set[str]:
    mdir = os.path.join(t, M._MANIFESTS)
    return {
        f
        for f in os.listdir(mdir)
        if f.startswith(M._SHARD_PREFIX) and f.endswith(".json")
    }


def _manifest_json(t: str, v: int) -> dict:
    with open(M._manifest_path(t, v)) as fh:
        return json.load(fh)


def test_append_writes_one_shard_and_no_inline_entries(
    spark, sf_dir, tmp_path
):
    """An append to an N-dir table serializes exactly ONE new shard
    (the new dir's entries) and a manifest with zero per-file stats
    inline — every prior dir is carried by shard NAME."""
    t = str(tmp_path / "tbl")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    for k in range(4):
        M.commit(o.filter(F.col("o_orderkey") % 4 == k).coalesce(2), t)
    before = _shards(t)
    refs_before = _manifest_json(t, 4)["files_ref"]
    M.commit(o.limit(5).coalesce(1), t)
    after = _shards(t)
    assert len(after - before) == 1  # exactly the new dir's shard
    m5 = _manifest_json(t, 5)
    # carried dirs reference the SAME shard files as v4 — by name,
    # not by re-serialization
    for d, r in refs_before.items():
        assert m5["files_ref"][d] == r
    # no O(#files) payload inside the manifest itself
    assert "files" not in m5
    assert not any("stats" in json.dumps(v) for v in m5["files_ref"].values())
    # and the read path still sees every row
    assert M.read_version(spark, t).count() == o.count() + 5


def test_commit_bytes_scale_with_delta_not_table(spark, sf_dir, tmp_path):
    """The written-bytes cost of one identical append must not grow
    with the number of PRE-EXISTING file entries: a table with ~6×
    the files pays only the O(#dirs) ref growth (bounded small), not
    an O(#files) re-serialization of stats."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    delta = o.limit(7).coalesce(1)

    def build(t: str, n_dirs: int, files_per_dir: int) -> int:
        for k in range(n_dirs):
            M.commit(
                o.filter(F.col("o_orderkey") % n_dirs == k).repartition(
                    files_per_dir
                ),
                t,
            )
        before = _shards(t)
        M.commit(delta, t)
        new_shard_bytes = sum(
            os.path.getsize(os.path.join(t, M._MANIFESTS, s))
            for s in _shards(t) - before
        )
        return _manifest_bytes(t, n_dirs + 1) + new_shard_bytes

    small = build(str(tmp_path / "small"), 4, 3)  # 12 files
    big = build(str(tmp_path / "big"), 12, 6)  # 72 files
    # inline-format cost of the big table's full file map, for scale:
    big_full = sum(
        os.path.getsize(os.path.join(str(tmp_path / "big"), M._MANIFESTS, s))
        for s in _shards(str(tmp_path / "big"))
    )
    # the append's cost grows by the per-dir ref overhead only —
    # far below re-serializing the 72-file stats map every commit
    assert big - small < 0.25 * big_full
    assert big < 3 * small


def test_metadata_only_delete_writes_zero_shards(spark, sf_dir, tmp_path):
    t = str(tmp_path / "tbl")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    M.commit(o.coalesce(4), t)
    before = _shards(t)
    M.delete_where(t, [("o_orderkey", "<", 10)])
    assert _shards(t) == before  # pure metadata commit
    assert M.read_version(spark, t).filter(F.col("o_orderkey") < 10).count() == 0


def test_merge_rewrites_only_touched_dirs_shards(spark, sf_dir, tmp_path):
    """merge_into re-serializes shards ONLY for dirs holding touched
    files (plus the new rewrite dir); untouched dirs keep their shard
    ref byte-identical."""
    t = str(tmp_path / "tbl")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    lo = o.agg(F.min("o_orderkey")).first()[0]
    hi = o.agg(F.max("o_orderkey")).first()[0]
    # two range-disjoint dirs: a merge keyed into the low range can
    # never touch the high dir
    M.commit(o.filter(F.col("o_orderkey") <= (lo + hi) // 2).coalesce(2), t)
    M.commit(o.filter(F.col("o_orderkey") > (lo + hi) // 2).coalesce(2), t)
    m2 = _manifest_json(t, 2)
    high_dir = m2["dirs"][1]
    src = o.filter(F.col("o_orderkey") == lo).withColumn(
        "o_totalprice", F.lit(1.0)
    )
    M.merge_into(spark, t, src, ["o_orderkey"])
    m3 = _manifest_json(t, 3)
    assert m3["files_ref"][high_dir] == m2["files_ref"][high_dir]
    got = M.read_version(spark, t)
    assert got.filter(F.col("o_orderkey") == lo).first()["o_totalprice"] == 1.0
    assert got.count() == o.count()


def test_schema_dedup_one_copy_for_single_schema_table(
    spark, sf_dir, tmp_path
):
    t = str(tmp_path / "tbl")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    for k in range(5):
        M.commit(o.limit(3), t)
    m = _manifest_json(t, 5)
    c = m["dir_schemas_v2"]
    assert len(c["schemas"]) == 1  # one copy, five dirs point at it
    assert len(c["by_dir"]) == 5
    # evolution adds exactly one more unique schema
    M.commit(o.withColumn("extra", F.lit(1)).limit(2), t)
    c = _manifest_json(t, 6)["dir_schemas_v2"]
    assert len(c["schemas"]) == 2
    assert M.read_version(spark, t, 5).columns == ["o_orderkey", "o_totalprice"]
    assert "extra" in M.read_version(spark, t, 6).columns


def test_legacy_inline_manifest_reads_and_upgrades(spark, sf_dir, tmp_path):
    """A pre-sharding manifest (inline ``files``/``dir_schemas``)
    stays readable everywhere, and the NEXT publish re-shards it
    wholesale — old versions remain readable after the upgrade."""
    t = str(tmp_path / "tbl")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    M.commit(o.coalesce(2), t)
    # rewrite v1 to the legacy inline format by hand
    m = _manifest_json(t, 1)
    files = M._load_files(t, m)
    schemas = M._load_dir_schemas(m)
    legacy = {
        "version": 1,
        "ts": m["ts"],
        "mode": m["mode"],
        "dirs": m["dirs"],
        "files": files,
        "dir_schemas": schemas,
        "partitioned_dirs": m.get("partitioned_dirs", {}),
        "deletes": m.get("deletes", []),
        "schema": m["schema"],
        "txns": m.get("txns", {}),
    }
    path = M._manifest_path(t, 1)
    os.remove(path)
    with open(path, "w") as fh:
        json.dump(legacy, fh)
    for s in _shards(t):
        os.remove(os.path.join(t, M._MANIFESTS, s))
    # readable in the legacy form
    assert M.read_version(spark, t, 1).count() == o.count()
    assert M.count_rows(t, 1) == o.count()
    # next publish re-shards: v2 carries refs, and both versions read
    M.commit(o.limit(4), t)
    m2 = _manifest_json(t, 2)
    assert "files" not in m2 and set(m2["files_ref"]) == set(m2["dirs"])
    assert M.read_version(spark, t, 2).count() == o.count() + 4
    assert M.read_version(spark, t, 1).count() == o.count()


def test_vacuum_reclaims_unreferenced_shards(spark, sf_dir, tmp_path):
    t = str(tmp_path / "tbl")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    M.commit(o.coalesce(2), t)
    shards_v1 = _shards(t)
    M.commit(o.limit(3), t, mode="overwrite")
    # v1's shards are referenced only by the expired version
    M.vacuum(t, keep_last=1, retention_seconds=0.0)
    left = _shards(t)
    assert not (shards_v1 & left)  # dead shards reclaimed
    live_refs = {
        r["shard"] for r in _manifest_json(t, 2)["files_ref"].values()
    }
    assert live_refs <= left  # live shards survive
    assert M.read_version(spark, t).count() == 3


def test_vacuum_retention_protects_in_flight_shards(spark, sf_dir, tmp_path):
    """A publish writes its shards BEFORE linking the manifest; a
    concurrent vacuum must not reap those young unreferenced shards."""
    t = str(tmp_path / "tbl")
    o = table(spark, sf_dir, "orders").select("o_orderkey")
    M.commit(o.limit(3), t)
    # simulate the window: a shard exists, its manifest does not yet
    stray = os.path.join(t, M._MANIFESTS, f"{M._SHARD_PREFIX}inflight.json")
    with open(stray, "w") as fh:
        json.dump({"dir": "data/commit-x", "entries": []}, fh)
    M.vacuum(t, keep_last=1)  # default retention: survives
    assert os.path.exists(stray)
    M.vacuum(t, keep_last=1, retention_seconds=0.0)
    assert not os.path.exists(stray)


def test_count_rows_and_history_from_refs_without_shards(
    spark, sf_dir, tmp_path
):
    """count_rows/history answer from the O(#dirs) ref summaries —
    delete every shard and they must still answer (the read path, by
    contrast, needs the shards)."""
    t = str(tmp_path / "tbl")
    o = table(spark, sf_dir, "orders").select("o_orderkey")
    n = o.count()
    M.commit(o.repartition(3), t)
    M.commit(o.limit(5), t)
    for s in _shards(t):
        os.remove(os.path.join(t, M._MANIFESTS, s))
    M._SHARD_CACHE.clear()
    assert M.count_rows(t) == n + 5
    h = M.history(t)
    assert [e["version"] for e in h] == [2, 1]
    assert h[0]["n_rows"] == n + 5 and h[0]["n_files"] == 4
    assert h[1]["n_rows"] == n and h[1]["n_files"] == 3
