"""MERGE INTO as one manifest version + exactly-once streaming
commits: row semantics (update/insert/delete, CDC compaction),
file-granularity copy-on-write (untouched files carry over by
reference), snapshot conflict-abort, txn (app_id, batch_id)
idempotence under micro-batch replay, and the end-to-end
changefeed → manifest-replica loop with a forced replay."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from finance_etl_pipeline_spark.operators import manifest as M
from finance_etl_pipeline_spark.sources.readers import table
from finance_etl_pipeline_spark.streaming.sink import (
    append_stream_to_manifest,
    apply_changefeed_to_manifest_each_batch,
)


def _orders(spark, sf_dir):
    return table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


def _as_map(df):
    return {r["o_orderkey"]: tuple(r)[1:] for r in df.collect()}


def test_merge_into_update_insert_delete(spark, sf_dir, tmp_path):
    t = str(tmp_path / "tbl")
    o = _orders(spark, sf_dir)
    even = o.filter(F.col("o_orderkey") % 2 == 0)
    M.commit(even.repartitionByRange(4, "o_orderkey"), t)

    src = (
        o.filter(F.col("o_orderkey") % 3 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2.0)
        .withColumn("__del", F.col("o_orderkey") % 9 == 0)
    )
    v = M.merge_into(spark, t, src, ["o_orderkey"], delete_col="__del")
    assert v == 2

    got = _as_map(M.read_version(spark, t))
    want = {}
    for r in o.collect():
        k, status, price = r["o_orderkey"], r["o_orderstatus"], r["o_totalprice"]
        in_src = k % 3 == 0
        deleted = in_src and k % 9 == 0
        if k % 2 == 0 and not in_src:
            want[k] = (status, price)
        elif in_src and not deleted:
            want[k] = (status, price * 2.0)
    assert got == want
    # time travel: the pre-merge snapshot is untouched
    assert _as_map(M.read_version(spark, t, 1)) == _as_map(even)


def test_merge_rewrites_only_touched_files(spark, sf_dir, tmp_path):
    """File-granularity COW: a merge whose keys land in one range
    partition must carry every other file over BY REFERENCE (same
    path in the new manifest), not rewrite the table."""
    t = str(tmp_path / "tbl")
    o = _orders(spark, sf_dir)
    M.commit(o.repartitionByRange(6, "o_orderkey"), t)
    before = set(M.files_for_version(t, 1))
    assert len(before) == 6

    lo = o.agg(F.min("o_orderkey")).first()[0]
    src = o.filter(F.col("o_orderkey") == lo).withColumn(
        "o_totalprice", F.lit(1.0)
    )
    M.merge_into(spark, t, src, ["o_orderkey"])
    after = set(M.files_for_version(t, 2))
    carried = before & after
    assert len(before - after) == 1  # exactly one file rewritten
    assert len(carried) == 5  # the rest carried by reference
    got = M.read_version(spark, t)
    assert got.count() == o.count()
    assert got.filter(F.col("o_orderkey") == lo).first()["o_totalprice"] == 1.0


def test_merge_conflict_aborts_on_moved_tip(spark, sf_dir, tmp_path):
    t = str(tmp_path / "tbl")
    o = _orders(spark, sf_dir)
    M.commit(o.filter(F.col("o_orderkey") % 2 == 0), t)

    real_publish = M._publish

    def racing_publish(table_dir, build):
        M._publish = real_publish
        M.commit(o.filter(F.col("o_orderkey") % 2 == 1).limit(5), t)
        return real_publish(table_dir, build)

    M._publish = racing_publish
    try:
        with pytest.raises(M.ConcurrentTableModificationError):
            M.merge_into(
                spark,
                t,
                o.filter(F.col("o_orderkey") % 10 == 0),
                ["o_orderkey"],
            )
    finally:
        M._publish = real_publish
    assert M.latest_version(t) == 2  # only the interleaved append landed


def test_merge_rejects_schema_drift_and_dup_keys(spark, sf_dir, tmp_path):
    from finance_etl_pipeline_spark.operators.merge import (
        DuplicateMergeKeysError,
    )

    t = str(tmp_path / "tbl")
    o = _orders(spark, sf_dir)
    M.commit(o.limit(50), t)
    with pytest.raises(ValueError, match="lacks table column"):
        M.merge_into(
            spark, t, o.select("o_orderkey", "o_totalprice"), ["o_orderkey"]
        )
    with pytest.raises(ValueError, match="cannot add columns"):
        M.merge_into(
            spark, t, o.withColumn("extra", F.lit(1)), ["o_orderkey"]
        )
    dup = o.limit(5).unionAll(o.limit(5))
    with pytest.raises(DuplicateMergeKeysError):
        M.merge_into(spark, t, dup, ["o_orderkey"])


def test_txn_commit_is_idempotent_and_survives_rewrites(
    spark, sf_dir, tmp_path
):
    t = str(tmp_path / "tbl")
    o = _orders(spark, sf_dir)
    b0 = o.limit(10)
    b1 = o.limit(25)

    v = M.commit(b0, t, txn=("app", 0))
    assert v == 1
    # replay of batch 0: NO-OP — same version, same rows, no orphan dir
    assert M.commit(b0, t, txn=("app", 0)) == 1
    assert M.latest_version(t) == 1
    assert M.read_version(spark, t).count() == 10
    data_dirs = os.listdir(os.path.join(t, "data"))
    assert len(data_dirs) == 1

    # the next batch advances; an older batch id replays as no-op too
    assert M.commit(b1, t, txn=("app", 1)) == 2
    assert M.commit(b0, t, txn=("app", 0)) == 2
    # a DIFFERENT writer app is independent
    assert M.commit(b0, t, txn=("other", 0)) == 3

    # the txns map survives delete/update/compact/overwrite
    M.delete_where(t, [("o_totalprice", "<", 0.0)])
    M.update_where(
        spark, t, [("o_orderkey", ">=", 0)], {"o_totalprice": F.lit(1.0)}
    )
    M.compact_table(spark, t, target_bytes=64 * 1024)
    M.commit(b1, t, mode="overwrite")
    tip = M.latest_version(t)
    with open(os.path.join(t, "_manifests", f"v{tip:06d}.json")) as fh:
        txns = json.load(fh)["txns"]
    assert txns == {"app": 1, "other": 0}
    assert M.commit(b0, t, txn=("app", 1)) == tip  # still a replay


def test_merge_into_txn_replay_is_noop(spark, sf_dir, tmp_path):
    t = str(tmp_path / "tbl")
    o = _orders(spark, sf_dir)
    M.commit(o.filter(F.col("o_orderkey") % 2 == 0), t)
    src = o.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.lit(5.0)
    )
    v = M.merge_into(spark, t, src, ["o_orderkey"], txn=("cdc", 7))
    assert v == 2
    assert M.merge_into(spark, t, src, ["o_orderkey"], txn=("cdc", 7)) == 2
    assert M.latest_version(t) == 2
    n5 = M.read_version(spark, t).filter(F.col("o_totalprice") == 5.0).count()
    assert n5 == src.count()


def test_append_stream_exactly_once_under_forced_replay(
    spark, sf_dir, tmp_path
):
    """End to end: a file stream appends into a manifest table via
    availableNow; restarting with a FRESH checkpoint replays batch 0
    with the same (app_id, batch_id) — the table must not change."""
    src_dir = str(tmp_path / "in")
    t = str(tmp_path / "tbl")
    os.makedirs(src_dir)
    o = _orders(spark, sf_dir).limit(200)
    o.coalesce(1).write.parquet(os.path.join(src_dir, "f0"))

    def drain(ckpt):
        stream = spark.readStream.schema(o.schema).parquet(src_dir + "/f*")
        q = (
            append_stream_to_manifest(stream, t, "pipeline-x")
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()

    drain("ck1")
    assert M.latest_version(t) == 1
    assert M.read_version(spark, t).count() == 200

    drain("ck2")  # fresh checkpoint = the crash-replay shape
    assert M.latest_version(t) == 1  # no duplicate version
    assert M.read_version(spark, t).count() == 200


def test_changefeed_to_manifest_replica_converges_and_replays(
    spark, sf_dir, tmp_path
):
    """The exactly-once CDC loop: manifest source table → changefeed
    files → streaming merge_into a manifest REPLICA.  The replica must
    equal read_version(latest) of the source, and a forced replay
    (fresh checkpoint over the same feed) must be a no-op."""
    src_tbl = str(tmp_path / "src")
    rep_tbl = str(tmp_path / "rep")
    feed = str(tmp_path / "feed")
    os.makedirs(feed)

    o = _orders(spark, sf_dir)
    M.commit(o.filter(F.col("o_orderkey") % 3 == 0), src_tbl)
    v2 = o.filter(F.col("o_orderkey") % 3 != 1).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    M.commit(v2, src_tbl, mode="overwrite")

    keys = ["o_orderkey"]
    feed_schema = M.changefeed_rows(spark, src_tbl, keys, 1, 2).schema
    M.changefeed_rows(spark, src_tbl, keys, 0, 1).coalesce(1).write.parquet(
        os.path.join(feed, "step0")
    )
    M.changefeed_rows(spark, src_tbl, keys, 1, 2).coalesce(1).write.parquet(
        os.path.join(feed, "step1")
    )

    def drain(ckpt):
        stream = (
            spark.readStream.schema(feed_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed + "/step*")
        )
        q = (
            apply_changefeed_to_manifest_each_batch(
                stream, spark, rep_tbl, keys, "cdc-loop"
            )
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()

    drain("ck1")
    got = M.read_version(spark, rep_tbl)
    want = M.read_version(spark, src_tbl, 2)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    tip = M.latest_version(rep_tbl)
    drain("ck2")  # replay the whole feed with the same batch ids
    assert M.latest_version(rep_tbl) == tip
    got2 = M.read_version(spark, rep_tbl)
    assert got2.count() == want.count()
    assert got2.exceptAll(want).count() == 0


def test_vacuum_reclaims_merge_rewritten_files(spark, sf_dir, tmp_path):
    """merge_into drops file ENTRIES while the dir stays live, so
    vacuum must sweep at file granularity: the rewritten file's bytes
    go away after retention, carried-over files and the merged dir
    survive, and every retained version still reads correctly."""
    t = str(tmp_path / "tbl")
    o = _orders(spark, sf_dir)
    M.commit(o.repartitionByRange(5, "o_orderkey"), t)
    lo = o.agg(F.min("o_orderkey")).first()[0]
    M.merge_into(
        spark,
        t,
        o.filter(F.col("o_orderkey") == lo).withColumn(
            "o_totalprice", F.lit(9.0)
        ),
        ["o_orderkey"],
    )
    # the rewritten file: referenced by v1, not by v2
    v1_files = set(M.files_for_version(t, 1))
    v2_files = set(M.files_for_version(t, 2))
    dead = v1_files - v2_files
    assert len(dead) == 1
    # keep_last=2: v1 still retained → its file must SURVIVE
    removed = M.vacuum(t, keep_last=2, retention_seconds=0.0)
    assert removed == []
    assert all(os.path.exists(f) for f in dead)
    # keep_last=1: only v2 retained → the dead file is reclaimed,
    # carried-over files and the live dir stay
    removed = M.vacuum(t, keep_last=1, retention_seconds=0.0)
    dead_rel = {os.path.relpath(f, t) for f in dead}
    assert set(removed) == dead_rel
    assert all(os.path.exists(f) for f in v2_files)
    got = M.read_version(spark, t)
    assert got.count() == o.count()
    assert got.filter(F.col("o_orderkey") == lo).first()["o_totalprice"] == 9.0


def test_merge_output_file_count_matches_touched(spark, sf_dir, tmp_path):
    """Small-file hygiene: rewriting one file emits ~one file, not
    shuffle-partition-count slivers."""
    t = str(tmp_path / "tbl")
    o = _orders(spark, sf_dir)
    M.commit(o.repartitionByRange(6, "o_orderkey"), t)
    lo = o.agg(F.min("o_orderkey")).first()[0]
    M.merge_into(
        spark,
        t,
        o.filter(F.col("o_orderkey") == lo).withColumn(
            "o_totalprice", F.lit(1.0)
        ),
        ["o_orderkey"],
    )
    m = M._read_manifest(t, 2)
    new_dir = m["dirs"][-1]
    assert len(M._load_files(t, m)[new_dir]) == 1


def test_concurrent_same_txn_commits_exactly_one_version(
    spark, sf_dir, tmp_path
):
    """Two instances of the SAME writer racing the SAME batch (the
    zombie-executor replay shape): the early check cannot see the
    other in flight, so the publish-time re-check must collapse the
    race — exactly one new version, rows landing once."""
    from concurrent.futures import ThreadPoolExecutor

    t = str(tmp_path / "tbl")
    o = _orders(spark, sf_dir)
    M.commit(o.limit(10), t)
    batch = o.filter(F.col("o_orderkey") % 7 == 0)

    def racer(_):
        return M.commit(batch, t, txn=("app", 3))

    with ThreadPoolExecutor(max_workers=2) as ex:
        versions = list(ex.map(racer, range(2)))
    assert M.latest_version(t) == 2
    assert set(versions) == {2}
    got = M.read_version(spark, t)
    assert got.count() == 10 + batch.count()  # no double-applied batch
    # the loser's orphaned data dir was cleaned up
    assert len(os.listdir(os.path.join(t, "data"))) == 2


def test_merge_into_non_normalized_table_dir_no_duplicates(
    spark, sf_dir, tmp_path
):
    """Regression: a non-normalized table_dir (/x/./tbl/, trailing
    slash, symlinked parent) must not break the touched-file match —
    input_file_name() reports RESOLVED absolute paths, so before the
    entry realpath every key of a merge into such a table came back
    duplicated: the rewritten files were appended while the originals
    were silently kept."""
    canon = str(tmp_path / "tbl")
    crooked = str(tmp_path) + "/./tbl/"
    link = str(tmp_path / "lnk")
    os.symlink(str(tmp_path), link)
    via_symlink = os.path.join(link, "tbl")

    o = _orders(spark, sf_dir).limit(100)
    M.commit(o.repartitionByRange(4, "o_orderkey"), crooked)

    keys = [r[0] for r in o.select("o_orderkey").limit(10).collect()]
    src = o.filter(F.col("o_orderkey").isin(keys)).withColumn(
        "o_totalprice", F.lit(-1.0)
    )
    M.merge_into(spark, crooked, src, ["o_orderkey"])
    # and once more through a symlinked parent — resolved vs logical
    more = o.filter(F.col("o_orderkey").isin(keys[:3])).withColumn(
        "o_totalprice", F.lit(-2.0)
    )
    M.merge_into(spark, via_symlink, more, ["o_orderkey"])

    got = M.read_version(spark, canon)
    assert got.count() == 100  # not 100 + 13 duplicated copies
    assert got.filter(F.col("o_totalprice") == -2.0).count() == 3
    assert (
        got.filter(F.col("o_totalprice") == -1.0).count() == len(keys) - 3
    )
    # per-key uniqueness, the actual corruption signature
    assert (
        got.groupBy("o_orderkey").count().filter("count > 1").count() == 0
    )


def test_insert_heavy_merge_does_not_collapse_to_one_file(
    spark, sf_dir, tmp_path
):
    """Scalability guard: a merge whose source is mostly INSERTS but
    touches one small file must size its output from the estimated
    output rows, not the touched-file count — coalesce(1) here used
    to fold the whole upsert into one task and one giant file."""
    t = str(tmp_path / "tbl")
    o = _orders(spark, sf_dir)
    # tiny table: ONE file holding 10 rows → rows_per_file = 10
    base = o.orderBy("o_orderkey").limit(10)
    M.commit(base.coalesce(1), t)
    assert sum(
        len(v) for v in M._load_files(t, M._read_manifest(t, 1)).values()
    ) == 1
    # source: those 10 updated + ~400 inserts — touches the 1 file
    src = (
        o.orderBy("o_orderkey")
        .limit(410)
        .withColumn("o_totalprice", F.col("o_totalprice") + 1.0)
    )
    n_src = src.count()
    M.merge_into(spark, t, src, ["o_orderkey"])
    m = M._read_manifest(t, 2)
    new_dir = m["dirs"][-1]
    # est ≈ 10 + 410 rows at 10 rows/file → ~42 output files, not 1
    assert len(M._load_files(t, m)[new_dir]) > 5
    got = M.read_version(spark, t)
    assert got.count() == n_src
    assert (
        got.groupBy("o_orderkey").count().filter("count > 1").count() == 0
    )


def test_merge_evolve_schema_widens_table(spark, sf_dir, tmp_path):
    """evolve_schema=True (Delta autoMerge): new source payload
    columns widen the logical schema; untouched files read them as
    NULL; time travel to the pre-merge version returns the OLD
    schema."""
    t = str(tmp_path / "tbl")
    o = _orders(spark, sf_dir)
    lo = o.agg(F.min("o_orderkey")).first()[0]
    hi = o.agg(F.max("o_orderkey")).first()[0]
    mid = (lo + hi) // 2
    # two range-disjoint files so one stays UNTOUCHED by the merge
    M.commit(o.filter(F.col("o_orderkey") <= mid).coalesce(1), t)
    M.commit(o.filter(F.col("o_orderkey") > mid).coalesce(1), t)

    src = (
        o.filter(F.col("o_orderkey") == lo)
        .withColumn("o_channel", F.lit("web"))
    )
    # without the flag: loud abort, nothing published
    with pytest.raises(ValueError, match="evolve_schema=True"):
        M.merge_into(spark, t, src, ["o_orderkey"])
    assert M.latest_version(t) == 2

    v = M.merge_into(spark, t, src, ["o_orderkey"], evolve_schema=True)
    assert v == 3
    got = M.read_version(spark, t)
    assert "o_channel" in got.columns
    assert got.count() == o.count()
    assert got.filter(F.col("o_orderkey") == lo).first()["o_channel"] == "web"
    # rows from the untouched file and unmatched rewritten rows: NULL
    assert got.filter(F.col("o_channel").isNull()).count() == o.count() - 1
    # pre-merge version keeps the old schema
    assert "o_channel" not in M.read_version(spark, t, 2).columns
    # type changes to existing columns still abort under the flag
    bad = src.withColumn("o_totalprice", F.lit("oops"))
    with pytest.raises(ValueError, match="type"):
        M.merge_into(spark, t, bad, ["o_orderkey"], evolve_schema=True)


def test_merge_evolve_insert_only_and_delete_col(spark, sf_dir, tmp_path):
    """Evolution composes with the CDC clauses: inserts carry the new
    column; delete-flagged keys vanish; the flag column itself is
    bookkeeping, never part of the widened schema."""
    t = str(tmp_path / "tbl")
    o = _orders(spark, sf_dir)
    base = o.filter(F.col("o_orderkey") % 2 == 0)
    M.commit(base, t)
    src = (
        o.filter(F.col("o_orderkey") % 10 <= 1)  # evens matched + odds new
        .withColumn("region", (F.col("o_orderkey") % 3).cast("long"))
        .withColumn("__del", F.col("o_orderkey") % 20 == 0)
    )
    M.merge_into(
        spark, t, src, ["o_orderkey"], delete_col="__del",
        evolve_schema=True,
    )
    got = M.read_version(spark, t)
    assert "region" in got.columns and "__del" not in got.columns
    exp_n = o.filter(
        ((F.col("o_orderkey") % 2 == 0) | (F.col("o_orderkey") % 10 <= 1))
        & ~(F.col("o_orderkey") % 20 == 0)
    ).count()
    assert got.count() == exp_n
    n_src_kept = o.filter(
        (F.col("o_orderkey") % 10 <= 1) & ~(F.col("o_orderkey") % 20 == 0)
    ).count()
    assert got.filter(F.col("region").isNotNull()).count() == n_src_kept


def test_append_stream_partitioned_ingest(spark, sf_dir, tmp_path):
    """Streaming ingest into a hive-partitioned manifest table: each
    micro-batch commits partition_by dirs, and the partition column
    prunes whole partitions from metadata while the stream appends."""
    src_dir = str(tmp_path / "in")
    t = str(tmp_path / "tbl")
    os.makedirs(src_dir)
    o = _orders(spark, sf_dir).limit(300)
    o.coalesce(1).write.parquet(os.path.join(src_dir, "f0"))

    stream = spark.readStream.schema(o.schema).parquet(src_dir + "/f*")
    q = (
        append_stream_to_manifest(
            stream, t, "part-ingest", partition_by=["o_orderstatus"]
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    assert M.latest_version(t) == 1
    got = M.read_version(spark, t)
    assert got.count() == 300
    assert sorted(got.columns) == sorted(o.columns)
    fs = M.files_for_version(t)
    assert fs and all("o_orderstatus=" in f for f in fs)
    pruned = M.files_for_version(t, where=[("o_orderstatus", "==", "F")])
    assert pruned and len(pruned) < len(fs)


def test_compact_preserves_partition_layout(spark, sf_dir, tmp_path):
    """OPTIMIZE on a fully hive-partitioned table keeps the layout:
    the compacted dir is partitioned by the same columns, pruning
    still answers from metadata, and rows are untouched.  Explicit
    zorder_cols override (caller chose stats-clustering)."""
    t = str(tmp_path / "tbl")
    o = _orders(spark, sf_dir)
    M.commit(
        o.filter(F.col("o_orderkey") % 2 == 0).repartition(4),
        t,
        partition_by=["o_orderstatus"],
    )
    M.commit(
        o.filter(F.col("o_orderkey") % 2 == 1).repartition(4),
        t,
        partition_by=["o_orderstatus"],
    )
    v = M.compact_table(spark, t, target_bytes=256 * 1024)
    m = M._read_manifest(t, v)
    assert len(m["dirs"]) == 1
    assert m["partitioned_dirs"][m["dirs"][0]] == ["o_orderstatus"]
    got = M.read_version(spark, t)
    assert got.count() == o.count()
    fs = M.files_for_version(t)
    pruned = M.files_for_version(t, where=[("o_orderstatus", "==", "F")])
    assert pruned and all("o_orderstatus=F" in f for f in pruned)
    assert len(pruned) < len(fs)
    # zorder overrides: layout becomes unpartitioned Morton clustering
    v2 = M.compact_table(
        spark, t, target_bytes=256 * 1024, zorder_cols=["o_orderkey"]
    )
    m2 = M._read_manifest(t, v2)
    assert m2["partitioned_dirs"] == {}
    assert M.read_version(spark, t).count() == o.count()
