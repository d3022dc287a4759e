"""End-to-end CDC loop: manifest-log changefeed → readStream →
foreachBatch MERGE replica.  A versioned table evolves through
commits; each version step's ``changefeed_rows`` lands in a feed
directory; a file stream applies the feed to a plain-Parquet replica,
which must converge to ``read_version(latest)`` exactly — including
deletes and a remove-then-re-add folded into one micro-batch."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from finance_etl_pipeline_spark.operators import manifest as M
from finance_etl_pipeline_spark.sources.readers import table
from finance_etl_pipeline_spark.streaming.sink import (
    apply_changefeed_each_batch,
)


def _drain(stream_df, spark, replica, keys, ckpt):
    q = (
        apply_changefeed_each_batch(stream_df, spark, replica, keys)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()


def _assert_replica_equals_version(spark, replica, tbl, version):
    got = spark.read.parquet(replica)
    want = M.read_version(spark, tbl, version)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_changefeed_stream_converges_replica(spark, sf_dir, tmp_path):
    tbl = str(tmp_path / "tbl")
    feed = str(tmp_path / "feed")
    replica = str(tmp_path / "replica")
    os.makedirs(feed)

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    # v1: keys %3 in {0,1}
    M.commit(o.filter(F.col("o_orderkey") % 3 <= 1), tbl)
    # v2: overwrite — %3==1 removed, %3==2 added, %5==0 changed
    v2 = o.filter(F.col("o_orderkey") % 3 != 1).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    M.commit(v2, tbl, mode="overwrite")
    # v3: overwrite — re-add some of the keys v2 removed (%3==1, %7==0),
    # drop the %3==2 slice again
    v3 = o.filter(
        (F.col("o_orderkey") % 3 == 0)
        | ((F.col("o_orderkey") % 3 == 1) & (F.col("o_orderkey") % 7 == 0))
    )
    M.commit(v3, tbl, mode="overwrite")

    keys = ["o_orderkey"]
    feed_schema = M.changefeed_rows(spark, tbl, keys, 1, 2).schema
    # one feed file set per version step — the 0→1 step IS the
    # bootstrap snapshot (all 'added'); maxFilesPerTrigger keeps
    # steps in separate micro-batches for this first drain
    M.changefeed_rows(spark, tbl, keys, 0, 1).coalesce(1).write.parquet(
        os.path.join(feed, "step0")
    )
    M.changefeed_rows(spark, tbl, keys, 1, 2).coalesce(1).write.parquet(
        os.path.join(feed, "step1")
    )
    M.changefeed_rows(spark, tbl, keys, 2, 3).coalesce(1).write.parquet(
        os.path.join(feed, "step2")
    )

    stream = (
        spark.readStream.schema(feed_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed + "/step*")
    )
    _drain(stream, spark, replica, keys, str(tmp_path / "ck1"))
    _assert_replica_equals_version(spark, replica, tbl, 3)


def test_changefeed_multiple_steps_in_one_batch(spark, sf_dir, tmp_path):
    """Both version steps land in ONE micro-batch: per-key resolution
    by highest feed version must make remove-then-re-add and
    add-then-remove sequences converge to the final state, not to an
    arbitrary interleaving."""
    tbl = str(tmp_path / "tbl")
    feed = str(tmp_path / "feed")
    replica = str(tmp_path / "replica")
    os.makedirs(feed)

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    M.commit(o.filter(F.col("o_orderkey") % 4 == 0), tbl)
    # v2 adds the %4==1 slice...
    M.commit(o.filter(F.col("o_orderkey") % 4 <= 1), tbl, mode="overwrite")
    # ...v3 removes it again and bumps some retained rows
    v3 = o.filter(F.col("o_orderkey") % 4 == 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 9 == 0, F.col("o_totalprice") * 2.0
        ).otherwise(F.col("o_totalprice")),
    )
    M.commit(v3, tbl, mode="overwrite")

    keys = ["o_orderkey"]
    feed_schema = M.changefeed_rows(spark, tbl, keys, 1, 2).schema
    for a, b in ((0, 1), (1, 2), (2, 3)):
        M.changefeed_rows(spark, tbl, keys, a, b).coalesce(1).write.parquet(
            os.path.join(feed, f"step{a}")
        )
    stream = spark.readStream.schema(feed_schema).parquet(feed + "/step*")
    _drain(stream, spark, replica, keys, str(tmp_path / "ck"))
    _assert_replica_equals_version(spark, replica, tbl, 3)


def test_changefeed_rows_shape(spark, sf_dir, tmp_path):
    """Feed contract: deltas only, removed rows are NULL-payload delete
    markers stamped with the target version."""
    tbl = str(tmp_path / "tbl")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    M.commit(o.filter(F.col("o_orderkey") % 2 == 0), tbl)
    M.commit(o.filter(F.col("o_orderkey") % 4 == 0), tbl, mode="overwrite")
    feed = M.changefeed_rows(spark, tbl, ["o_orderkey"], 1, 2)
    assert feed.columns == [
        "change_type",
        "version",
        "o_orderkey",
        "o_totalprice",
    ]
    assert feed.filter(F.col("change_type") == "unchanged").count() == 0
    removed = feed.filter(F.col("change_type") == "removed")
    n_removed_expected = o.filter(
        (F.col("o_orderkey") % 2 == 0) & (F.col("o_orderkey") % 4 != 0)
    ).count()
    assert removed.count() == n_removed_expected
    assert removed.filter(F.col("o_totalprice").isNotNull()).count() == 0
    assert feed.filter(F.col("version") != 2).count() == 0


def test_replica_swap_recovers_from_crash_window(spark, sf_dir, tmp_path):
    """Crash-safety of the replica swap: simulate a crash between the
    two renames (replica parked at ._cdc_old, nothing at path, plus a
    stale tmp) — the retried batch must restore the replica first and
    still converge, instead of merging into an empty target (silent
    state loss) or wedging on ENOTEMPTY."""
    tbl = str(tmp_path / "tbl")
    feed = str(tmp_path / "feed")
    replica = str(tmp_path / "replica")
    os.makedirs(feed)

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    M.commit(o.filter(F.col("o_orderkey") % 3 == 0), tbl)
    M.commit(o.filter(F.col("o_orderkey") % 3 <= 1), tbl, mode="overwrite")

    keys = ["o_orderkey"]
    feed_schema = M.changefeed_rows(spark, tbl, keys, 1, 2).schema
    M.changefeed_rows(spark, tbl, keys, 0, 1).coalesce(1).write.parquet(
        os.path.join(feed, "step0")
    )
    stream = spark.readStream.schema(feed_schema).parquet(feed + "/step*")
    _drain(stream, spark, replica, keys, str(tmp_path / "ck1"))
    _assert_replica_equals_version(spark, replica, tbl, 1)

    # simulate the crash window: replica renamed aside, stale tmp left
    os.rename(replica, replica + "._cdc_old")
    os.makedirs(replica + "._cdc_tmp")
    with open(os.path.join(replica + "._cdc_tmp", "junk"), "w") as fh:
        fh.write("partial")

    M.changefeed_rows(spark, tbl, keys, 1, 2).coalesce(1).write.parquet(
        os.path.join(feed, "step1")
    )
    # fresh checkpoint replays the WHOLE feed (bootstrap + step1) in
    # one batch — recovery plus an idempotent re-merge
    _drain(stream, spark, replica, keys, str(tmp_path / "ck2"))
    _assert_replica_equals_version(spark, replica, tbl, 2)
    assert not os.path.exists(replica + "._cdc_old")
