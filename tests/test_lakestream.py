"""Streaming source over the manifest log: version-offset micro-
batches, incremental resume from the checkpoint, and loud failure on
non-append history."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from finance_etl_pipeline_spark.operators import manifest as M
from finance_etl_pipeline_spark.sources.lakestream import (
    ManifestTableDataSource,
)
from finance_etl_pipeline_spark.sources.readers import table


def _drain(spark, tbl, ckpt, out):
    """Parquet sink: the memory sink cannot recover from a checkpoint,
    and checkpoint resume is exactly what the incremental test needs."""
    q = (
        spark.readStream.format("manifest_table")
        .option("table_dir", tbl)
        .load()
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()


def test_stream_drains_versions_incrementally(spark, sf_dir, tmp_path):
    spark.dataSource.register(ManifestTableDataSource)
    tbl, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ck")
    out = str(tmp_path / "out")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    a = o.filter(F.col("o_orderkey") % 3 == 0)
    b = o.filter(F.col("o_orderkey") % 3 == 1)
    c = o.filter(F.col("o_orderkey") % 3 == 2)

    M.commit(a.repartition(3), tbl)
    M.commit(b.repartition(2), tbl)
    _drain(spark, tbl, ckpt, out)
    got = spark.read.parquet(out)
    assert got.count() == a.count() + b.count()
    assert got.exceptAll(a.unionByName(b)).count() == 0

    # a later commit: the SAME checkpoint resumes at version offset 2
    # and drains only v3's files — incremental, no replay
    M.commit(c.repartition(2), tbl)
    _drain(spark, tbl, ckpt, out)
    got = spark.read.parquet(out)
    assert got.count() == o.count()
    assert got.exceptAll(o).count() == 0
    # exactly-once: no key arrived twice
    assert got.select("o_orderkey").distinct().count() == o.count()


def test_stream_rejects_non_append_history(spark, sf_dir, tmp_path):
    spark.dataSource.register(ManifestTableDataSource)
    tbl, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ck")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    M.commit(o.limit(50), tbl)
    M.commit(o.limit(10), tbl, mode="overwrite")
    q = (
        spark.readStream.format("manifest_table")
        .option("table_dir", tbl)
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="append-only|mode="):
        q.awaitTermination(180)
    q.stop()


def test_stream_schema_comes_from_manifest(spark, sf_dir, tmp_path):
    spark.dataSource.register(ManifestTableDataSource)
    tbl = str(tmp_path / "tbl")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    M.commit(o.limit(20), tbl)
    stream = (
        spark.readStream.format("manifest_table")
        .option("table_dir", tbl)
        .load()
    )
    assert stream.columns == ["o_orderkey", "o_orderstatus", "o_totalprice"]
    assert dict(stream.dtypes)["o_totalprice"] == "double"


def test_starting_version_skips_history(spark, sf_dir, tmp_path):
    """starting_version=N treats versions 1..N as consumed: only
    later commits stream — the new-consumer escape from deep history."""
    spark.dataSource.register(ManifestTableDataSource)
    tbl = str(tmp_path / "tbl")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    a = o.filter(F.col("o_orderkey") % 2 == 0)
    b = o.filter(F.col("o_orderkey") % 2 == 1)
    M.commit(a, tbl)  # v1: history the consumer skips
    M.commit(b, tbl)  # v2: the only batch it should see
    q = (
        spark.readStream.format("manifest_table")
        .option("table_dir", tbl)
        .option("starting_version", 1)
        .load()
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    got = spark.read.parquet(out)
    assert got.count() == b.count()
    assert got.exceptAll(b).count() == 0


def test_expired_version_error_is_clear(spark, sf_dir, tmp_path):
    from finance_etl_pipeline_spark.operators.manifest import (
        VersionNotFoundError,
    )

    tbl = str(tmp_path / "tbl")
    o = table(spark, sf_dir, "orders").select("o_orderkey")
    M.commit(o.limit(5), tbl)
    M.commit(o.limit(5), tbl, mode="overwrite")
    M.vacuum(tbl, keep_last=1, retention_seconds=0.0)
    with pytest.raises(VersionNotFoundError, match="expired by vacuum|available: \\[2\\]"):
        M.read_version(spark, tbl, 1)


def test_stream_rejects_update_where_history(spark, sf_dir, tmp_path):
    """update_where publishes dir + tombstone in one version; an
    append-only stream passing it through would emit the rewritten
    rows as plain inserts while consumers keep the stale originals.
    The source must fail loudly instead (mode='update' + the
    tombstone-growth belt-and-braces check)."""
    spark.dataSource.register(ManifestTableDataSource)
    tbl, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ck")
    out = str(tmp_path / "out")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    M.commit(o.filter(F.col("o_orderkey") % 2 == 0).limit(50), tbl)
    M.update_where(
        spark,
        tbl,
        [("o_totalprice", ">", 0.0)],
        {"o_totalprice": F.col("o_totalprice") * 2.0},
    )
    with pytest.raises(Exception, match="append-only|mode=|tombstone"):
        _drain(spark, tbl, ckpt, out)


def test_stream_rejects_tombstone_growth_even_if_mode_lies(
    spark, sf_dir, tmp_path
):
    """Belt and braces: a manifest written by an older writer could
    carry mode='append' while growing the tombstone list — the
    deletes-length check must still reject it."""
    import json as _json
    import os as _os

    spark.dataSource.register(ManifestTableDataSource)
    tbl, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ck")
    out = str(tmp_path / "out")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    M.commit(o.limit(40), tbl)
    M.update_where(
        spark,
        tbl,
        [("o_totalprice", ">", 0.0)],
        {"o_totalprice": F.col("o_totalprice") + 1.0},
    )
    # forge the legacy shape: same payload, mode claims 'append'
    mpath = _os.path.join(tbl, "_manifests", "v000002.json")
    with open(mpath) as fh:
        m = _json.load(fh)
    m["mode"] = "append"
    with open(mpath, "w") as fh:
        _json.dump(m, fh)
    with pytest.raises(Exception, match="tombstone"):
        _drain(spark, tbl, ckpt, out)


def test_starting_timestamp_skips_history(spark, sf_dir, tmp_path):
    """starting_timestamp = the time-based starting_version: versions
    committed strictly before the instant are treated as consumed;
    one committed exactly AT it still streams (Delta semantics)."""
    import json as _json
    import os as _os

    spark.dataSource.register(ManifestTableDataSource)
    tbl = str(tmp_path / "tbl")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    a = o.filter(F.col("o_orderkey") % 3 == 0)
    b = o.filter(F.col("o_orderkey") % 3 == 1)
    M.commit(a, tbl)
    M.commit(b, tbl)
    ts = {}
    for v in (1, 2):
        with open(_os.path.join(tbl, "_manifests", f"v{v:06d}.json")) as fh:
            ts[v] = _json.load(fh)["ts"]

    def drain(opt_val, ckpt, out):
        q = (
            spark.readStream.format("manifest_table")
            .option("table_dir", tbl)
            .option("starting_timestamp", opt_val)
            .load()
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()

    # midpoint: v1 consumed, v2 due
    drain(
        str((ts[1] + ts[2]) / 2),
        str(tmp_path / "ck1"),
        str(tmp_path / "out1"),
    )
    got = spark.read.parquet(str(tmp_path / "out1"))
    assert got.count() == b.count()
    assert got.exceptAll(b).count() == 0

    # exactly AT v2's stamp: v2 still streams
    drain(str(ts[2]), str(tmp_path / "ck2"), str(tmp_path / "out2"))
    assert spark.read.parquet(str(tmp_path / "out2")).count() == b.count()

    # before everything: full history streams
    drain(str(ts[1] - 10), str(tmp_path / "ck3"), str(tmp_path / "out3"))
    assert spark.read.parquet(str(tmp_path / "out3")).count() == o.filter(
        F.col("o_orderkey") % 3 <= 1
    ).count()


def test_starting_version_latest_streams_only_new_data(
    spark, sf_dir, tmp_path
):
    """starting_version=latest (Delta's startingVersion=latest):
    everything already committed is treated as consumed; only commits
    landing after the stream starts flow."""
    from finance_etl_pipeline_spark.operators import manifest as M2

    spark.dataSource.register(ManifestTableDataSource)
    tbl, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ck")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    M2.commit(o.limit(20), tbl)
    M2.commit(o.limit(40), tbl)

    seen = []

    def sink(df, _bid):
        seen.extend(r["o_orderkey"] for r in df.collect())

    q = (
        spark.readStream.format("manifest_table")
        .option("table_dir", tbl)
        .option("starting_version", "latest")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        assert seen == []  # history is consumed by definition
        late = o.filter(F.col("o_orderkey") > 100).limit(5)
        n_late = late.count()
        M2.commit(late, tbl)
        q.processAllAvailable()
        assert len(seen) == n_late
    finally:
        q.stop()
        q.awaitTermination(60)
