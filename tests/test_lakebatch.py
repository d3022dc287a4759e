"""Batch reads of manifest tables through the Python DataSource:
``spark.read.format("manifest_table")`` must equal
``manifest.read_version`` on the full feature matrix (schema
evolution, merge-on-read deletes/updates, hive partitions, time
travel), and the pushdown reader must materialize a strict SUBSET of
files for a selective predicate while never changing answers."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from finance_etl_pipeline_spark.operators import manifest as M
from finance_etl_pipeline_spark.sources.lakestream import (
    ManifestBatchPushdownReader,
    ManifestTableDataSource,
)
from finance_etl_pipeline_spark.sources.readers import table


def _batch_df(spark, tbl, **opts):
    spark.dataSource.register(ManifestTableDataSource)
    r = spark.read.format("manifest_table").option("table_dir", tbl)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def _assert_same(got, want):
    # names + types; nullability is all-True on the DataSource side by
    # design (schema evolution can NULL-fill any column)
    assert [(f.name, f.dataType) for f in got.schema.fields] == [
        (f.name, f.dataType) for f in want.schema.fields
    ]
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_batch_read_full_feature_matrix(spark, sf_dir, tmp_path):
    """One table exercising every read-side feature at once: plain
    append, hive-partitioned append, schema evolution, a merge-on-read
    delete, and an update — the DataSource read must equal
    read_version at the tip AND at every historical version."""
    tbl = str(tmp_path / "tbl")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    M.commit(o.filter(F.col("o_orderkey") % 4 == 0).repartition(3), tbl)
    M.commit(
        o.filter(F.col("o_orderkey") % 4 == 1),
        tbl,
        partition_by=["o_orderstatus"],
    )
    M.commit(
        o.filter(F.col("o_orderkey") % 4 == 2).withColumn(
            "o_channel", F.lit("online")
        ),
        tbl,
    )
    M.delete_where(tbl, [("o_orderstatus", "==", "F")])
    M.update_where(
        spark,
        tbl,
        [("o_totalprice", ">", 200000.0)],
        {"o_totalprice": F.col("o_totalprice") - 1.0},
    )

    tip = M.latest_version(tbl)
    for v in range(1, tip + 1):
        _assert_same(
            _batch_df(spark, tbl, version=v),
            M.read_version(spark, tbl, v),
        )
    _assert_same(_batch_df(spark, tbl), M.read_version(spark, tbl))


def test_batch_read_as_of_timestamp(spark, sf_dir, tmp_path):
    tbl = str(tmp_path / "tbl")
    o = table(spark, sf_dir, "orders").select("o_orderkey")
    M.commit(o.limit(10), tbl)
    M.commit(o.limit(25), tbl, mode="overwrite")
    with open(os.path.join(tbl, "_manifests", "v000001.json")) as fh:
        ts1 = json.load(fh)["ts"]
    with open(os.path.join(tbl, "_manifests", "v000002.json")) as fh:
        ts2 = json.load(fh)["ts"]
    mid = (ts1 + ts2) / 2
    assert _batch_df(spark, tbl, as_of=str(mid)).count() == 10
    assert _batch_df(spark, tbl, as_of=str(ts2 + 60)).count() == 25


def test_pushdown_prunes_strict_file_subset(spark, sf_dir, tmp_path):
    """The metadata proof: a selective range predicate must shrink the
    partition (file) list the reader materializes, and the pruned set
    must be exactly what read_version's file skipping would scan."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        LessThan,
        Not,
    )

    tbl = str(tmp_path / "tbl")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    # range-partitioned layout → disjoint per-file min/max stats
    M.commit(o.repartitionByRange(6, "o_orderkey"), tbl)

    schema = M.read_version(spark, tbl).schema
    full = ManifestBatchPushdownReader(tbl, schema, 1).partitions()
    assert len(full) == 6

    r = ManifestBatchPushdownReader(tbl, schema, 1)
    cut = int(o.agg(F.expr("percentile(o_orderkey, 0.5)")).first()[0])
    returned = list(
        r.pushFilters(
            [
                LessThan(("o_orderkey",), cut),
                # unsupported SHAPE: no attribute → skipped for
                # pruning, still yielded back
                Not(EqualTo(("o_orderkey",), 1)),
            ]
        )
    )
    assert len(returned) == 2  # EVERYTHING yielded back for re-apply
    pruned = r.partitions()
    assert 0 < len(pruned) < len(full)  # strict subset
    assert {p.path for p in pruned} == set(
        M.files_for_version(tbl, 1, where=[("o_orderkey", "<", cut)])
    )

    # equality-point and empty-range shapes
    r2 = ManifestBatchPushdownReader(tbl, schema, 1)
    list(r2.pushFilters([GreaterThanOrEqual(("o_orderkey",), 10**15)]))
    none = r2.partitions()
    assert len(none) == 1 and none[0].path == ""  # empty sentinel


def test_pushdown_e2e_sql_equals_read_version(spark, sf_dir, tmp_path):
    """End to end through Spark SQL with the pushdown conf on: the
    filtered aggregate over the DataSource view equals the same over
    read_version(where=...) — pruning never changes answers, even with
    a tombstone outstanding."""
    tbl = str(tmp_path / "tbl")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    M.commit(o.repartitionByRange(5, "o_totalprice"), tbl)
    M.delete_where(tbl, [("o_orderstatus", "==", "P")])

    conf_key = "spark.sql.python.filterPushdown.enabled"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "true")
    try:
        df = _batch_df(spark, tbl, pushdown="true")
        df.createOrReplaceTempView("mtbl")
        got = spark.sql(
            "SELECT o_orderstatus, count(*) AS n, "
            "CAST(sum(CAST(o_totalprice * 100 AS BIGINT)) AS BIGINT) AS cents "
            "FROM mtbl WHERE o_totalprice < 100000.0 "
            "GROUP BY o_orderstatus ORDER BY o_orderstatus"
        )
        want = (
            M.read_version(
                spark, tbl, where=[("o_totalprice", "<", 100000.0)]
            )
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum((F.col("o_totalprice") * 100).cast("long"))
                .cast("long")
                .alias("cents"),
            )
            .orderBy("o_orderstatus")
        )
        assert [tuple(r) for r in got.collect()] == [
            tuple(r) for r in want.collect()
        ]
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)


def test_delete_on_partition_column_via_batch_reader(spark, sf_dir, tmp_path):
    """Tombstone predicates on hive partition columns evaluate against
    the per-file path constants (the column is not in the data file)."""
    tbl = str(tmp_path / "tbl")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    M.commit(o, tbl, partition_by=["o_orderstatus"])
    M.delete_where(tbl, [("o_orderstatus", "==", "O")])
    got = _batch_df(spark, tbl)
    assert got.filter(F.col("o_orderstatus") == "O").count() == 0
    _assert_same(got, M.read_version(spark, tbl))


def test_batch_reader_version_not_found(spark, sf_dir, tmp_path):
    tbl = str(tmp_path / "tbl")
    o = table(spark, sf_dir, "orders").select("o_orderkey")
    M.commit(o.limit(5), tbl)
    with pytest.raises(Exception, match="not found|never"):
        _batch_df(spark, tbl, version=9).count()


def test_schema_and_reader_resolve_the_same_snapshot(spark, sf_dir, tmp_path):
    """A commit landing between Spark's schema() call and its
    reader() call must not hand the reader a newer snapshot than the
    schema came from — the version is resolved once per DataSource
    instance."""
    tbl = str(tmp_path / "tbl")
    o = table(spark, sf_dir, "orders").select("o_orderkey")
    M.commit(o.limit(10), tbl)

    ds = ManifestTableDataSource({"table_dir": tbl})
    schema = ds.schema()  # resolves the tip: v1
    # a concurrent writer advances the tip — and evolves the schema
    M.commit(
        o.limit(5).withColumn("extra", F.lit(1)), tbl
    )
    reader = ds.reader(schema)
    assert reader.version == 1  # pinned to what schema() saw
    assert [p.path for p in reader.partitions()]  # and readable
    # a FRESH instance sees the new tip and the evolved schema
    ds2 = ManifestTableDataSource({"table_dir": tbl})
    assert "extra" in ds2.schema().fieldNames()
    assert ds2.reader(ds2.schema()).version == 2


def test_append_sink_skips_empty_batches(spark, sf_dir, tmp_path):
    """Idle micro-batches must not spam empty versions."""
    from finance_etl_pipeline_spark.streaming.sink import (
        append_stream_to_manifest,
    )

    src_dir = str(tmp_path / "in")
    t = str(tmp_path / "tbl")
    os.makedirs(src_dir)
    o = table(spark, sf_dir, "orders").select("o_orderkey").limit(50)
    o.coalesce(1).write.parquet(os.path.join(src_dir, "f0"))

    def drain(ckpt):
        stream = spark.readStream.schema(o.schema).parquet(src_dir + "/f*")
        q = (
            append_stream_to_manifest(stream, t, "app-e")
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()

    drain("ck1")
    assert M.latest_version(t) == 1
    # same checkpoint, no new files: the drain sees nothing new — and
    # even if an empty batch fires, no version lands
    drain("ck1")
    assert M.latest_version(t) == 1
    assert M.read_version(spark, t).count() == 50


def test_dataframe_write_path_publishes_versions(spark, sf_dir, tmp_path):
    """df.write.format("manifest_table") — the write half of the
    DataSource: append and overwrite publish one version each with
    footer stats (file skipping works on the written commit), and the
    read path round-trips exactly."""
    tbl = str(tmp_path / "tbl")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    spark.dataSource.register(ManifestTableDataSource)

    a = o.filter(F.col("o_orderkey") % 2 == 0)
    (
        a.repartitionByRange(4, "o_orderkey")
        .write.format("manifest_table")
        .option("table_dir", tbl)
        .mode("append")
        .save()
    )
    assert M.latest_version(tbl) == 1
    got = M.read_version(spark, tbl)
    assert got.count() == a.count()
    assert got.exceptAll(a).count() == 0
    # footer stats landed: a selective predicate prunes files
    cut = int(o.agg(F.expr("percentile(o_orderkey, 0.2)")).first()[0])
    kept = M.files_for_version(tbl, where=[("o_orderkey", "<", cut)])
    assert 0 < len(kept) < len(M.files_for_version(tbl))

    b = o.filter(F.col("o_orderkey") % 2 == 1)
    (
        b.write.format("manifest_table")
        .option("table_dir", tbl)
        .mode("append")
        .save()
    )
    assert M.latest_version(tbl) == 2
    assert M.read_version(spark, tbl).count() == o.count()

    (
        a.limit(30)
        .write.format("manifest_table")
        .option("table_dir", tbl)
        .mode("overwrite")
        .save()
    )
    assert M.latest_version(tbl) == 3
    assert M.read_version(spark, tbl).count() == 30
    assert M.read_version(spark, tbl, 2).count() == o.count()  # time travel


def test_dataframe_write_txn_replay_is_noop(spark, sf_dir, tmp_path):
    tbl = str(tmp_path / "tbl")
    o = table(spark, sf_dir, "orders").select("o_orderkey").limit(40)
    spark.dataSource.register(ManifestTableDataSource)

    def put():
        (
            o.write.format("manifest_table")
            .option("table_dir", tbl)
            .option("txn_app_id", "job-w")
            .option("txn_version", 5)
            .mode("append")
            .save()
        )

    put()
    assert M.latest_version(tbl) == 1
    put()  # replayed job: no new version, no duplicate rows
    assert M.latest_version(tbl) == 1
    assert M.read_version(spark, tbl).count() == 40

    with pytest.raises(Exception, match="go together"):
        (
            o.write.format("manifest_table")
            .option("table_dir", tbl)
            .option("txn_app_id", "job-w")
            .mode("append")
            .save()
        )


def test_dataframe_write_stray_files_never_enter_manifest(
    spark, sf_dir, tmp_path
):
    """Only files reported by successful task attempts are harvested:
    a stray partial file planted in the commit dir (the failed-attempt
    shape) must stay out of the manifest, be invisible to readers, and
    be reclaimable by the file-granular vacuum."""
    from finance_etl_pipeline_spark.sources.lakestream import (
        ManifestBatchWriter,
    )

    tbl = str(tmp_path / "tbl")
    o = table(spark, sf_dir, "orders").select("o_orderkey").limit(20)
    spark.dataSource.register(ManifestTableDataSource)
    o.write.format("manifest_table").option("table_dir", tbl).mode(
        "append"
    ).save()

    # plant a stray partial file in a FRESH writer's dir and commit
    # around it via the real protocol
    w = ManifestBatchWriter(tbl, o.schema, overwrite=False)
    os.makedirs(w.abs_dir)
    stray = os.path.join(w.abs_dir, "part-deadbeef.parquet")
    with open(stray, "wb") as fh:
        fh.write(b"not parquet")
    import pyarrow as pa

    batch = pa.RecordBatch.from_pydict({"o_orderkey": [1, 2, 3]})
    msg = w.write(iter([batch]))
    w.commit([msg])
    assert M.latest_version(tbl) == 2
    got = M.read_version(spark, tbl)
    assert got.count() == 23  # 20 + 3; the stray never entered
    # the stray is vacuumable (unreferenced file inside a live dir)
    removed = M.vacuum(tbl, keep_last=2, retention_seconds=0.0)
    assert any(r.endswith("part-deadbeef.parquet") for r in removed)
    assert M.read_version(spark, tbl).count() == 23


def test_string_partition_values_that_look_numeric(
    spark, sf_dir, tmp_path
):
    """Regression: a STRING partition column whose values look numeric
    ('001', '1e3') must survive the batch read verbatim — the path
    int/float inference used to hand pa.array an int for a string
    column (ArrowTypeError, whole read failed), and casting instead
    would have dropped the leading zeros."""
    tbl = str(tmp_path / "tbl")
    o = (
        table(spark, sf_dir, "orders")
        .select("o_orderkey")
        .limit(40)
        .withColumn(
            "code",
            F.when(F.col("o_orderkey") % 2 == 0, F.lit("001")).otherwise(
                F.lit("1e3")
            ),
        )
    )
    M.commit(o, tbl, partition_by=["code"])
    got = _batch_df(spark, tbl)
    assert set(
        r["code"] for r in got.select("code").distinct().collect()
    ) == {"001", "1e3"}
    _assert_same(got, M.read_version(spark, tbl))
