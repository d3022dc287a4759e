"""Per-file bloom filters: point-lookup skipping beyond min/max on
high-cardinality unsorted ids — no-false-negative property-fuzzed,
pruning proven at the file-list level, backfill via add_bloom_index,
and stream passthrough of the metadata-only bloom version."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from finance_etl_pipeline_spark.operators import manifest as M


# ---------------------------------------------------------- pure fuzz


@settings(max_examples=200, deadline=None)
@given(
    vals=st.lists(
        st.one_of(
            st.integers(min_value=-(2**40), max_value=2**40),
            st.text(max_size=12),
            st.floats(allow_nan=False, allow_infinity=False, width=32),
        ),
        min_size=1,
        max_size=50,
    ),
    probe_idx=st.integers(min_value=0, max_value=49),
)
def test_bloom_never_false_negative(vals, probe_idx):
    bloom = M._build_bloom(vals)
    if bloom is None:
        return  # outside the contract: nothing is consulted
    member = vals[probe_idx % len(vals)]
    assert M._bloom_may_contain(bloom, member)


@settings(max_examples=100, deadline=None)
@given(n=st.integers(min_value=1, max_value=2**40))
def test_bloom_numeric_identity_collapses(n):
    """int 5 and double 5.0 must hash alike: an equality predicate
    compares numerically, so a typed mismatch must never skip."""
    bloom = M._build_bloom([n])
    assert bloom is not None
    assert M._bloom_may_contain(bloom, float(n)) or abs(n) >= 2**53
    bloom_f = M._build_bloom([float(n)])
    if bloom_f is not None and abs(n) < 2**53:
        assert M._bloom_may_contain(bloom_f, n)


def test_bloom_absent_values_mostly_skip():
    bloom = M._build_bloom(list(range(0, 2000, 2)))  # even ids
    miss = sum(
        1 for v in range(1, 2000, 2) if M._bloom_may_contain(bloom, v)
    )
    # ~1% false positives at 12 bits/key; 10% is a generous ceiling
    assert miss < 100, miss


# ------------------------------------------------------- spark paths


def _kept_files(tbl, pred):
    m = M._read_manifest(tbl, M.latest_version(tbl))
    files = M._load_files(tbl, m)
    kept = 0
    total = 0
    for d, entries in files.items():
        for e in entries:
            total += 1
            if M._file_may_match(e, [pred], None):
                kept += 1
    return kept, total


def test_point_lookup_prunes_unsorted_table(spark, tmp_path):
    t = str(tmp_path / "tbl")
    # ids striped round-robin across 8 files: every file's min/max
    # covers every key — min/max skipping is USELESS here
    df = spark.createDataFrame(
        [(i, i % 7) for i in range(4000)], "id long, grp int"
    ).repartition(8)
    M.commit(df, t, bloom_cols=["id"])

    kept, total = _kept_files(t, ("id", "==", 1234))
    assert total >= 8
    # the key lives in one file; bloom fp rate may keep a stray one
    assert kept <= 2, (kept, total)
    # and without blooms the same layout keeps everything
    kept_minmax = 0
    m = M._read_manifest(tbl := t, M.latest_version(tbl))
    for d, entries in M._load_files(tbl, m).items():
        for e in entries:
            e2 = {k: v for k, v in e.items() if k != "bloom"}
            if M._file_may_match(e2, [("id", "==", 1234)], None):
                kept_minmax += 1
    assert kept_minmax == total

    # exactness: the pruned read returns exactly the matching row
    got = M.read_version(spark, t, where=[("id", "==", 1234)]).collect()
    assert [(r.id, r.grp) for r in got] == [(1234, 1234 % 7)]
    # absent key: zero files, zero rows
    kept_absent, _ = _kept_files(t, ("id", "==", 999_999))
    assert kept_absent <= 1
    assert (
        M.read_version(spark, t, where=[("id", "==", 999_999)]).count()
        == 0
    )
    # IN probes prune too
    kept_in, _ = _kept_files(t, ("id", "in", [1234, 999_999]))
    assert kept_in <= 3


def test_add_bloom_index_backfills_existing_table(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, str(i % 13)) for i in range(2000)], "id long, tag string"
    ).repartition(6)
    M.commit(df, t)  # no blooms at write time
    kept0, total = _kept_files(t, ("id", "==", 77))
    assert kept0 == total  # unsorted: min/max keeps everything

    v = M.add_bloom_index(spark, t, ["id"])
    kept1, _ = _kept_files(t, ("id", "==", 77))
    assert kept1 <= 2
    # content identical before/after (metadata-only version)
    assert (
        M.read_version(spark, t, v).exceptAll(
            M.read_version(spark, t, v - 1)
        ).count()
        == 0
    )
    with pytest.raises(ValueError, match="no such column"):
        M.add_bloom_index(spark, t, ["nope"])


def test_bloom_version_streams_through(spark, tmp_path):
    from finance_etl_pipeline_spark.sources.lakestream import (
        ManifestTableDataSource,
    )

    spark.dataSource.register(ManifestTableDataSource)
    t, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ck")
    M.commit(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, tag string"),
        t,
    )
    M.add_bloom_index(spark, t, ["id"])
    M.commit(spark.createDataFrame([(3, "c")], "id long, tag string"), t)
    q = (
        spark.readStream.format("manifest_table")
        .option("table_dir", t)
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(r.id for r in got.collect()) == [1, 2, 3]


def test_bloom_respects_column_mapping(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1000)], "id long, amt double"
    ).repartition(4)
    M.commit(df, t)
    M.rename_column(t, "id", "key")
    M.add_bloom_index(spark, t, ["key"])  # logical name
    kept, total = _kept_files(t, ("id", "==", 42))  # physical probe
    assert kept <= 2 < total or total <= 2
    got = M.read_version(spark, t, where=[("key", "==", 42)]).collect()
    assert [r.key for r in got] == [42]


def test_pushdown_reader_consults_blooms(spark, tmp_path):
    """The SQL-surface pushdown path (ManifestBatchPushdownReader)
    rides the same _file_may_match proofs, so an id-equality filter
    through spark.read plans only the bloom-surviving files."""
    from finance_etl_pipeline_spark.sources.lakestream import (
        ManifestBatchPushdownReader,
    )
    from pyspark.sql.types import StructType

    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, i % 5) for i in range(3000)], "id long, grp int"
    ).repartition(6)
    M.commit(df, t, bloom_cols=["id"])
    m = M._read_manifest(t, 1)
    schema = StructType.fromJson(m["schema"])
    rdr = ManifestBatchPushdownReader(t, schema, 1)
    total = len([p for p in rdr.partitions() if p.path])
    rdr2 = ManifestBatchPushdownReader(t, schema, 1)
    rdr2._skip_preds.append(("id", "==", 777))
    kept = len([p for p in rdr2.partitions() if p.path])
    assert kept <= 2 < total


# --------------------------------------------- contract edges (r10)


def test_big_integral_float_probe_never_skips():
    """Above 2**53 doubles are not exact over the integers, so an
    equal (int, float) pair cannot share one hash key — such probes
    are OUTSIDE the contract and must pass (ADVICE r9)."""
    n = 2**53 + 8
    bloom = M._build_bloom([n])  # int keys build fine
    assert bloom is not None
    assert M._bloom_may_contain(bloom, float(n))  # probe passes
    assert M._bloom_may_contain(bloom, float(n + 16))
    # a float column with >= 2**53 integral values builds NO bloom
    assert M._build_bloom([float(n)]) is None
    assert M._build_bloom([1.5, float(n)]) is None


def test_cross_typed_probe_never_skips():
    """Numeric probe on string keys (and vice versa) must pass: the
    residual filter compares after an implicit cast ('01' == 1), which
    literal hashing cannot model."""
    sb = M._build_bloom(["01", "02"])
    assert sb is not None and sb["kind"] == "str"
    assert M._bloom_may_contain(sb, 1)
    assert M._bloom_may_contain(sb, 1.0)
    assert not M._bloom_may_contain(sb, "03")  # same-class still skips
    nb = M._build_bloom([1, 2])
    assert nb is not None and nb["kind"] == "num"
    assert M._bloom_may_contain(nb, "01")
    assert not M._bloom_may_contain(nb, 3)


def test_mixed_class_column_builds_no_bloom():
    assert M._build_bloom([1, "a"]) is None


def test_legacy_bloom_without_kind_passes():
    """Pre-r10 persisted blooms never recorded a value class; they are
    treated as outside the contract (pass) rather than risking a
    cross-typed false negative."""
    bloom = M._build_bloom([1, 2, 3])
    legacy = {k: v for k, v in bloom.items() if k != "kind"}
    assert M._bloom_may_contain(legacy, 999)
