"""Small-file compaction: fewer files, identical rows, crash-safe swap."""

from __future__ import annotations

from pyspark.sql import functions as F

from finance_etl_pipeline_spark.operators.compact import (
    compact,
    data_files,
    plan_file_count,
)
from finance_etl_pipeline_spark.sources.readers import table


def _fingerprint(df):
    # order-insensitive whole-table fingerprint
    return (
        df.select(F.sum(F.xxhash64(*df.columns)).alias("h"), F.count(F.lit(1)).alias("n"))
        .first()
    )


def test_compact_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    out = str(tmp_path / "li_small_files")
    li = table(spark, sf_dir, "lineitem")
    li.repartition(32).write.parquet(out)
    assert len(data_files(out)) >= 32
    before = _fingerprint(spark.read.parquet(out))

    n_files = compact(spark, out, target_bytes=4 * 1024 * 1024)
    assert n_files == len(data_files(out)) < 32
    after = _fingerprint(spark.read.parquet(out))
    assert (before.h, before.n) == (after.h, after.n)


def test_plan_file_count_scales_with_bytes(spark, sf_dir, tmp_path):
    out = str(tmp_path / "li_plan")
    table(spark, sf_dir, "lineitem").write.parquet(out)
    one = plan_file_count(out, target_bytes=10**12)
    many = plan_file_count(out, target_bytes=64 * 1024)
    assert one == 1 and many > one
