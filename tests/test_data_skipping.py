"""Sorted write layout → tight per-row-group min/max stats → parquet
row-group skipping.  The layout half of predicate pushdown: pushdown
decides WHETHER stats are consulted (tests/test_plan_shape.py asserts
PushedFilters); the sort decides whether the stats EXCLUDE anything.
Verified from the parquet footers directly (pyarrow), so the assertion
is about the artifact, not a Spark-internal metric."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.sources.readers import table

WINDOW = ("1996-01-01", "1996-02-01")


def _overlap_fraction(path_glob: str) -> tuple[int, int]:
    """(#row-groups overlapping WINDOW, #row-groups total)."""
    import datetime

    lo = datetime.datetime.fromisoformat(WINDOW[0])
    hi = datetime.datetime.fromisoformat(WINDOW[1])
    hit = total = 0
    for f in glob.glob(path_glob):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx["l_shipdate"]).statistics
            total += 1
            if st.min < hi and st.max >= lo:
                hit += 1
    return hit, total


def test_sorted_layout_skips_row_groups(spark, sf_dir, tmp_path):
    li = table(spark, sf_dir, "lineitem")
    small_rg = {"parquet.block.size": 64 * 1024}

    sorted_out = str(tmp_path / "li_sorted")
    (
        li.repartition(1)
        .sortWithinPartitions("l_shipdate")
        .write.options(**small_rg)
        .parquet(sorted_out)
    )
    unsorted_out = str(tmp_path / "li_unsorted")
    li.repartition(1).write.options(**small_rg).parquet(unsorted_out)

    s_hit, s_total = _overlap_fraction(sorted_out + "/*.parquet")
    u_hit, u_total = _overlap_fraction(unsorted_out + "/*.parquet")
    assert s_total >= 4, "need several row groups for the test to mean anything"
    # sorted: the window's rows are contiguous → few groups overlap
    assert s_hit / s_total < 0.5
    # unsorted: nearly every group spans the whole date range
    assert u_hit / u_total > 0.9
    assert s_hit / s_total < u_hit / u_total

    # layout never changes answers
    pred = (F.col("l_shipdate") >= WINDOW[0]) & (F.col("l_shipdate") < WINDOW[1])
    n_sorted = spark.read.parquet(sorted_out).filter(pred).count()
    n_unsorted = spark.read.parquet(unsorted_out).filter(pred).count()
    assert n_sorted == n_unsorted == li.filter(pred).count()
