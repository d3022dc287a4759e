"""Z-order layout → row-group skipping on BOTH participating columns.

Methodology mirrors tests/test_data_skipping.py: write with small row
groups, read the parquet footers with pyarrow, and measure what
fraction of row groups a range predicate would have to read.  The
claim under test: a layout sorted on l_partkey alone prunes nothing
for l_suppkey predicates, while the Z-ordered layout prunes well for
range predicates on EITHER column — and never changes query answers.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.operators.zorder import zorder_by
from finance_etl_pipeline_spark.sources.readers import table


def _overlap_fraction(path_glob: str, col: str, lo, hi) -> float:
    """Fraction of row groups whose [min,max] intersects [lo, hi)."""
    hit = total = 0
    for f in glob.glob(path_glob):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[col]).statistics
            total += 1
            if st.min < hi and st.max >= lo:
                hit += 1
    assert total >= 8, "need several row groups for the test to mean anything"
    return hit / total


def test_zorder_skips_on_both_columns(spark, sf_dir, tmp_path):
    li = table(spark, sf_dir, "lineitem")
    small_rg = {"parquet.block.size": 32 * 1024}

    sorted_out = str(tmp_path / "li_partkey_sorted")
    (
        li.repartition(1)
        .sortWithinPartitions("l_partkey")
        .write.options(**small_rg)
        .parquet(sorted_out)
    )
    z_out = str(tmp_path / "li_zorder")
    (
        zorder_by(li, ["l_partkey", "l_suppkey"], num_partitions=1)
        .write.options(**small_rg)
        .parquet(z_out)
    )

    # 10%-of-range window on each column
    pk_lo, pk_hi = 0, 20
    sk_lo, sk_hi = 0, 1
    mx = li.agg(
        F.max("l_partkey").alias("pk"), F.max("l_suppkey").alias("sk")
    ).collect()[0]
    pk_hi = max(1, mx["pk"] // 10)
    sk_hi = max(1, mx["sk"] // 10)

    s_pk = _overlap_fraction(sorted_out + "/*.parquet", "l_partkey", pk_lo, pk_hi)
    s_sk = _overlap_fraction(sorted_out + "/*.parquet", "l_suppkey", sk_lo, sk_hi)
    z_pk = _overlap_fraction(z_out + "/*.parquet", "l_partkey", pk_lo, pk_hi)
    z_sk = _overlap_fraction(z_out + "/*.parquet", "l_suppkey", sk_lo, sk_hi)

    # single-col sort: great on its own column, useless on the other
    assert s_pk < 0.3
    assert s_sk > 0.9
    # z-order: prunes meaningfully on BOTH columns
    assert z_pk < 0.6
    assert z_sk < 0.6
    # and strictly beats the single-col layout on the second column
    assert z_sk < s_sk

    # layout never changes answers
    pred = (
        (F.col("l_partkey") >= pk_lo)
        & (F.col("l_partkey") < pk_hi)
        & (F.col("l_suppkey") >= sk_lo)
        & (F.col("l_suppkey") < sk_hi)
    )
    n_z = spark.read.parquet(z_out).filter(pred).count()
    n_s = spark.read.parquet(sorted_out).filter(pred).count()
    assert n_z == n_s == li.filter(pred).count()


def test_morton_code_locality_property(spark):
    """Rows quantized to the same grid cell get the same code, and the
    code of (a, b) differs from (a, b+1) only above the interleave
    position — i.e. nearby cells share high bits (the locality that
    makes the curve cluster)."""
    from finance_etl_pipeline_spark.operators.zorder import morton_code

    df = spark.range(1).select(
        morton_code([F.lit(0b101).cast("long"), F.lit(0b011).cast("long")], 3).alias("z")
    )
    # manual interleave: a=101, b=011 -> bits (i*2+j): a0=1@0, b0=1@1,
    # a1=0@2, b1=1@3, a2=1@4, b2=0@5 -> 0b011011 = 27
    assert df.collect()[0]["z"] == 27
