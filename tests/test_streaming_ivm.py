"""Streaming CDC ingest → incremental JOIN-view maintenance.

Order inserts arrive as a file-source stream (micro-batched); each
batch refreshes a materialized orders ⋈ lineitem view via
``join_view_delta`` inside foreachBatch — the streaming twin of
tests/test_ivm.py's batch schedule, with real micro-batch boundaries.
The dimension side is a static snapshot here (one-sided deltas); the
both-sided delta rule is pinned by the batch test."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from finance_etl_pipeline_spark.operators.ivm import join_view_delta
from finance_etl_pipeline_spark.sources.readers import table


def test_foreachbatch_join_view_matches_batch(spark, sf_dir, tmp_path):
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_custkey", "o_totalprice"
    )
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_linenumber", "l_quantity"
    )

    src = tmp_path / "orders_in"
    src.mkdir()
    for name, part in (
        ("a", o.filter(F.col("k") % 2 == 0)),
        ("b", o.filter(F.col("k") % 2 == 1)),
    ):
        out = tmp_path / f"half_{name}"
        part.coalesce(1).write.parquet(str(out))
        (f,) = glob.glob(str(out / "part-*.parquet"))
        shutil.copy(f, src / f"{name}.parquet")

    view_dir = str(tmp_path / "join_view")
    n_batches = []

    def refresh(batch_df, batch_id):
        n_batches.append(batch_id)
        delta = join_view_delta(None, batch_df, li, None, "k")
        # a_old is unused for one-sided order inserts (delta_b is None)
        delta.write.mode("append").parquet(view_dir)

    stream = (
        spark.readStream.schema(o.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(refresh)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()

    assert len(n_batches) >= 2, "stream did not micro-batch"
    got = spark.read.parquet(view_dir)
    want = o.join(li, "k")
    cols = sorted(got.columns)

    def checksum(df):
        h = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|", *[F.col(c).cast("string") for c in cols]
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 1000000007
        )
        r = df.agg(F.count(F.lit(1)).alias("n"), F.sum(h).alias("s")).first()
        return (r.n, r.s)

    assert checksum(got) == checksum(want)
    assert os.path.exists(view_dir)
