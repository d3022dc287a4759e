"""Merkle-bucket anti-entropy: digests localize planted drift to the
right buckets, and the restricted row-diff reports exactly the planted
changes while provably skipping agreeing buckets."""

from __future__ import annotations

import pyspark.sql.functions as F

from finance_etl_pipeline_spark.operators.diff import (
    bucket_digests,
    differing_buckets,
    reconcile,
)
from finance_etl_pipeline_spark.sources.readers import table

N_BUCKETS = 64


def _snapshots(spark, sf_dir):
    old = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    # plant: 3 updates, 1 delete, 1 insert
    changed_keys = [r.o_orderkey for r in old.orderBy("o_orderkey").limit(3).collect()]
    deleted_key = old.orderBy(F.desc("o_orderkey")).first().o_orderkey
    new = (
        old.withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey").isin(changed_keys),
                F.col("o_totalprice") + 1.0,
            ).otherwise(F.col("o_totalprice")),
        )
        .filter(F.col("o_orderkey") != deleted_key)
        .unionByName(
            old.limit(0).sparkSession.createDataFrame(
                [(10**9 + 7, 1, 42.0, "O")], old.schema
            )
        )
    )
    return old, new, set(changed_keys), deleted_key


def test_identical_snapshots_have_no_differing_buckets(spark, sf_dir):
    old = table(spark, sf_dir, "orders")
    assert (
        differing_buckets(old, old, ["o_orderkey"], N_BUCKETS).count() == 0
    )


def test_digests_localize_and_reconcile_reports_exact_drift(spark, sf_dir):
    old, new, changed, deleted = _snapshots(spark, sf_dir)
    bad = differing_buckets(old, new, ["o_orderkey"], N_BUCKETS)
    n_bad = bad.count()
    # 5 planted rows can touch at most 5 buckets — localization, not
    # a full rescan flag
    assert 1 <= n_bad <= 5

    out = reconcile(old, new, ["o_orderkey"], N_BUCKETS)
    by_type = {
        r.o_orderkey: r.change_type
        for r in out.filter(F.col("change_type") != "unchanged").collect()
    }
    assert {k for k, t in by_type.items() if t == "changed"} == changed
    assert {k for k, t in by_type.items() if t == "removed"} == {deleted}
    assert {k for k, t in by_type.items() if t == "added"} == {10**9 + 7}

    # the restricted diff only ever saw differing buckets: every
    # 'unchanged' row it reports must live in one of them
    n_unchanged = out.filter(F.col("change_type") == "unchanged").count()
    total = old.count()
    assert n_unchanged < total * (n_bad / N_BUCKETS) * 2 + 10


def test_reconcile_with_value_column_named_bucket(spark, sf_dir):
    """A snapshot whose SCHEMA contains a 'bucket' column must have
    that column COMPARED, not silently clobbered by reconcile's
    internal bucket assignment: a drift that exists only in the
    'bucket' value column must be reported as changed."""
    old = table(spark, sf_dir, "orders").select(
        "o_orderkey", (F.col("o_custkey") % 10).alias("bucket")
    )
    victim = old.orderBy("o_orderkey").first().o_orderkey
    new = old.withColumn(
        "bucket",
        F.when(F.col("o_orderkey") == victim, F.lit(999)).otherwise(
            F.col("bucket")
        ),
    )
    out = reconcile(old, new, ["o_orderkey"], N_BUCKETS)
    drift = out.filter(F.col("change_type") != "unchanged").collect()
    assert {(r.o_orderkey, r.change_type) for r in drift} == {
        (victim, "changed")
    }
