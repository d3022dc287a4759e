"""Incremental join-view maintenance == full recompute, batch by batch.

Splits orders and lineitem into interleaved delta batches, maintains
J = orders ⋈ lineitem with join_view_delta, and checks after EVERY
refresh that the accumulated view equals the join of the tables seen
so far (count + content checksum, so extra AND missing rows both
fail).  The one-sided and both-sided refresh paths are exercised."""

from __future__ import annotations

import pyspark.sql.functions as F

from finance_etl_pipeline_spark.operators.ivm import join_view_delta
from finance_etl_pipeline_spark.sources.readers import table


def _checksum(df):
    """Order-independent multiset fingerprint: count + sum of a 60-bit
    row hash (md5 over the canonical concat of all columns)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in sorted(df.columns)])),
            1,
            15,
        ),
        16,
        10,
    ).cast("long") % 1000000007  # mod-p so the sum can never overflow BIGINT
    r = df.agg(
        F.count(F.lit(1)).alias("n"), F.sum(h).alias("s")
    ).first()
    return (r.n, r.s)


def test_incremental_join_view_matches_recompute(spark, sf_dir):
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_custkey", "o_totalprice"
    )
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_linenumber", "l_quantity"
    )
    # deterministic interleaved batches; sides advance unevenly so
    # some refreshes are one-sided
    o_batches = [o.filter(F.col("k") % 3 == i) for i in range(3)]
    li_batches = [li.filter(F.col("k") % 2 == i) for i in range(2)]

    schedule = [
        (o_batches[0], li_batches[0]),  # both sides
        (o_batches[1], None),           # orders only
        (None, li_batches[1]),          # lineitem only
        (o_batches[2], None),           # orders only
    ]

    a_old = o.limit(0)
    b_old = li.limit(0)
    view = a_old.join(b_old, "k")
    for da, db in schedule:
        delta = join_view_delta(a_old, da, b_old, db, "k")
        assert delta is not None
        view = view.unionByName(delta).localCheckpoint(eager=True)
        a_old = a_old.unionByName(da).localCheckpoint(eager=True) if da is not None else a_old
        b_old = b_old.unionByName(db).localCheckpoint(eager=True) if db is not None else b_old
        assert _checksum(view) == _checksum(a_old.join(b_old, "k"))

    # end state covers everything
    assert _checksum(view) == _checksum(o.join(li, "k"))


def test_empty_refresh_returns_none(spark, sf_dir):
    o = table(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
    li = table(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("k"))
    assert join_view_delta(o, None, li, None, "k") is None


def test_outer_join_rejected(spark, sf_dir):
    o = table(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
    li = table(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("k"))
    import pytest

    with pytest.raises(ValueError):
        join_view_delta(o, o, li, li, "k", how="left")
