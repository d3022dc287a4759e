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


def test_counting_ivm_with_deletes(spark, sf_dir):
    """Delete-capable counting maintenance: inserts then deletes on
    BOTH sides in one batch (exercising the dA><dB sign-product
    correction); after every batch the expanded view equals the join
    of the net tables and every multiplicity is exactly 1."""
    from finance_etl_pipeline_spark.operators.ivm import (
        counted_join_view_delta,
        merge_counts,
    )

    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_custkey"
    )
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_linenumber"
    )
    plus = lambda df: df.withColumn("sign", F.lit(1))  # noqa: E731
    minus = lambda df: df.withColumn("sign", F.lit(-1))  # noqa: E731

    # batch 1: insert even-k orders and ALL lineitems
    a0, b0 = o.limit(0), li.limit(0)
    da1 = plus(o.filter(F.col("k") % 2 == 0))
    db1 = plus(li)
    view = merge_counts(
        None, counted_join_view_delta(a0, da1, b0, db1, "k")
    ).localCheckpoint(eager=True)
    a1 = o.filter(F.col("k") % 2 == 0)
    b1 = li

    def check(view, a_net, b_net):
        # the testdata's (l_orderkey, l_linenumber) is NOT unique, so
        # the view is a genuine multiset — multiplicities are the
        # duplicate counts and must never go negative
        assert view.filter(F.col("multiplicity") < 1).count() == 0
        expanded = view.withColumn(
            "__i",
            F.explode(F.sequence(F.lit(1), F.col("multiplicity"))),
        ).drop("__i", "multiplicity")
        got = _checksum(expanded)
        want = _checksum(a_net.join(b_net, "k"))
        assert got == want

    check(view, a1, b1)

    # batch 2: insert odd-k orders, DELETE k%4==0 orders AND k%6==0
    # lineitems in the same batch (k%12==0 pairs hit both one-sided
    # retractions; the dA><dB (+1) term must re-add exactly one)
    da2 = plus(o.filter(F.col("k") % 2 == 1)).unionByName(
        minus(o.filter(F.col("k") % 4 == 0))
    )
    db2 = minus(li.filter(F.col("k") % 6 == 0))
    view = merge_counts(
        view,
        counted_join_view_delta(a1, da2, b1, db2, "k"),
    ).localCheckpoint(eager=True)
    a2 = o.filter((F.col("k") % 2 == 1) | (F.col("k") % 4 == 2))
    b2 = li.filter(F.col("k") % 6 != 0)
    check(view, a2, b2)
