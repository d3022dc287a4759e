"""Logical conflict resolution: snapshot-derived writes (MERGE INTO /
update_where) REBASE over interleaved commits that are provably
disjoint appends, and still conflict-abort on anything unprovable —
the Delta/Iceberg file-set/predicate intersection shape, so one busy
appender no longer starves every MERGE on the table."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from finance_etl_pipeline_spark.operators import manifest as M


def _df(spark, rows):
    return spark.createDataFrame(rows, "id int, amt double")


def _interleave(payload_fn):
    """A _publish hook that lands one interleaved commit right before
    the guarded publish runs — deterministically simulating a
    concurrent writer that wins the race."""
    orig = M._publish
    state = {"armed": True}

    def hooked(table_dir, build):
        if state["armed"]:
            state["armed"] = False
            payload_fn(table_dir)
        return orig(table_dir, build)

    return hooked, orig


def test_merge_rebases_over_disjoint_append(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(_df(spark, [(1, 10.0), (2, 20.0), (3, 30.0)]), t)
    source = _df(spark, [(2, 99.0), (4, 40.0)])  # key range [2, 4]

    # keys 100+ are provably outside the merge's key envelope
    hooked, orig = _interleave(
        lambda td: M.commit(_df(spark, [(100, 1.0), (101, 2.0)]), td)
    )
    M._publish = hooked
    try:
        v = M.merge_into(spark, t, source, ["id"])
    finally:
        M._publish = orig
    # both writes landed: the append became its own version, the
    # merge rebased on top of it
    assert v == 3
    got = {
        (r["id"], r["amt"]) for r in M.read_version(spark, t).collect()
    }
    assert got == {
        (1, 10.0),
        (2, 99.0),
        (3, 30.0),
        (4, 40.0),
        (100, 1.0),
        (101, 2.0),
    }


def test_merge_aborts_on_overlapping_append(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(_df(spark, [(1, 10.0), (2, 20.0)]), t)
    source = _df(spark, [(2, 99.0), (5, 50.0)])

    # key 3 sits inside the merge's [2, 5] envelope: an insert-only
    # merge could have collided with it — must abort
    hooked, orig = _interleave(
        lambda td: M.commit(_df(spark, [(3, 33.0)]), td)
    )
    M._publish = hooked
    try:
        with pytest.raises(M.ConcurrentTableModificationError):
            M.merge_into(spark, t, source, ["id"])
    finally:
        M._publish = orig
    # the interleaved append survives untouched; the merge left nothing
    got = {(r["id"], r["amt"]) for r in M.read_version(spark, t).collect()}
    assert got == {(1, 10.0), (2, 20.0), (3, 33.0)}


def test_merge_aborts_on_interleaved_delete(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(_df(spark, [(1, 10.0), (2, 20.0), (900, 5.0)]), t)
    source = _df(spark, [(2, 99.0)])

    hooked, orig = _interleave(
        lambda td: M.delete_where(td, [("id", "==", 900)])
    )
    M._publish = hooked
    try:
        with pytest.raises(M.ConcurrentTableModificationError):
            M.merge_into(spark, t, source, ["id"])
    finally:
        M._publish = orig


def test_merge_rebase_keeps_interleaved_evolved_column(spark, tmp_path):
    """An interleaved append that WIDENED the schema must not have its
    new column silently dropped by the rebased merge's manifest."""
    t = str(tmp_path / "tbl")
    M.commit(_df(spark, [(1, 10.0), (2, 20.0)]), t)
    source = _df(spark, [(2, 99.0)])

    wide = spark.createDataFrame(
        [(500, 5.0, "x")], "id int, amt double, note string"
    )
    hooked, orig = _interleave(lambda td: M.commit(wide, td))
    M._publish = hooked
    try:
        M.merge_into(spark, t, source, ["id"])
    finally:
        M._publish = orig
    got = M.read_version(spark, t)
    assert set(got.columns) == {"id", "amt", "note"}
    rows = {(r["id"], r["amt"], r["note"]) for r in got.collect()}
    assert rows == {(1, 10.0, None), (2, 99.0, None), (500, 5.0, "x")}


def test_update_where_rebases_over_disjoint_append(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(_df(spark, [(1, 10.0), (2, 20.0)]), t)

    hooked, orig = _interleave(
        lambda td: M.commit(_df(spark, [(300, 3.0)]), td)
    )
    M._publish = hooked
    try:
        v = M.update_where(
            spark,
            t,
            [("id", "<=", 2)],
            {"amt": F.col("amt") * 10},
        )
    finally:
        M._publish = orig
    assert v == 3
    got = {(r["id"], r["amt"]) for r in M.read_version(spark, t).collect()}
    assert got == {(1, 100.0), (2, 200.0), (300, 3.0)}


def test_update_where_aborts_when_append_matches_predicate(
    spark, tmp_path
):
    t = str(tmp_path / "tbl")
    M.commit(_df(spark, [(1, 10.0), (2, 20.0)]), t)

    # id=0 matches the update predicate: updating around it would
    # silently miss a row the caller meant to update
    hooked, orig = _interleave(
        lambda td: M.commit(_df(spark, [(0, 1.0)]), td)
    )
    M._publish = hooked
    try:
        with pytest.raises(M.ConcurrentTableModificationError):
            M.update_where(
                spark, t, [("id", "<=", 2)], {"amt": F.lit(0.0)}
            )
    finally:
        M._publish = orig
    got = {(r["id"], r["amt"]) for r in M.read_version(spark, t).collect()}
    assert got == {(1, 10.0), (2, 20.0), (0, 1.0)}


def test_merge_multi_key_envelope(spark, tmp_path):
    """Multi-column keys prove disjointness with the CONJUNCTION of
    per-column envelopes: an append outside any column's [min, max]
    rebases; one inside every envelope aborts even when its exact key
    tuple is absent from the source (the proof is an
    over-approximation, never a guess)."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, "a", 10.0), (5, "m", 20.0)], "id int, k string, amt double"
    )
    M.commit(df, t)
    source = spark.createDataFrame(
        [(1, "a", 99.0), (5, "m", 77.0)], "id int, k string, amt double"
    )

    # id=700 is outside the id envelope [1, 5]: provably disjoint
    hooked, orig = _interleave(
        lambda td: M.commit(
            spark.createDataFrame(
                [(700, "c", 7.0)], "id int, k string, amt double"
            ),
            td,
        )
    )
    M._publish = hooked
    try:
        v = M.merge_into(spark, t, source, ["id", "k"])
    finally:
        M._publish = orig
    assert v == 3
    got = {(r.id, r.k, r.amt) for r in M.read_version(spark, t).collect()}
    assert got == {(1, "a", 99.0), (5, "m", 77.0), (700, "c", 7.0)}

    # (3, 'c') sits inside BOTH envelopes (id in [1,5], k in [a,m]):
    # not provably disjoint even though the tuple is not a source key
    hooked, orig = _interleave(
        lambda td: M.commit(
            spark.createDataFrame(
                [(3, "c", 3.0)], "id int, k string, amt double"
            ),
            td,
        )
    )
    M._publish = hooked
    try:
        with pytest.raises(M.ConcurrentTableModificationError):
            M.merge_into(spark, t, source, ["id", "k"])
    finally:
        M._publish = orig


def test_optimize_rebases_over_disjoint_append(spark, tmp_path):
    """Compaction COMMUTES with appends: an append landing mid-OPTIMIZE
    must survive alongside the compacted rewrite, not abort it."""
    t = str(tmp_path / "tbl")
    M.commit(_df(spark, [(i, float(i)) for i in range(50)]).repartition(5), t)
    M.delete_where(t, [("id", "<", 10)])  # tombstone to materialize

    hooked, orig = _interleave(
        lambda td: M.commit(_df(spark, [(800, 8.0), (801, 9.0)]), td)
    )
    M._publish = hooked
    try:
        v = M.compact_table(spark, t, target_bytes=1 << 20)
    finally:
        M._publish = orig
    assert v == 4  # delete v2, interleaved append v3, compaction v4
    got = {r["id"] for r in M.read_version(spark, t).collect()}
    # compacted rows (tombstone materialized) + the interleaved append
    assert got == set(range(10, 50)) | {800, 801}
    # the pre-compaction snapshot is still time-travelable
    assert {r["id"] for r in M.read_version(spark, t, 2).collect()} == set(
        range(10, 50)
    )
    # and the compacted version carries no stale tombstones
    assert M._read_manifest(t, v).get("deletes") == []
    assert M.count_rows(t) == 42


def test_optimize_aborts_on_interleaved_delete(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(_df(spark, [(i, float(i)) for i in range(30)]).repartition(3), t)

    hooked, orig = _interleave(
        lambda td: M.delete_where(td, [("id", "==", 5)])
    )
    M._publish = hooked
    try:
        with pytest.raises(M.ConcurrentTableModificationError):
            M.compact_table(spark, t, target_bytes=1 << 20)
    finally:
        M._publish = orig
    # the delete survives; nothing was lost
    got = {r["id"] for r in M.read_version(spark, t).collect()}
    assert got == set(range(30)) - {5}


def test_optimize_keeps_interleaved_partitioned_append(spark, tmp_path):
    """The interleaved dir may be hive-partitioned: its layout (and
    partition pruning) must survive the compaction rebase."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(40)],
        "id int, grp string",
    )
    M.commit(df, t)

    def interleave(td):
        M.commit(
            spark.createDataFrame([(900, "z")], "id int, grp string"),
            td,
            partition_by=["grp"],
        )

    hooked, orig = _interleave(interleave)
    M._publish = hooked
    try:
        M.compact_table(spark, t, target_bytes=1 << 20)
    finally:
        M._publish = orig
    got = {(r["id"], r["grp"]) for r in M.read_version(spark, t).collect()}
    assert (900, "z") in got and len(got) == 41
    pruned = M.read_version(spark, t, where=[("grp", "==", "z")])
    assert [(r["id"], r["grp"]) for r in pruned.collect()] == [(900, "z")]
