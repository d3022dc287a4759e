"""Logical conflict resolution: snapshot-derived writes (MERGE INTO /
update_where / compact_where) REBASE over interleaved commits that are
provably disjoint — pure appends outside the read set, scoped
OPTIMIZEs whose replaced+added files miss it, MoR deletes whose
tombstone is file-disjoint from it — and still conflict-abort on
anything unprovable (overlaps, overwrites, renames): the
Delta/Iceberg file-set/predicate intersection shape, so one busy
appender (or a cold-partition OPTIMIZE) no longer starves every MERGE
on the table."""

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


def test_merge_rebases_over_file_disjoint_delete(spark, tmp_path):
    """r10: a MERGE rebases over an interleaved delete_where whose
    tombstone provably hits no file the merge read — both writes
    land (Delta/Iceberg file-set intersection)."""
    t = str(tmp_path / "tbl")
    # two files: keys {1,2} and {900} — the delete's file is disjoint
    # from the merge's read set
    M.commit(_df(spark, [(1, 10.0), (2, 20.0)]).coalesce(1), t)
    M.commit(_df(spark, [(900, 5.0)]).coalesce(1), t)
    source = _df(spark, [(2, 99.0)])

    hooked, orig = _interleave(
        lambda td: M.delete_where(td, [("id", "==", 900)])
    )
    M._publish = hooked
    try:
        v = M.merge_into(spark, t, source, ["id"])
    finally:
        M._publish = orig
    assert v == 4  # base 2 + interleaved delete + rebased merge
    got = {(r["id"], r["amt"]) for r in M.read_version(spark, t).collect()}
    assert got == {(1, 10.0), (2, 99.0)}  # updated AND deleted


def test_merge_aborts_on_overlapping_delete(spark, tmp_path):
    """A delete whose tombstone may hit a file inside the merge's read
    set still aborts: rebasing would resurrect the deleted rows (the
    merge's rewritten dir sits outside the tombstone's dir scope)."""
    t = str(tmp_path / "tbl")
    # ONE file holds both the merge target and the delete target
    M.commit(_df(spark, [(1, 10.0), (2, 20.0), (900, 5.0)]).coalesce(1), t)
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
    # the delete survives; the merge left nothing behind
    got = {(r["id"], r["amt"]) for r in M.read_version(spark, t).collect()}
    assert got == {(1, 10.0), (2, 20.0)}


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


# ------------------------------------------------ r10: rewrite modes


def _part_tbl(spark, t, n_appends=3):
    """Hive-partitioned table with fragmented grp='a' and grp='b'."""
    for i in range(n_appends):
        df = spark.createDataFrame(
            [
                (i * 10 + j, "a" if j < 4 else "b", float(j))
                for j in range(8)
            ],
            "id int, grp string, amt double",
        ).coalesce(1)
        M.commit(df, t, partition_by=["grp"])


def test_disjoint_scoped_optimizes_both_land(spark, tmp_path):
    """Two compact_where on DISJOINT partitions commute — the thing
    that runs concurrently with everything on a busy table."""
    t = str(tmp_path / "tbl")
    _part_tbl(spark, t)
    before = {
        (r["id"], r["grp"], r["amt"])
        for r in M.read_version(spark, t).collect()
    }

    hooked, orig = _interleave(
        lambda td: M.compact_where(spark, td, [("grp", "==", "b")])
    )
    M._publish = hooked
    try:
        v = M.compact_where(spark, t, [("grp", "==", "a")])
    finally:
        M._publish = orig
    assert v == 5  # 3 appends + interleaved compact + rebased compact
    m = M._read_manifest(t, v)
    files = M._load_files(t, m)
    by_part = {}
    for d, es in files.items():
        for e in es:
            by_part.setdefault(e["parts"]["grp"], []).append(e)
    assert len(by_part["a"]) == 1 and len(by_part["b"]) == 1
    after = {
        (r["id"], r["grp"], r["amt"])
        for r in M.read_version(spark, t).collect()
    }
    assert after == before


def test_scoped_optimize_aborts_on_overlapping_optimize(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _part_tbl(spark, t)
    hooked, orig = _interleave(
        lambda td: M.compact_where(spark, td, [("grp", "==", "a")])
    )
    M._publish = hooked
    try:
        with pytest.raises(M.ConcurrentTableModificationError):
            M.compact_where(spark, t, [("grp", "==", "a")])
    finally:
        M._publish = orig
    # the interleaved compaction landed; content intact
    assert M.count_rows(t) == 24


def test_merge_rebases_over_disjoint_scoped_optimize(spark, tmp_path):
    """MERGE computed at base lands over an interleaved scoped
    OPTIMIZE whose replaced+added files provably miss the merge's
    read set."""
    t = str(tmp_path / "tbl")
    # file A: keys 1-2 (merge's target); files B: keys 100+ fragmented
    M.commit(_df(spark, [(1, 10.0), (2, 20.0)]).coalesce(1), t)
    M.commit(_df(spark, [(100, 1.0)]).coalesce(1), t)
    M.commit(_df(spark, [(101, 2.0)]).coalesce(1), t)
    source = _df(spark, [(2, 99.0), (3, 30.0)])

    hooked, orig = _interleave(
        lambda td: M.compact_where(spark, td, [("id", ">=", 100)])
    )
    M._publish = hooked
    try:
        v = M.merge_into(spark, t, source, ["id"])
    finally:
        M._publish = orig
    assert v == 5
    got = {(r["id"], r["amt"]) for r in M.read_version(spark, t).collect()}
    assert got == {(1, 10.0), (2, 99.0), (3, 30.0), (100, 1.0), (101, 2.0)}


def test_merge_aborts_on_overlapping_scoped_optimize(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(_df(spark, [(1, 10.0), (2, 20.0)]).coalesce(1), t)
    M.commit(_df(spark, [(100, 1.0)]).coalesce(1), t)
    source = _df(spark, [(2, 99.0)])

    hooked, orig = _interleave(
        lambda td: M.compact_where(spark, td, [("id", "<=", 50)])
    )
    M._publish = hooked
    try:
        with pytest.raises(M.ConcurrentTableModificationError):
            M.merge_into(spark, t, source, ["id"])
    finally:
        M._publish = orig
    got = {(r["id"], r["amt"]) for r in M.read_version(spark, t).collect()}
    assert got == {(1, 10.0), (2, 20.0), (100, 1.0)}


def test_scoped_optimize_rebases_over_disjoint_delete(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _part_tbl(spark, t)

    hooked, orig = _interleave(
        lambda td: M.delete_where(td, [("grp", "==", "b")])
    )
    M._publish = hooked
    try:
        v = M.compact_where(spark, t, [("grp", "==", "a")])
    finally:
        M._publish = orig
    assert v == 5
    got = {(r["id"], r["grp"]) for r in M.read_version(spark, t).collect()}
    assert {g for _, g in got} == {"a"}  # delete held
    assert len(got) == 12


def test_scoped_optimize_aborts_on_overlapping_delete(spark, tmp_path):
    """A delete whose tombstone may hit the compaction's files aborts
    the rewrite — rebasing would resurrect the deleted rows (the
    compacted dir is outside the tombstone's pinned dir scope)."""
    t = str(tmp_path / "tbl")
    _part_tbl(spark, t)
    hooked, orig = _interleave(
        lambda td: M.delete_where(td, [("id", "==", 1)])  # grp='a' row
    )
    M._publish = hooked
    try:
        with pytest.raises(M.ConcurrentTableModificationError):
            M.compact_where(spark, t, [("grp", "==", "a")])
    finally:
        M._publish = orig
    got = {r["id"] for r in M.read_version(spark, t).collect()}
    assert 1 not in got and len(got) == 23


def test_update_where_rebases_over_disjoint_delete(spark, tmp_path):
    t = str(tmp_path / "tbl")
    M.commit(_df(spark, [(1, 10.0), (2, 20.0)]).coalesce(1), t)
    M.commit(_df(spark, [(900, 5.0)]).coalesce(1), t)

    hooked, orig = _interleave(
        lambda td: M.delete_where(td, [("id", "==", 900)])
    )
    M._publish = hooked
    try:
        v = M.update_where(
            spark, t, [("id", "==", 2)], {"amt": F.lit(99.0)}
        )
    finally:
        M._publish = orig
    assert v == 4
    got = {(r["id"], r["amt"]) for r in M.read_version(spark, t).collect()}
    assert got == {(1, 10.0), (2, 99.0)}


def test_update_where_rebases_over_disjoint_update(spark, tmp_path):
    """Two file-disjoint MoR updates land; the second rebases over the
    first's tombstone+dir pair."""
    t = str(tmp_path / "tbl")
    M.commit(_df(spark, [(1, 10.0), (2, 20.0)]).coalesce(1), t)
    M.commit(_df(spark, [(900, 5.0)]).coalesce(1), t)

    hooked, orig = _interleave(
        lambda td: M.update_where(
            spark, td, [("id", "==", 900)], {"amt": F.lit(55.0)}
        )
    )
    M._publish = hooked
    try:
        v = M.update_where(
            spark, t, [("id", "==", 2)], {"amt": F.lit(99.0)}
        )
    finally:
        M._publish = orig
    assert v == 4
    got = {(r["id"], r["amt"]) for r in M.read_version(spark, t).collect()}
    assert got == {(1, 10.0), (2, 99.0), (900, 55.0)}


def test_merge_still_aborts_on_interleaved_overwrite(spark, tmp_path):
    """Overwrite restructures history: never rebaseable."""
    t = str(tmp_path / "tbl")
    M.commit(_df(spark, [(1, 10.0)]).coalesce(1), t)
    source = _df(spark, [(1, 99.0)])

    hooked, orig = _interleave(
        lambda td: M.commit(
            _df(spark, [(700, 7.0)]), td, mode="overwrite"
        )
    )
    M._publish = hooked
    try:
        with pytest.raises(M.ConcurrentTableModificationError):
            M.merge_into(spark, t, source, ["id"])
    finally:
        M._publish = orig
    got = {(r["id"], r["amt"]) for r in M.read_version(spark, t).collect()}
    assert got == {(700, 7.0)}
