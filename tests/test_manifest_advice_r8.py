"""Regression tests for the round-8 ADVICE findings on the manifest
core: dynamic-partition-overwrite identity for numeric-looking STRING
partition values, the add_constraint validate/publish race, and
declared-type constraint validation over hive partition columns."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from finance_etl_pipeline_spark.operators import manifest as M


def _strtbl(spark, values):
    """One row per (string partition value) with a payload column."""
    return spark.createDataFrame(
        [(v, i) for i, v in enumerate(values)], "mkey string, x int"
    )


def test_dynamic_overwrite_keeps_distinct_string_partitions(
    spark, tmp_path
):
    """'1' and '01' are DIFFERENT string partitions: a dynamic
    overwrite of '1' must not de-reference '01' files (the pre-fix
    behavior: int/float path inference collapsed both to 1)."""
    t = str(tmp_path / "tbl")
    M.commit(_strtbl(spark, ["1", "01", "1.0", "7"]), t, partition_by=["mkey"])

    # overwrite ONLY partition '1'
    M.overwrite_partitions(
        _strtbl(spark, ["1"]).withColumn("x", F.lit(100)), t, ["mkey"]
    )
    got = {
        (r["mkey"], r["x"])
        for r in M.read_version(spark, t).collect()
    }
    assert got == {("1", 100), ("01", 1), ("1.0", 2), ("7", 3)}

    # and overwriting '01' replaces only '01'
    M.overwrite_partitions(
        _strtbl(spark, ["01"]).withColumn("x", F.lit(200)), t, ["mkey"]
    )
    got = {
        (r["mkey"], r["x"])
        for r in M.read_version(spark, t).collect()
    }
    assert got == {("1", 100), ("01", 200), ("1.0", 2), ("7", 3)}


def test_dynamic_overwrite_int_partitions_still_collapse(spark, tmp_path):
    """Declared-numeric partition columns keep numeric identity: the
    same int value always lands in (and replaces) one partition."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    M.commit(df, t, partition_by=["k"])
    M.overwrite_partitions(
        spark.createDataFrame([(1, "A")], "k int, v string"), t, ["k"]
    )
    got = {(r["k"], r["v"]) for r in M.read_version(spark, t).collect()}
    assert got == {(1, "A"), (2, "b")}


def test_add_constraint_revalidates_interleaved_commit(spark, tmp_path):
    """A commit landing between add_constraint's validation read and
    its publish was vetted WITHOUT the new constraint — the retry must
    re-validate it, aborting when it violates and landing when not."""
    orig_publish = M._publish
    state = {"armed": True, "payload": None}

    def hooked(table_dir, build):
        if state["armed"]:
            state["armed"] = False  # guard against recursion
            M.commit(state["payload"], table_dir)
        return orig_publish(table_dir, build)

    def fresh(name):
        t = str(tmp_path / name)
        M.commit(
            spark.createDataFrame(
                [(1, 10.0), (2, 20.0)], "id int, amt double"
            ),
            t,
        )
        return t

    # violating interleave: the constraint must NOT land
    t1 = fresh("bad")
    state.update(
        armed=True,
        payload=spark.createDataFrame([(3, -5.0)], "id int, amt double"),
    )
    M._publish = hooked
    try:
        with pytest.raises(M.ConstraintViolationError):
            M.add_constraint(spark, t1, "amt_pos", "amt > 0")
    finally:
        M._publish = orig_publish
    assert "amt_pos" not in M.table_constraints(t1)
    # the interleaved commit itself landed (it was legal at its time)
    assert M.latest_version(t1) == 2

    # clean interleave: the constraint lands over the moved tip
    t2 = fresh("good")
    state.update(
        armed=True,
        payload=spark.createDataFrame([(4, 40.0)], "id int, amt double"),
    )
    M._publish = hooked
    try:
        v = M.add_constraint(spark, t2, "amt_pos", "amt > 0")
    finally:
        M._publish = orig_publish
    assert M.table_constraints(t2, v) == {"amt_pos": "amt > 0"}
    assert v == 3  # interleaved append became v2; constraint is v3
    # and it gates subsequent writes as usual
    with pytest.raises(M.ConstraintViolationError):
        M.commit(
            spark.createDataFrame([(5, -1.0)], "id int, amt double"), t2
        )


def test_constraint_validates_string_partition_as_declared_type(
    spark, tmp_path
):
    """A CHECK over a numeric-looking STRING partition column must see
    the declared-type value ('012'), not the path-inferred int 12."""
    t = str(tmp_path / "tbl")
    M.commit(_strtbl(spark, ["001", "002"]), t, partition_by=["mkey"])
    M.add_constraint(spark, t, "mkey3", "length(mkey) = 3")
    # a valid 3-char numeric-looking value passes (pre-fix: inference
    # turned '012' into 12, length 2, and the valid write aborted)
    M.commit(_strtbl(spark, ["012"]), t, partition_by=["mkey"])
    # a genuinely violating value still aborts
    with pytest.raises(M.ConstraintViolationError, match="mkey3"):
        M.commit(_strtbl(spark, ["99"]), t, partition_by=["mkey"])
    assert sorted(
        r["mkey"] for r in M.read_version(spark, t).collect()
    ) == ["001", "002", "012"]
