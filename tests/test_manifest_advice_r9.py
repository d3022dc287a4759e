"""Regressions for the round-9 ADVICE items: CLI scoped-OPTIMIZE value
typing on string-declared partition columns, and the changes() rename/
drop target-name collision.  (The bloom contract-edge items live in
tests/test_bloom_skipping.py.)"""

from __future__ import annotations

import pytest

from finance_etl_pipeline_spark.cli import main as cli_main
from finance_etl_pipeline_spark.operators import manifest as M


def test_cli_compact_where_keeps_string_partition_identity(
    spark, tmp_path
):
    """`table compact --where mkey=01` on a STRING-partitioned table
    must scope to exactly the '01' partition — not every numerically-
    equal string partition ('1', '1.0')."""
    t = str(tmp_path / "tbl")
    for _ in range(2):  # two appends -> fragmented partitions
        df = spark.createDataFrame(
            [(1, "01"), (2, "01"), (3, "1"), (4, "1.0")],
            "id int, mkey string",
        ).coalesce(1)
        M.commit(df, t, partition_by=["mkey"])

    def files_by_part():
        m = M._read_manifest(t, M.latest_version(t))
        files = M._load_files(t, m)
        out = {}
        for d, es in files.items():
            for e in es:
                k = e["parts"]["mkey"]
                out.setdefault(k, set()).add(e["path"])
        return out

    before = files_by_part()
    assert len(before["01"]) == 2 and len(before["1"]) == 2
    rc = cli_main(["table", "compact", t, "--where", "mkey=01"])
    assert rc == 0
    after = files_by_part()
    assert len(after["01"]) == 1  # compacted
    assert after["1"] == before["1"]  # untouched
    assert after["1.0"] == before["1.0"]  # untouched
    got = sorted(
        (r.id, r.mkey)
        for r in M.read_version(spark, t).collect()
    )
    assert got == sorted(
        [(1, "01"), (2, "01"), (3, "1"), (4, "1.0")] * 2
    )


def test_changes_rename_onto_dropped_name_fails_specifically(
    spark, tmp_path
):
    """old has (a, b); the span drops b and renames a->b.  The old
    snapshot would alias two columns to 'b' — changes() must raise the
    specific collision error, not Spark's ambiguous-reference error."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, 10, 100)], "k int, a int, b int")
    M.commit(df, t)
    M.drop_column(t, "b")
    M.rename_column(t, "a", "b")
    with pytest.raises(ValueError, match="collides with dropped"):
        M.changes(spark, t, ["k"], 1, 3)
    # sub-spans on either side of the rename still diff cleanly
    assert M.changes(spark, t, ["k"], 1, 2).count() >= 0
    assert M.changes(spark, t, ["k"], 2, 3).count() >= 0
