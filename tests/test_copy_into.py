"""COPY INTO (idempotent file ingestion, ``manifest.copy_into`` +
the SQL verb): load-history dedup by source path, carried by reference
through every commit mode, reference-counted by vacuum, and NOT
inherited by clones.

The invariant under test everywhere: however the statement is re-run
— immediately, after unrelated commits, after OPTIMIZE, after RESTORE,
after vacuum — a source file ingests EXACTLY once."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F
import pytest

from finance_etl_pipeline_spark.operators import manifest as M
from finance_etl_pipeline_spark.operators.sqldml import (
    execute_dml,
    is_dml,
)


def _mk_source(spark, path, lo, hi, parts=2):
    spark.range(lo, hi).withColumn(
        "v", (F.col("id") * 10).cast("double")
    ).repartition(parts).write.parquet(path)
    return path


def test_basic_ingest_and_replay(spark, tmp_path):
    src = _mk_source(spark, str(tmp_path / "src"), 0, 100, parts=3)
    t = str(tmp_path / "tbl")
    r1 = M.copy_into(spark, t, src)
    assert r1["ingested"] == 3 and r1["skipped"] == 0
    assert M.read_version(spark, t).count() == 100
    r2 = M.copy_into(spark, t, src)
    assert r2 == {"version": r1["version"], "ingested": 0, "skipped": 3}
    assert M.read_version(spark, t).count() == 100  # no double-load


def test_incremental_files_only(spark, tmp_path):
    src = str(tmp_path / "src")
    _mk_source(spark, src + "/a", 0, 50, parts=2)
    t = str(tmp_path / "tbl")
    M.copy_into(spark, t, src)
    _mk_source(spark, src + "/b", 50, 80, parts=2)
    r = M.copy_into(spark, t, src)
    assert r["ingested"] == 2 and r["skipped"] == 2
    assert M.read_version(spark, t).count() == 80


def test_overwritten_source_path_not_reingested(spark, tmp_path):
    """Delta's identity rule: path-only.  Rewriting a source file in
    place does NOT re-ingest — changed data ships under a new name."""
    src = str(tmp_path / "src")
    _mk_source(spark, src, 0, 10, parts=1)
    t = str(tmp_path / "tbl")
    M.copy_into(spark, t, src)
    f = glob.glob(os.path.join(src, "part-*.parquet"))[0]
    # overwrite the file bytes under the SAME path
    tmp2 = str(tmp_path / "other")
    _mk_source(spark, tmp2, 100, 110, parts=1)
    os.replace(glob.glob(os.path.join(tmp2, "part-*.parquet"))[0], f)
    r = M.copy_into(spark, t, src)
    assert r["ingested"] == 0
    assert M.read_version(spark, t).count() == 10


def test_history_survives_unrelated_commits_and_optimize(
    spark, tmp_path
):
    src = _mk_source(spark, str(tmp_path / "src"), 0, 40)
    t = str(tmp_path / "tbl")
    M.copy_into(spark, t, src)
    M.commit(
        spark.range(1000, 1005).withColumn(
            "v", F.lit(0.0)
        ),
        t,
        mode="append",
    )
    M.compact_table(spark, t)
    M.delete_where(t, [("id", "==", 1000)])
    r = M.copy_into(spark, t, src)
    assert r["ingested"] == 0, "load history lost through commits"


def test_history_survives_restore(spark, tmp_path):
    src1 = _mk_source(spark, str(tmp_path / "s1"), 0, 30)
    src2 = _mk_source(spark, str(tmp_path / "s2"), 30, 60)
    t = str(tmp_path / "tbl")
    M.copy_into(spark, t, src1)  # v1
    v_before = M.latest_version(t)
    M.copy_into(spark, t, src2)  # v2
    M.restore_table(t, version=v_before)  # tip := v1 state
    # Delta-parity semantics: RESTORE keeps the TIP's load history —
    # the src2 rows are gone from the data but remain recorded as
    # loaded, so a replay does not re-ingest them (document of record:
    # ship changed data under new file names)
    r = M.copy_into(spark, t, src2)
    assert r["ingested"] == 0
    assert M.read_version(spark, t).count() == 30


def test_vacuum_keeps_live_history_sweeps_dead(spark, tmp_path):
    src1 = _mk_source(spark, str(tmp_path / "s1"), 0, 20)
    src2 = _mk_source(spark, str(tmp_path / "s2"), 20, 40)
    t = str(tmp_path / "tbl")
    M.copy_into(spark, t, src1)
    M.copy_into(spark, t, src2)  # supersedes s1's history shard
    cs = lambda: {  # noqa: E731
        os.path.basename(p)
        for p in glob.glob(os.path.join(t, "_manifests", "cs-*.json"))
    }
    assert len(cs()) == 2
    M.vacuum(t, keep_last=1, retention_seconds=0.0)
    live = cs()
    assert len(live) == 1  # v1's shard was unreferenced -> swept
    m = M._read_manifest(t, M.latest_version(t))
    assert m["copy_sources_ref"]["shard"] in live
    # the surviving history still dedups BOTH sources
    assert M.copy_into(spark, t, src1)["ingested"] == 0
    assert M.copy_into(spark, t, src2)["ingested"] == 0


def test_clone_does_not_inherit_history(spark, tmp_path):
    src = _mk_source(spark, str(tmp_path / "src"), 0, 25)
    t = str(tmp_path / "tbl")
    M.copy_into(spark, t, src)
    c = str(tmp_path / "clone")
    M.clone_table(t, c)
    assert M.copy_sources(c) == {}  # like txns: writer/load progress
    r = M.copy_into(spark, c, src)  # a clone may legitimately re-load
    assert r["ingested"] > 0


def test_schema_evolution_through_copy(spark, tmp_path):
    src1 = str(tmp_path / "s1")
    spark.range(0, 10).write.parquet(src1)
    src2 = str(tmp_path / "s2")
    spark.range(10, 20).withColumn(
        "extra", F.lit("x")
    ).write.parquet(src2)
    t = str(tmp_path / "tbl")
    M.copy_into(spark, t, src1)
    M.copy_into(spark, t, src2)  # append-mode evolution: adds `extra`
    df = M.read_version(spark, t)
    assert set(df.columns) == {"id", "extra"}
    assert df.filter(F.col("extra").isNull()).count() == 10


def test_errors(spark, tmp_path):
    t = str(tmp_path / "tbl")
    with pytest.raises(ValueError, match="matched no files"):
        M.copy_into(spark, t, str(tmp_path / "empty"))
    src = _mk_source(spark, str(tmp_path / "src"), 0, 5)
    M.copy_into(spark, t, src)
    with pytest.raises(ValueError, match="self-ingestion"):
        M.copy_into(spark, t, os.path.join(t, "data"), pattern="part-*")


def test_sql_verb_and_cli(spark, tmp_path, capsys):
    from finance_etl_pipeline_spark.cli import main as cli_main

    src = _mk_source(spark, str(tmp_path / "src"), 0, 12)
    t = str(tmp_path / "tbl")
    stmt = f"COPY INTO t FROM '{src}'"
    assert is_dml(stmt)
    res = execute_dml(spark, stmt, {"t": t})
    assert res["op"] == "copy_into" and res["ingested"] == 2
    rc = cli_main(["sql", stmt, "--manifest-table", f"t={t}"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "0 ingested" in out and "2 skipped" in out
    # glob source + PATTERN form parse
    res2 = execute_dml(
        spark,
        f"COPY INTO t FROM '{src}' PATTERN = 'part-*.parquet'",
        {"t": t},
    )
    assert res2["ingested"] == 0


# ------------------------------------------------- review-pass fixes


def test_glob_source_honors_pattern(spark, tmp_path):
    """PATTERN filters a GLOB source too — a matching non-parquet
    sibling must be excluded, not fed to the reader."""
    root = str(tmp_path / "drops")
    _mk_source(spark, root + "/drop1", 0, 10, parts=1)
    f = glob.glob(os.path.join(root, "drop1", "part-*.parquet"))[0]
    os.rename(f, os.path.join(root, "drop1", "batch.parquet"))
    with open(os.path.join(root, "drop1", "batch-notes.txt"), "w") as fh:
        fh.write("not parquet")
    t = str(tmp_path / "tbl")
    r = M.copy_into(
        spark, t, root + "/drop1/batch*", pattern="*.parquet"
    )
    assert r["ingested"] == 1  # the .txt never reached the reader
    assert M.read_version(spark, t).count() == 10


def test_unreadable_source_is_clean_error_and_no_shard_leak(
    spark, tmp_path
):
    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(os.path.join(src, "junk.parquet"), "w") as fh:
        fh.write("definitely not parquet")
    t = str(tmp_path / "tbl")
    M.commit(spark.range(3).withColumn("v", F.lit(1.0)), t)
    with pytest.raises(ValueError, match="could not read"):
        M.copy_into(spark, t, src)
    # no orphan load-history shard was written for the failed attempt
    assert glob.glob(os.path.join(t, "_manifests", "cs-*.json")) == []


def test_dangling_history_shard_blocks_loudly(spark, tmp_path):
    """A missing referenced history shard must BLOCK ingestion, never
    degrade to an empty history (that would double-load)."""
    src = _mk_source(spark, str(tmp_path / "src"), 0, 10)
    t = str(tmp_path / "tbl")
    M.copy_into(spark, t, src)
    for p in glob.glob(os.path.join(t, "_manifests", "cs-*.json")):
        os.unlink(p)
    with pytest.raises(RuntimeError, match="load-history shard"):
        M.copy_into(spark, t, src)
