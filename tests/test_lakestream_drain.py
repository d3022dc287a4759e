"""drain(): AvailableNow-semantics capped draining — a multi-version
backlog drains COMPLETELY in >1 bounded micro-batches (the engine's
AvailableNow wrapper would stop after one capped batch), equals the
batch read bit-for-bit, survives a mid-drain kill, and pins the tip
observed at call time."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from finance_etl_pipeline_spark.operators import manifest as M
from finance_etl_pipeline_spark.sources.lakestream import drain
from finance_etl_pipeline_spark.streaming.sink import (
    append_stream_to_manifest,
)


def _backlog(spark, src, n_versions=10, rows_per=6, files_per=2):
    for v in range(n_versions):
        df = spark.createDataFrame(
            [(v * rows_per + j, f"v{v}") for j in range(rows_per)],
            "id long, tag string",
        ).repartition(files_per)
        M.commit(df, src)


def _sink_rows(spark, sink_t):
    return sorted(
        (r.id, r.tag) for r in M.read_version(spark, sink_t).collect()
    )


def test_drain_completes_backlog_in_bounded_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    sink_t = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ck")
    _backlog(spark, src, n_versions=10, files_per=2)

    out = drain(
        spark,
        src,
        lambda df: append_stream_to_manifest(df, sink_t, app_id="drain_t"),
        ckpt,
        max_files_per_trigger=4,
    )
    assert out["reached_tip"] is True
    assert out["tip"] == 10
    # 20 backlog files / cap 4 = at least 5 bounded batches — the
    # whole point vs AvailableNow-on-a-capped-source (one batch)
    assert out["batches"] >= 5
    expected = sorted(
        (v * 6 + j, f"v{v}") for v in range(10) for j in range(6)
    )
    assert _sink_rows(spark, sink_t) == expected


def test_drain_survives_mid_drain_kill(spark, tmp_path):
    """A sink that dies on its 3rd micro-batch kills the query mid-
    backlog; re-draining on the same checkpoint resumes exactly-once
    and the final sink equals the batch read."""
    src = str(tmp_path / "src")
    sink_t = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ck")
    _backlog(spark, src, n_versions=10, files_per=2)

    calls = {"n": 0}

    def _dying_writer(df):
        from finance_etl_pipeline_spark.operators import (
            manifest as Mm,
        )

        def _process(batch_df, batch_id):
            if batch_df.isEmpty():
                return
            calls["n"] += 1
            if calls["n"] >= 3:
                raise RuntimeError("injected mid-drain kill")
            Mm.commit(batch_df, sink_t, txn=("drain_kill", batch_id))

        return df.writeStream.foreachBatch(_process).outputMode("append")

    with pytest.raises(Exception, match="injected mid-drain kill"):
        drain(
            spark,
            src,
            _dying_writer,
            ckpt,
            max_files_per_trigger=4,
        )
    partial = len(_sink_rows(spark, sink_t))
    assert 0 < partial < 60  # genuinely mid-backlog

    out = drain(
        spark,
        src,
        lambda df: append_stream_to_manifest(
            df, sink_t, app_id="drain_kill"
        ),
        ckpt,
        max_files_per_trigger=4,
    )
    assert out["reached_tip"] is True
    expected = sorted(
        (v * 6 + j, f"v{v}") for v in range(10) for j in range(6)
    )
    assert _sink_rows(spark, sink_t) == expected  # no dupes, no holes


def test_drain_max_batches_resumes(spark, tmp_path):
    """max_batches bounds one call's work; a second call resumes from
    the checkpoint and finishes — two runs, one exactly-once result."""
    src = str(tmp_path / "src")
    sink_t = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ck")
    _backlog(spark, src, n_versions=8, files_per=2)

    first = drain(
        spark,
        src,
        lambda df: append_stream_to_manifest(df, sink_t, app_id="d_mb"),
        ckpt,
        max_files_per_trigger=2,
        max_batches=2,
    )
    assert first["batches"] >= 2
    second = drain(
        spark,
        src,
        lambda df: append_stream_to_manifest(df, sink_t, app_id="d_mb"),
        ckpt,
        max_files_per_trigger=4,
    )
    assert second["reached_tip"] is True
    expected = sorted(
        (v * 6 + j, f"v{v}") for v in range(8) for j in range(6)
    )
    assert _sink_rows(spark, sink_t) == expected


def test_drain_pins_tip_at_call_time(spark, tmp_path):
    """Data committed AFTER the drain starts is left for the next
    call (AvailableNow semantics) — proven by committing from inside
    the sink itself."""
    src = str(tmp_path / "src")
    sink_t = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ck")
    _backlog(spark, src, n_versions=4, files_per=1)
    late = spark.createDataFrame([(999, "late")], "id long, tag string")
    fired = {"done": False}

    def _writer(df):
        from finance_etl_pipeline_spark.operators import (
            manifest as Mm,
        )

        def _process(batch_df, batch_id):
            if batch_df.isEmpty():
                return
            Mm.commit(batch_df, sink_t, txn=("d_pin", batch_id))
            if not fired["done"]:
                fired["done"] = True
                Mm.commit(late, src)  # lands mid-drain

        return df.writeStream.foreachBatch(_process).outputMode("append")

    out = drain(
        spark, src, _writer, ckpt, max_files_per_trigger=1
    )
    assert out["tip"] == 4 and out["reached_tip"] is True
    got = _sink_rows(spark, sink_t)
    assert (999, "late") not in got and len(got) == 24
    # the next drain picks it up
    out2 = drain(
        spark,
        src,
        lambda df: append_stream_to_manifest(df, sink_t, app_id="d_pin"),
        ckpt,
    )
    assert out2["reached_tip"] is True
    assert (999, "late") in _sink_rows(spark, sink_t)


def test_drain_empty_backlog_is_a_noop(spark, tmp_path):
    src = str(tmp_path / "src")
    sink_t = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ck")
    _backlog(spark, src, n_versions=2, files_per=1)
    for _ in range(2):
        out = drain(
            spark,
            src,
            lambda df: append_stream_to_manifest(df, sink_t, app_id="d_e"),
            ckpt,
        )
        assert out["reached_tip"] is True
    assert len(_sink_rows(spark, sink_t)) == 12  # second call added 0


def test_cli_drain_end_to_end(spark, tmp_path, capsys):
    from finance_etl_pipeline_spark.cli import main as cli_main

    src = str(tmp_path / "src")
    sink_t = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ck")
    _backlog(spark, src, n_versions=6, files_per=2)
    rc = cli_main(
        [
            "drain", src, sink_t,
            "--checkpoint", ckpt,
            "--max-files", "4",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "drained at v6" in out
    expected = sorted(
        (v * 6 + j, f"v{v}") for v in range(6) for j in range(6)
    )
    assert _sink_rows(spark, sink_t) == expected
    # a second run is a no-op drain on the same checkpoint
    rc = cli_main(
        ["drain", src, sink_t, "--checkpoint", ckpt, "--max-files", "4"]
    )
    assert rc == 0
    assert _sink_rows(spark, sink_t) == expected


def test_cli_drain_by_catalog_name(spark, tmp_path, capsys):
    from finance_etl_pipeline_spark.cli import main as cli_main
    from finance_etl_pipeline_spark.operators import catalog as C

    root = str(tmp_path / "wh")
    src = C.create_table(root, "src_t")
    _backlog(spark, src, n_versions=3, files_per=1)
    rc = cli_main(
        [
            "drain", "src_t", "sink_t",
            "--checkpoint", str(tmp_path / "ck"),
            "--max-files", "2",
            "--warehouse", root,
        ]
    )
    assert rc == 0
    assert "drained at v3" in capsys.readouterr().out
    got = _sink_rows(spark, C.resolve(root, "sink_t"))
    assert len(got) == 18


def test_fresh_checkpoint_into_reused_sink_lands(spark, tmp_path, capsys):
    """A SECOND source drained into the SAME sink under a FRESH
    checkpoint must land (the txn app_id is checkpoint-scoped — a
    sink-derived id would silently replay-drop every batch because
    batch ids restart at 0)."""
    from finance_etl_pipeline_spark.cli import main as cli_main

    src1 = str(tmp_path / "src1")
    src2 = str(tmp_path / "src2")
    sink_t = str(tmp_path / "sink")
    _backlog(spark, src1, n_versions=3, files_per=1)
    for v in range(3):
        df = spark.createDataFrame(
            [(1000 + v * 6 + j, f"w{v}") for j in range(6)],
            "id long, tag string",
        ).coalesce(1)
        M.commit(df, src2)

    rc = cli_main(
        ["drain", src1, sink_t, "--checkpoint", str(tmp_path / "ck1")]
    )
    assert rc == 0
    rc = cli_main(
        ["drain", src2, sink_t, "--checkpoint", str(tmp_path / "ck2")]
    )
    assert rc == 0
    got = _sink_rows(spark, sink_t)
    assert len(got) == 36  # both sources, no silent replay-drop
    assert (1000, "w0") in got
