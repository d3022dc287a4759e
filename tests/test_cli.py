"""CLI surface (reference tests/test_cli.py strategy — but our CLI
actually runs the pipeline, unlike the reference stub cli.py:18-21)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args):
    return subprocess.run(
        [sys.executable, "-m", "finance_etl_pipeline_spark.cli", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )


def test_version():
    r = _run("version")
    assert r.returncode == 0
    assert r.stdout.strip() == "0.2.0"


def test_help_lists_commands():
    r = _run("--help")
    assert r.returncode == 0
    for cmd in ("run", "generate", "version"):
        assert cmd in r.stdout


def test_run_requires_month():
    r = _run("run", "--raw-dir", "/tmp/x", "--curated-dir", "/tmp/y",
             "--reference-dir", "/tmp/z")
    assert r.returncode != 0
    assert "--month" in r.stderr


def test_generate_then_dirty_run_exits_2(tmp_path):
    raw, ref, cur = (str(tmp_path / d) for d in ("raw", "ref", "cur"))
    g = _run("generate", "--out-dir", raw, "--reference-dir", ref, "--dirty")
    assert g.returncode == 0
    r = _run(
        "run", "--month", "2025-12", "--raw-dir", raw,
        "--curated-dir", cur, "--reference-dir", ref,
    )
    assert r.returncode == 2  # DQ gate failure is exit 2, not a traceback
    assert "FAIL" in r.stderr


def test_queries_lists_registry():
    r = _run("queries", "--tag", "sampling")
    assert r.returncode == 0
    assert "s_hash_sample" in r.stdout
    assert "q1_pricing_summary" not in r.stdout  # tag filter applied


def test_query_unknown_name_exits_2():
    r = _run("query", "no_such_query")
    assert r.returncode == 2
    assert "unknown query" in r.stderr


def test_sql_subcommand_runs_adhoc_query():
    r = _run(
        "sql",
        "SELECT o_orderpriority, count(*) AS n FROM orders "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority",
    )
    assert r.returncode == 0
    assert "1-URGENT" in r.stdout


def test_sql_subcommand_explain():
    r = _run("sql", "--explain", "SELECT count(*) AS n FROM lineitem")
    assert r.returncode == 0
    assert "Physical Plan" in r.stdout


def test_dashboard_subcommand_renders_html(tmp_path):
    raw, ref, cur = str(tmp_path / "raw"), str(tmp_path / "ref"), str(tmp_path / "cur")
    out = str(tmp_path / "dash.html")
    r = _run("generate", "--out-dir", raw, "--month", "2025-12",
             "--reference-dir", ref)
    assert r.returncode == 0, r.stderr
    r = _run("run", "--month", "2025-12", "--raw-dir", raw,
             "--curated-dir", cur, "--reference-dir", ref)
    assert r.returncode == 0, r.stderr
    r = _run("dashboard", "--curated-dir", cur, "--month", "2025-12",
             "--out", out)
    assert r.returncode == 0, r.stderr
    html = open(out, encoding="utf-8").read()
    assert "Finance Monthly Close Dashboard" in html
    assert "<svg" in html


def test_curate_subcommand_writes_packed_and_audit(tmp_path):
    out = str(tmp_path / "curated")
    r = _run("curate", "--sf-dir", "/root/testdata/sf0.001",
             "--out-dir", out)
    assert r.returncode == 0, r.stderr
    assert "raw:" in r.stdout and "packed_sequences:" in r.stdout
    assert os.path.isdir(os.path.join(out, "packed_sequences"))
    assert os.path.isdir(os.path.join(out, "curation_audit"))


def test_sql_subcommand_manifest_table_view(tmp_path):
    """--manifest-table registers a versioned table as a temp view
    backed by the manifest_table DataSource (pushdown on), including
    @VERSION time travel."""
    import pyspark.sql.functions as F

    from finance_etl_pipeline_spark.operators import manifest as M
    from finance_etl_pipeline_spark.session import get_spark
    from finance_etl_pipeline_spark.sources.readers import table

    spark = get_spark(app_name="cli-mt-setup")
    tbl = str(tmp_path / "tbl")
    o = table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_totalprice"
    )
    M.commit(o.filter(F.col("o_orderkey") % 2 == 0), tbl)
    M.commit(o, tbl, mode="overwrite")
    n_v1 = o.filter(F.col("o_orderkey") % 2 == 0).count()

    r = _run(
        "sql",
        "--manifest-table",
        f"t={tbl}@1",
        "SELECT count(*) AS n FROM t WHERE o_totalprice > 0",
        "--limit",
        "5",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert str(n_v1) in r.stdout

    r2 = _run("sql", "--manifest-table", "garbage-spec", "SELECT 1")
    assert r2.returncode == 2


def test_table_subcommand_history_vacuum_count(tmp_path):
    import pyspark.sql.functions as F

    from finance_etl_pipeline_spark.operators import manifest as M
    from finance_etl_pipeline_spark.session import get_spark
    from finance_etl_pipeline_spark.sources.readers import table

    spark = get_spark(app_name="cli-table-setup")
    tbl = str(tmp_path / "tbl")
    o = table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_totalprice"
    )
    M.commit(o.limit(10), tbl)
    M.commit(o.limit(40), tbl, mode="overwrite")

    r = _run("table", "history", tbl)
    assert r.returncode == 0, r.stderr[-1500:]
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("v")]
    assert lines[0].startswith("v2") and "overwrite" in lines[0]
    assert lines[1].startswith("v1")

    r = _run("table", "count", tbl)
    assert r.returncode == 0
    assert "40 (metadata-only)" in r.stdout

    r = _run("table", "vacuum", tbl, "--retention-seconds", "0")
    assert r.returncode == 0
    assert "removed 1 path(s)" in r.stdout


def test_table_changes_subcommand(tmp_path):
    """table changes DIR --keys k --from-version N prints the
    changefeed (bootstrap at 0, delta thereafter)."""
    import pyspark.sql.functions as F

    from finance_etl_pipeline_spark.operators import manifest as M
    from finance_etl_pipeline_spark.session import get_spark
    from finance_etl_pipeline_spark.sources.readers import table as t_

    spark = get_spark(app_name="tests")
    tbl = str(tmp_path / "tbl")
    o = t_(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_totalprice"
    )
    M.commit(o.limit(20), tbl)
    M.commit(o.limit(30).subtract(o.limit(20)), tbl)

    r = _run(
        "table", "changes", tbl,
        "--keys", "o_orderkey", "--from-version", "1", "--limit", "50",
    )
    assert r.returncode == 0
    assert "added" in r.stdout and "change_type" in r.stdout
    # missing required args: loud usage error, not a traceback
    r2 = _run("table", "changes", tbl)
    assert r2.returncode == 2
    assert "--keys" in r2.stderr


def test_table_constraints_subcommand(tmp_path):
    import pyspark.sql.functions as F

    from finance_etl_pipeline_spark.operators import manifest as M
    from finance_etl_pipeline_spark.session import get_spark
    from finance_etl_pipeline_spark.sources.readers import table as t_

    spark = get_spark(app_name="tests")
    tbl = str(tmp_path / "tbl")
    o = t_(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_totalprice"
    )
    M.commit(o.limit(10), tbl)
    M.add_constraint(spark, tbl, "price_pos", "o_totalprice > 0")
    r = _run("table", "constraints", tbl)
    assert r.returncode == 0
    assert "price_pos\tCHECK (o_totalprice > 0)" in r.stdout
    assert "1 constraint(s)" in r.stdout
