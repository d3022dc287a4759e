"""CLI — actually invokes the pipeline (unlike the reference's stub,
reference cli.py:18-21 which only parses args). argparse, std-lib only.

Usage:
    python -m finance_etl_pipeline_spark.cli run \
        --month 2025-12 --raw-dir data/raw --curated-dir data/curated \
        --reference-dir data/reference [--fail-on ERROR|WARN|NEVER]
    python -m finance_etl_pipeline_spark.cli generate \
        --out-dir data/raw --month 2025-12 [--seed 42] [--dirty]
    python -m finance_etl_pipeline_spark.cli version
    python -m finance_etl_pipeline_spark.cli queries [--tag TAG]
    python -m finance_etl_pipeline_spark.cli query NAME \
        [--sf-dir /root/testdata/sf0.001] [--limit 20] [--explain]
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="finance-etl-spark")
    sub = parser.add_subparsers(dest="command", required=True)

    run_p = sub.add_parser("run", help="run the monthly pipeline")
    run_p.add_argument("--month", required=True, help="YYYY-MM")
    run_p.add_argument("--raw-dir", required=True)
    run_p.add_argument("--curated-dir", required=True)
    run_p.add_argument("--reference-dir", required=True)
    run_p.add_argument(
        "--fail-on", default="ERROR", choices=["ERROR", "WARN", "NEVER"]
    )
    run_p.add_argument(
        "--money-mode",
        default="double",
        choices=["double", "decimal"],
        help="decimal = exact DecimalType money arithmetic (SURVEY §7.6.9)",
    )

    gen_p = sub.add_parser("generate", help="generate synthetic raw CSVs")
    gen_p.add_argument("--out-dir", required=True)
    gen_p.add_argument("--month", default="2025-12")
    gen_p.add_argument("--seed", type=int, default=42)
    gen_p.add_argument("--dirty", action="store_true")
    gen_p.add_argument("--reference-dir", default=None)

    sub.add_parser("version", help="print version")

    ls_p = sub.add_parser("queries", help="list registered queries")
    ls_p.add_argument("--tag", default=None, help="filter by tag")

    q_p = sub.add_parser("query", help="run a registered query by name")
    q_p.add_argument("name")
    q_p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q_p.add_argument("--limit", type=int, default=20)
    q_p.add_argument(
        "--explain",
        action="store_true",
        help="print the formatted physical plan instead of rows",
    )

    cur_p = sub.add_parser(
        "curate",
        help="run the training-data curation DAG (gate -> dedup -> "
        "chunk -> pack) over a documents parquet and write packed "
        "sequences + the audit trail",
    )
    cur_p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    cur_p.add_argument("--out-dir", required=True)

    dash_p = sub.add_parser(
        "dashboard",
        help="render the monthly-close HTML dashboard from a curated dir "
        "(reference scripts/build_dashboard.py; inline-SVG charts, no "
        "plotting dependency)",
    )
    dash_p.add_argument("--curated-dir", required=True)
    dash_p.add_argument("--month", required=True, help="YYYY-MM")
    dash_p.add_argument(
        "--out", default=None, help="default: reports/<month>/dashboard.html"
    )

    sql_p = sub.add_parser(
        "sql",
        help="run ad-hoc Spark SQL with every testdata table "
        "pre-registered as a temp view",
    )
    sql_p.add_argument("statement")
    sql_p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    sql_p.add_argument("--limit", type=int, default=20)
    sql_p.add_argument(
        "--explain",
        action="store_true",
        help="print the formatted physical plan instead of rows",
    )
    sql_p.add_argument(
        "--manifest-table",
        action="append",
        default=[],
        metavar="NAME=DIR[@VERSION|@TIMESTAMP]",
        help="register a versioned manifest table as a temp view "
        "(repeatable); @N time-travels to version N, @<ISO-8601 or "
        "decimal epoch seconds> to the latest version at that "
        "instant (all-digits pins read as versions); default "
        "latest. UN-pinned names also time-travel INSIDE the "
        "statement: FROM name VERSION AS OF n, TIMESTAMP AS OF "
        "'ts', or name@n. Reads go through the manifest_table "
        "DataSource with filter pushdown into footer-stats file "
        "skipping; SELECTs whose whole select-list is count/min/max "
        "over ONE table (optionally WHERE partition-equality "
        "conjuncts and/or GROUP BY partition columns) answer from "
        "manifest stats alone — exact or they fall back, 0 data "
        "files opened. UPDATE/DELETE/MERGE INTO/INSERT/"
        "OPTIMIZE/VACUUM [DRY RUN]/RESTORE TABLE/COPY INTO t FROM "
        "'<dir|glob>' [PATTERN = '<glob>'] (idempotent ingestion)/"
        "CONVERT TO MANIFEST '<dir>' AS t (zero-copy adoption)/"
        "DESCRIBE HISTORY|DETAIL/SHOW PARTITIONS statements against "
        "UN-pinned names execute on the manifest log (see "
        "operators/sqldml.py for the supported subset).",
    )
    sql_p.add_argument(
        "--txn",
        default=None,
        metavar="APP_ID:VERSION",
        help="idempotency stamp for MERGE INTO (writer txn — a replay "
        "with the same or older version becomes a no-op)",
    )
    sql_p.add_argument(
        "--evolve-schema",
        action="store_true",
        help="let MERGE INTO widen the table with new source columns "
        "(Delta autoMerge semantics); off = new columns abort loudly",
    )
    sql_p.add_argument(
        "--warehouse",
        default=None,
        metavar="ROOT",
        help="warehouse root with a name catalog (operators/"
        "catalog.py): every cataloged table is pre-registered as a "
        "temp view AND as a DML target by NAME (catalog VIEWS expand "
        "too), and CREATE TABLE [AS] / DROP TABLE [PURGE] / SHOW "
        "TABLES / CREATE [OR REPLACE] VIEW ... AS / DROP VIEW / "
        "SHOW VIEWS / ALTER TABLE RENAME TO statements manage the "
        "catalog",
    )

    drain_p = sub.add_parser(
        "drain",
        help="drain a manifest table's backlog into another manifest "
        "table in BOUNDED micro-batches, then stop (AvailableNow x "
        "admission control — sources/lakestream.py::drain)",
    )
    drain_p.add_argument("src", help="source table dir (or NAME with --warehouse)")
    drain_p.add_argument("sink", help="sink table dir (or NAME with --warehouse)")
    drain_p.add_argument("--checkpoint", required=True)
    drain_p.add_argument("--max-files", type=int, default=None)
    drain_p.add_argument(
        "--max-bytes", default=None,
        help="soft per-batch byte cap; accepts '64m'-style suffixes",
    )
    drain_p.add_argument(
        "--max-batches", type=int, default=None,
        help="stop after ~this many data micro-batches (resume later)",
    )
    drain_p.add_argument("--starting-version", default=None)
    drain_p.add_argument("--timeout-secs", type=float, default=600.0)
    drain_p.add_argument(
        "--partition-by", default=None,
        help="comma-separated hive partition columns for the sink",
    )
    drain_p.add_argument(
        "--warehouse", default=None, metavar="ROOT",
        help="resolve src/sink as catalog NAMEs under this root "
        "(the sink is created if missing)",
    )

    tbl_p = sub.add_parser(
        "table",
        help="versioned manifest-table maintenance "
        "(history / vacuum / compact / count)",
    )
    tbl_p.add_argument(
        "action",
        choices=[
            "history",
            "vacuum",
            "compact",
            "count",
            "changes",
            "clone",
            "constraints",
            "columns",
            "bloom",
            "partitions",
            "restore",
            "convert",
        ],
    )
    tbl_p.add_argument(
        "dir", help="table root directory, or a catalog NAME with "
        "--warehouse"
    )
    tbl_p.add_argument(
        "--warehouse",
        default=None,
        metavar="ROOT",
        help="resolve the positional argument as a catalog table "
        "NAME under this warehouse root",
    )
    tbl_p.add_argument("--keep-last", type=int, default=1)
    tbl_p.add_argument("--retention-seconds", type=float, default=3600.0)
    tbl_p.add_argument("--target-bytes", type=int, default=None)
    tbl_p.add_argument(
        "--zorder", default=None, help="comma-separated z-order columns"
    )
    tbl_p.add_argument(
        "--keys",
        default=None,
        help="comma-separated key columns (required for `changes`)",
    )
    tbl_p.add_argument(
        "--cols",
        default=None,
        help="comma-separated columns (required for `bloom`)",
    )
    tbl_p.add_argument(
        "--where",
        default=None,
        help="scoped OPTIMIZE predicate for `compact`: "
        "col=value[,col=value...] (file-aligned, e.g. partition "
        "columns) — compacts only the matching files",
    )
    tbl_p.add_argument(
        "--from-version",
        type=int,
        default=None,
        help="changefeed start (exclusive; 0 = bootstrap full snapshot)",
    )
    tbl_p.add_argument(
        "--to-version",
        type=int,
        default=None,
        help="changefeed end (inclusive; default latest)",
    )
    tbl_p.add_argument("--limit", type=int, default=20)
    tbl_p.add_argument(
        "--into",
        default=None,
        help="clone target directory (required for `clone`), or the "
        "NEW table directory for `convert` (required there; the "
        "positional dir is then the parquet SOURCE to adopt in "
        "place — zero bytes copied)",
    )
    tbl_p.add_argument(
        "--version",
        type=int,
        default=None,
        help="source version to clone, or the rollback target for "
        "`restore` (required there)",
    )

    args = parser.parse_args(argv)

    if args.command == "version":
        from finance_etl_pipeline_spark import __version__

        print(__version__)
        return 0

    if args.command == "queries":
        from finance_etl_pipeline_spark.plans import all_queries

        for name, qd in sorted(all_queries().items()):
            if args.tag and args.tag not in qd.tags:
                continue
            oracle = "oracle" if qd.oracle else "rows-only"
            print(f"{name}\t[{', '.join(qd.tags)}]\t{oracle}")
        return 0

    if args.command == "query":
        from finance_etl_pipeline_spark.plans import all_queries
        from finance_etl_pipeline_spark.session import get_spark

        qs = all_queries()
        if args.name not in qs:
            print(f"unknown query: {args.name}", file=sys.stderr)
            return 2
        spark = get_spark(app_name=f"query-{args.name}")
        df = qs[args.name].fn(spark, args.sf_dir)
        if args.explain:
            df.explain(mode="formatted")
        else:
            df.show(args.limit, truncate=False)
        return 0

    if args.command == "sql":
        from finance_etl_pipeline_spark.session import get_spark
        from finance_etl_pipeline_spark.sources.readers import TABLES, table

        spark = get_spark(app_name="adhoc-sql")
        for t in TABLES:
            table(spark, args.sf_dir, t).createOrReplaceTempView(t)
        dml_tables: dict[str, str] = {}  # un-pinned manifest views
        if args.manifest_table or args.warehouse:
            from finance_etl_pipeline_spark.sources.lakestream import (
                ManifestTableDataSource,
            )

            spark.dataSource.register(ManifestTableDataSource)
            spark.conf.set(
                "spark.sql.python.filterPushdown.enabled", "true"
            )
        if args.warehouse:
            from finance_etl_pipeline_spark.operators import (
                catalog as _cat,
            )
            from finance_etl_pipeline_spark.operators import (
                manifest as _m,
            )
            from finance_etl_pipeline_spark.operators.sqldml import (
                execute_ddl,
                is_ddl,
            )

            # pure-catalog DDL (SHOW/DROP/RENAME/plain CREATE)
            # must work even when a cataloged table is broken, and
            # needs no Spark loads — register views only for
            # statements that read tables (CTAS, DML, SELECT), and
            # degrade a broken table to a warning, never a wedge
            import re as _re

            stmt_reads_tables = not is_ddl(args.statement) or bool(
                _re.search(r"\bAS\b", args.statement, _re.IGNORECASE)
            )
            if stmt_reads_tables:
                for row in _cat.show_tables(args.warehouse):
                    dml_tables[row["name"]] = row["dir"]
                    try:
                        if _m.latest_version(row["dir"]) > 0:
                            (
                                spark.read.format("manifest_table")
                                .option("table_dir", row["dir"])
                                .option("pushdown", "true")
                                .load()
                                .createOrReplaceTempView(row["name"])
                            )
                    except Exception as e:  # noqa: BLE001
                        print(
                            f"warning: cataloged table "
                            f"{row['name']!r} failed to register "
                            f"({e}); skipping its view",
                            file=sys.stderr,
                        )
                from finance_etl_pipeline_spark.operators.sqldml import (
                    register_catalog_views,
                )

                for vname, err in sorted(
                    register_catalog_views(spark, args.warehouse).items()
                ):
                    if err is not None:
                        # split (never empty), not splitlines ([] on "")
                        print(
                            f"warning: cataloged view {vname!r} "
                            f"failed to register "
                            f"({err.split(chr(10), 1)[0]}); skipping it",
                            file=sys.stderr,
                        )
            if is_ddl(args.statement):
                from pyspark.errors import AnalysisException

                try:
                    res = execute_ddl(
                        spark, args.statement, args.warehouse
                    )
                except (ValueError, AnalysisException) as e:
                    print(f"DDL error: {e}", file=sys.stderr)
                    return 2
                if res["op"] == "show_tables":
                    for row in res["rows"]:
                        kind = (
                            "managed" if row["managed"] else "external"
                        )
                        print(f"{row['name']}\t{row['dir']}\t{kind}")
                elif res["op"] == "show_views":
                    for row in res["rows"]:
                        print(f"{row['name']}\t{row['sql']}")
                elif "version" in res:
                    print(
                        f"{res['table']} -> {res['dir']} "
                        f"v{res['version']} ({res['op']})"
                    )
                elif "dir" in res:
                    print(
                        f"{res['table']} -> {res['dir']} ({res['op']})"
                    )
                else:
                    print(f"{res['table']} ({res['op']})")
                return 0
        if args.manifest_table:
            for spec in args.manifest_table:
                name, _, rest = spec.partition("=")
                tdir, _, ver = rest.partition("@")
                if not name or not tdir:
                    print(
                        f"bad --manifest-table spec: {spec!r} "
                        "(want NAME=DIR[@VERSION])",
                        file=sys.stderr,
                    )
                    return 2
                reader = (
                    spark.read.format("manifest_table")
                    .option("table_dir", tdir)
                    .option("pushdown", "true")
                )
                if ver:
                    # digits = version number; anything else is a
                    # timestamp (ISO-8601 or epoch seconds) for as_of
                    if ver.isdigit():
                        reader = reader.option("version", int(ver))
                    else:
                        reader = reader.option("as_of", ver)
                else:
                    # DML always applies to the TIP; a @VERSION-pinned
                    # view is a read-only snapshot by construction
                    dml_tables[name] = tdir
                reader.load().createOrReplaceTempView(name)
        from finance_etl_pipeline_spark.operators.sqldml import (
            execute_dml,
            is_dml,
        )

        if is_dml(args.statement):
            txn = None
            if args.txn:
                app_id, _, txn_ver = args.txn.rpartition(":")
                if not app_id or not txn_ver.isdigit():
                    print(
                        f"bad --txn spec: {args.txn!r} "
                        "(want APP_ID:VERSION)",
                        file=sys.stderr,
                    )
                    return 2
                txn = (app_id, int(txn_ver))
            from pyspark.errors import AnalysisException

            from finance_etl_pipeline_spark.operators.manifest import (
                ConcurrentTableModificationError,
                VersionNotFoundError,
            )

            try:
                res = execute_dml(
                    spark,
                    args.statement,
                    dml_tables,
                    txn=txn,
                    evolve_schema=args.evolve_schema,
                )
            except ConcurrentTableModificationError as e:
                print(f"conflict: {e}", file=sys.stderr)
                return 3
            except VersionNotFoundError as e:
                # RESTORE to a never-published or vacuumed version
                print(f"DML error: {e}", file=sys.stderr)
                return 2
            except AnalysisException as e:
                # an INSERT payload with a bad expression lands here
                print(f"DML error: {e}", file=sys.stderr)
                return 2
            except ValueError as e:
                # SqlDmlError (parse subset) and operator-level aborts
                # (schema evolution, dup keys, ...) both land here —
                # a clean exit with the reason, not a traceback
                print(f"DML error: {e}", file=sys.stderr)
                return 2
            if res["op"] == "describe_history":
                for row in res["rows"]:
                    print(
                        f"v{row['version']}\t{row['mode']}\t"
                        f"ts={row['ts']}\tdirs={row['n_dirs']}\t"
                        f"files={row['n_files']}\trows={row['n_rows']}"
                    )
            elif res["op"] == "describe_detail":
                for k, val in res["detail"].items():
                    print(f"{k}\t{val}")
            elif res["op"] == "vacuum_dry_run":
                for p in res["paths"]:
                    print(p)
                print(
                    f"{res['table']} v{res['version']} "
                    f"(dry run: {res['removed']} path(s) reclaimable)"
                )
            elif res["op"] == "vacuum":
                print(
                    f"{res['table']} v{res['version']} "
                    f"({res['op']}: {res['removed']} removed)"
                )
            elif res["op"] == "show_partitions":
                for p in res["partitions"]:
                    combo = "/".join(
                        f"{k}={v}" for k, v in p["values"].items()
                    )
                    approx = "~" if p.get("approx") else ""
                    print(
                        f"{combo}\tfiles={p['n_files']}\t"
                        f"rows={approx}{p['n_rows']}"
                    )
                print(
                    f"{res['table']} v{res['version']} "
                    f"({len(res['partitions'])} partition(s))"
                )
            elif res["op"] == "copy_into":
                print(
                    f"{res['table']} -> v{res['version']} (copy_into: "
                    f"{res['ingested']} ingested, "
                    f"{res['skipped']} skipped)"
                )
            else:
                print(
                    f"{res['table']} -> v{res['version']} ({res['op']})"
                )
            return 0
        # Delta-style time travel in SELECT: `FROM t VERSION AS OF 3`,
        # `FROM t TIMESTAMP AS OF '...'`, `t@3` — rewritten to pinned
        # snapshot views before Spark parses the statement
        from finance_etl_pipeline_spark.operators.manifest import (
            VersionNotFoundError,
        )
        from finance_etl_pipeline_spark.operators.sqldml import (
            SqlDmlError,
            expand_time_travel,
            try_metadata_select,
        )

        # metadata-only fast path: count/min/max over one manifest
        # table answers from the manifest stats (exact or it declines
        # — never approximates), no data file opened
        df = try_metadata_select(spark, args.statement, dml_tables)
        if df is None:
            try:
                stmt = expand_time_travel(
                    spark, args.statement, dml_tables
                )
            except (SqlDmlError, VersionNotFoundError) as e:
                print(f"time travel error: {e}", file=sys.stderr)
                return 2
            df = spark.sql(stmt)
        elif args.explain:
            print(
                "== Metadata-Only Aggregate ==\nanswered from manifest "
                "per-file stats; 0 data files scanned"
            )
        if args.explain:
            df.explain(mode="formatted")
        else:
            df.show(args.limit, truncate=False)
        return 0

    if args.command == "drain":
        import os as _os

        from finance_etl_pipeline_spark.session import get_spark
        from finance_etl_pipeline_spark.sources.lakestream import drain
        from finance_etl_pipeline_spark.streaming.sink import (
            append_stream_to_manifest,
        )

        if args.warehouse:
            from finance_etl_pipeline_spark.operators import (
                catalog as _cat,
            )

            try:
                args.src = _cat.resolve(args.warehouse, args.src)
            except _cat.CatalogError as e:
                print(f"catalog error: {e}", file=sys.stderr)
                return 2
            try:
                args.sink = _cat.resolve(args.warehouse, args.sink)
            except _cat.CatalogError:
                args.sink = _cat.create_table(args.warehouse, args.sink)
        spark = get_spark(app_name="table-drain")
        part = (
            [c.strip() for c in args.partition_by.split(",") if c.strip()]
            if args.partition_by
            else None
        )
        # the app_id must be stable across RESTARTS of this drain but
        # distinct per checkpoint: batch ids are scoped to the
        # checkpoint, so a sink-derived id would replay-drop every
        # batch of a FRESH checkpoint into a previously-drained sink
        app_id = f"drain:{_os.path.abspath(args.checkpoint)}"
        out = drain(
            spark,
            args.src,
            lambda df: append_stream_to_manifest(
                df, args.sink, app_id=app_id, partition_by=part
            ),
            args.checkpoint,
            max_files_per_trigger=args.max_files,
            max_bytes_per_trigger=args.max_bytes,
            starting_version=args.starting_version,
            max_batches=args.max_batches,
            timeout_secs=args.timeout_secs,
        )
        state = "drained" if out["reached_tip"] else "paused"
        print(
            f"{state} at v{out['tip']}: {out['batches']} data "
            f"micro-batches this run"
        )
        return 0

    if args.command == "table":
        if getattr(args, "warehouse", None):
            from finance_etl_pipeline_spark.operators import (
                catalog as _cat,
            )

            try:
                if args.action == "convert":
                    # convert's positional is a raw parquet SOURCE
                    # path; the catalog name is the NEW table (--into)
                    if args.into:
                        try:
                            args.into = _cat.resolve(
                                args.warehouse, args.into
                            )
                        except _cat.CatalogError:
                            # remember the registration so a failed
                            # convert rolls it back instead of leaving
                            # a dangling zero-version catalog entry
                            args._convert_created = (
                                args.warehouse,
                                args.into,
                            )
                            args.into = _cat.create_table(
                                args.warehouse, args.into
                            )
                else:
                    args.dir = _cat.resolve(args.warehouse, args.dir)
            except _cat.CatalogError as e:
                print(f"catalog error: {e}", file=sys.stderr)
                return 2
        from finance_etl_pipeline_spark.operators import manifest as M

        if args.action == "history":
            for e in M.history(args.dir):
                import datetime as _dt

                ts = (
                    _dt.datetime.fromtimestamp(e["ts"]).isoformat()
                    if e["ts"] is not None
                    else "?"
                )
                print(
                    f"v{e['version']}\t{ts}\t{e['mode']}\t"
                    f"files={e['n_files']}\trows={e['n_rows']}\t"
                    f"tombstones={e['n_tombstones']}\ttxns={e['txns']}"
                )
            return 0
        if args.action == "vacuum":
            removed = M.vacuum(
                args.dir,
                keep_last=args.keep_last,
                retention_seconds=args.retention_seconds,
            )
            for r in removed:
                print(r)
            print(f"removed {len(removed)} path(s)")
            return 0
        if args.action == "count":
            n = M.count_rows(args.dir)
            if n is None:
                from finance_etl_pipeline_spark.session import get_spark

                spark = get_spark(app_name="table-count")
                n = M.read_version(spark, args.dir).count()
                print(f"{n} (scan — tombstones or legacy manifest)")
            else:
                print(f"{n} (metadata-only)")
            return 0
        if args.action == "constraints":
            cons = M.table_constraints(args.dir)
            for name, expr in sorted(cons.items()):
                print(f"{name}\tCHECK ({expr})")
            print(f"{len(cons)} constraint(s)")
            return 0
        if args.action == "bloom":
            if not args.cols:
                print(
                    "table bloom requires --cols COL[,COL...]",
                    file=sys.stderr,
                )
                return 2
            from finance_etl_pipeline_spark.session import get_spark

            spark = get_spark(app_name="table-bloom")
            cols = [c.strip() for c in args.cols.split(",") if c.strip()]
            v = M.add_bloom_index(spark, args.dir, cols)
            print(
                f"v{v}: bloom index on {cols} "
                "(point lookups now prune per file)"
            )
            return 0
        if args.action == "partitions":
            parts = M.table_partitions(args.dir)
            for p in parts:
                vals = ", ".join(f"{k}={v}" for k, v in p["values"].items())
                star = "~" if p["approx"] else ""
                print(
                    f"{vals}\tfiles={p['n_files']}\t"
                    f"rows={star}{p['n_rows']}"
                )
            print(f"{len(parts)} partition(s), from metadata only")
            return 0
        if args.action == "columns":
            # logical schema + physical layout name + per-file bloom
            # coverage (how many live files carry a bloom per column)
            from pyspark.sql.types import StructType

            v = M.latest_version(args.dir)
            if v == 0:
                print("empty table")
                return 0
            m = M._read_manifest(args.dir, v)
            mapping = M._load_mapping(m)[0]
            bloom_cover: dict[str, int] = {}
            n_files = 0
            files = M._load_files(args.dir, m)
            for d in m["dirs"]:
                for e in files.get(d) or []:
                    n_files += 1
                    for c in e.get("bloom", {}):
                        bloom_cover[c] = bloom_cover.get(c, 0) + 1
            if "schema" not in m:
                print("manifest predates schema records")
                return 0
            for f in StructType.fromJson(m["schema"]).fields:
                phys = mapping.get(f.name, f.name)
                extra = "" if phys == f.name else f"\tphysical={phys}"
                nb = bloom_cover.get(phys, 0)
                bl = f"\tbloom={nb}/{n_files}" if nb else ""
                print(
                    f"{f.name}\t{f.dataType.simpleString()}{extra}{bl}"
                )
            retired = M._load_mapping(m)[1]
            if retired:
                print(f"retired physical: {sorted(retired)}")
            return 0
        if args.action == "clone":
            if not args.into:
                print(
                    "table clone requires --into DST_DIR",
                    file=sys.stderr,
                )
                return 2
            v = M.clone_table(args.dir, args.into, version=args.version)
            print(f"cloned {args.dir} -> {args.into} v{v} (zero-copy)")
            return 0
        if args.action == "convert":
            if not args.into:
                print(
                    "table convert requires --into DIR (the NEW table "
                    "root; the positional dir is the parquet source "
                    "adopted in place)",
                    file=sys.stderr,
                )
                return 2
            from finance_etl_pipeline_spark.session import get_spark

            spark = get_spark(app_name="table-convert")
            try:
                v = M.convert_parquet(spark, args.dir, args.into)
            except (ValueError, M.ConcurrentTableModificationError) as e:
                created = getattr(args, "_convert_created", None)
                if created:
                    from finance_etl_pipeline_spark.operators import (
                        catalog as _cat,
                    )

                    try:
                        _cat.drop_table(
                            created[0], created[1], purge=True
                        )
                    except _cat.CatalogError:
                        pass  # racing unregister: nothing to undo
                print(f"convert error: {e}", file=sys.stderr)
                return 2
            d = M.describe_detail(args.into)
            print(
                f"converted {args.dir} -> {args.into} v{v} "
                f"({d['n_files']} file(s), {d['n_rows']} row(s), "
                "zero bytes copied)"
            )
            return 0
        if args.action == "restore":
            if args.version is None:
                print(
                    "table restore requires --version N (the rollback "
                    "target; history is preserved — the restore lands "
                    "as a NEW version)",
                    file=sys.stderr,
                )
                return 2
            try:
                v = M.restore_table(args.dir, args.version)
            except M.ConcurrentTableModificationError as e:
                print(f"conflict: {e}", file=sys.stderr)
                return 3
            except (M.VersionNotFoundError, ValueError) as e:
                print(f"restore error: {e}", file=sys.stderr)
                return 2
            if v == args.version:
                print(f"already at v{v}: no-op")
            else:
                print(f"restored to v{args.version} as v{v}")
            return 0
        if args.action == "changes":
            if not args.keys or args.from_version is None:
                print(
                    "table changes requires --keys COL[,COL...] and "
                    "--from-version N (0 = bootstrap full snapshot)",
                    file=sys.stderr,
                )
                return 2
            from finance_etl_pipeline_spark.session import get_spark

            spark = get_spark(app_name="table-changes")
            feed = M.changefeed_rows(
                spark,
                args.dir,
                [k.strip() for k in args.keys.split(",") if k.strip()],
                args.from_version,
                args.to_version,
            )
            feed.show(args.limit, truncate=False)
            return 0
        if args.action == "compact":
            from finance_etl_pipeline_spark.session import get_spark

            spark = get_spark(app_name="table-compact")
            zo = args.zorder.split(",") if args.zorder else None
            if args.where:
                # resolve each value against the DECLARED column type:
                # a string-typed column keeps the raw text ('01' and
                # '1' are distinct partitions, matching the read-path
                # identity of _entry_partition_combo) — numeric
                # inference only applies to non-string declared types
                from pyspark.sql.types import StringType, StructType

                m = M._read_manifest(args.dir, M.latest_version(args.dir))
                str_cols = set()
                if "schema" in m:
                    for f in StructType.fromJson(m["schema"]).fields:
                        if isinstance(f.dataType, StringType):
                            str_cols.add(f.name)
                preds = []
                for term in args.where.split(","):
                    col, _, val = term.partition("=")
                    if not col or not val:
                        print(
                            "--where wants col=value[,col=value...]",
                            file=sys.stderr,
                        )
                        return 2
                    col, val = col.strip(), val.strip()
                    preds.append(
                        (
                            col,
                            "==",
                            val
                            if col in str_cols
                            else M._parse_partition_value(val),
                        )
                    )
                v = M.compact_where(
                    spark,
                    args.dir,
                    preds,
                    target_bytes=args.target_bytes,
                    zorder_cols=zo,
                )
                print(f"compacted {args.where!r} as v{v}")
                return 0
            v = M.compact_table(
                spark,
                args.dir,
                target_bytes=args.target_bytes,
                zorder_cols=zo,
            )
            print(f"compacted as v{v}")
            return 0

    if args.command == "curate":
        import os

        from finance_etl_pipeline_spark.operators.curate_pipeline import curate
        from finance_etl_pipeline_spark.session import get_spark
        from finance_etl_pipeline_spark.sources.readers import table

        spark = get_spark(app_name="curate")
        docs = table(spark, args.sf_dir, "documents")
        packed, audit = curate(docs)
        packed_path = os.path.join(args.out_dir, "packed_sequences")
        audit_path = os.path.join(args.out_dir, "curation_audit")
        packed.write.mode("overwrite").parquet(packed_path)
        audit.write.mode("overwrite").parquet(audit_path)
        for r in spark.read.parquet(audit_path).orderBy("stage_idx").collect():
            print(f"{r.stage}: {r.n_docs} docs")
        print(f"packed_sequences: {packed_path}")
        print(f"curation_audit: {audit_path}")
        return 0

    if args.command == "dashboard":
        import os

        from finance_etl_pipeline_spark.dashboard import render_dashboard
        from finance_etl_pipeline_spark.session import get_spark

        spark = get_spark(app_name="dashboard")
        cur = args.curated_dir
        kpi = spark.read.parquet(os.path.join(cur, "kpi_monthly"))
        fact = spark.read.parquet(os.path.join(cur, "fact_transactions"))
        dim = spark.read.parquet(os.path.join(cur, "dim_accounts"))

        def _opt(name):
            p = os.path.join(cur, name)
            try:
                return spark.read.parquet(p)
            except Exception:
                return None

        out = args.out or os.path.join("reports", args.month, "dashboard.html")
        final = render_dashboard(
            kpi,
            fact,
            dim,
            _opt("dq_summary"),
            _opt("dq_exceptions"),
            args.month,
            out,
        )
        print(final)
        return 0

    if args.command == "generate":
        from finance_etl_pipeline_spark import sample_data

        sample_data.generate_raw(args.out_dir, args.month, args.seed, args.dirty)
        if args.reference_dir:
            sample_data.generate_reference(args.reference_dir)
        print(f"wrote raw CSVs to {args.out_dir}")
        return 0

    from finance_etl_pipeline_spark.pipeline import DataQualityGateError, run_month
    from finance_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="finance-etl-run")
    try:
        res = run_month(
            spark,
            args.month,
            args.raw_dir,
            args.curated_dir,
            args.reference_dir,
            fail_on=args.fail_on,
            money_mode=args.money_mode,
        )
    except DataQualityGateError as e:
        print(f"FAIL: {e}", file=sys.stderr)
        return 2
    for name, path in res.paths.items():
        print(f"{name}: {path}")
    print(f"status: {res.status}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
