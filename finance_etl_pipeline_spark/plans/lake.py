"""Versioned-table (manifest log) queries — the lakehouse layer as
driver-checkable oracle entries.

Each query BUILDS a small versioned table from the orders parquet in a
fresh temp directory (commits, overwrites, schema evolution), then
reads it back through ``operators/manifest.py`` — time travel, the
changefeed, and stats-pruned reads all on the real code path.  The
DuckDB oracle recomputes the expected result symbolically from the
orders table, because every snapshot is a pure modulo-slice of it: if
the manifest log mis-tracks a file, drops a schema, or prunes a file
it should not, the aggregate diverges.

The temp table dirs are intentionally leaked for the process lifetime:
the returned DataFrame is LAZY — the driver collects it after this
function returns, so the files must outlive the call (tmpdir reaping
happens at interpreter exit with the rest of /tmp churn).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.scalars import igrid, sql_igrid
from finance_etl_pipeline_spark.operators import manifest as M
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import table


#: bench tables built once per (process, sf_dir) and reused across the
#: bench harness's warm-up + timed iterations, so the TIMED quantity is
#: the READ path (metadata resolve + pruned scan), not table building.
#: Leaked for the process lifetime like every temp table here.
_BENCH_TBL: dict[str, str] = {}

#: lineitem l_shipdate (timestamp) spans 1995-01-02 .. 2001-11-04 at
#: every testdata SF → this cut keeps ~15% of rows / ~3 of 16 files
_BENCH_CUT = "1996-01-01 00:00:00"


def _bench_table(spark: SparkSession, sf_dir: str) -> str:
    t = _BENCH_TBL.get(sf_dir)
    if t is not None:
        return t
    t = tempfile.mkdtemp(prefix="mlake_bench_") + "/tbl"
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate"
    )
    # range-clustered on the predicate column → disjoint per-file
    # min/max stats → real file skipping, the layout OPTIMIZE produces
    M.commit(li.repartitionByRange(16, "l_shipdate"), t)
    _BENCH_TBL[sf_dir] = t
    return t


_BENCH_SQL = f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum({sql_igrid('l_extendedprice', 2)}) AS BIGINT)
             AS sum_price_e2,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '{_BENCH_CUT}'
    """


def _bench_agg(df: DataFrame) -> DataFrame:
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(igrid(F.col("l_extendedprice"), 2)).alias("sum_price_e2"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
    )


@register("manifest_pruned_read", _BENCH_SQL, "lake", "bench")
def manifest_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The manifest read path under bench: ``read_version(where=...)``
    over a range-clustered lineitem snapshot — driver-side stats
    pruning drops ~6/7 of the files before Spark lists them, then the
    surviving files scan through the normal JVM parquet path with the
    residual re-applied.  Paired with ``manifest_plain_scan`` (same
    bytes, no metadata) so BENCH_r{N} tracks the table-format tax AND
    the skipping win round over round instead of a one-off SCALE.md
    measurement."""
    import datetime

    t = _bench_table(spark, sf_dir)
    cut = datetime.datetime.strptime(_BENCH_CUT, "%Y-%m-%d %H:%M:%S")
    df = M.read_version(spark, t, where=[("l_shipdate", "<", cut)])
    return _bench_agg(df)


@register("manifest_plain_scan", _BENCH_SQL, "lake", "bench")
def manifest_plain_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Control for ``manifest_pruned_read``: the SAME snapshot files
    scanned as plain parquet with the filter applied by Spark alone
    (parquet row-group skipping still active — that is the fair
    baseline), no manifest metadata involved.  pruned/plain < 1 is the
    skipping win; pruned/plain ≈ 1 with pruning disabled would mean
    zero format tax."""
    t = _bench_table(spark, sf_dir)
    files = M.files_for_version(t)
    df = spark.read.parquet(*files).filter(
        F.col("l_shipdate") < F.lit(_BENCH_CUT).cast("timestamp_ntz")
    )
    return _bench_agg(df)


@register(
    "manifest_changes_classify",
    """
    SELECT change_type, CAST(count(*) AS BIGINT) AS n
    FROM (
        SELECT CASE
                 WHEN o_orderkey % 3 = 1 THEN 'removed'
                 WHEN o_orderkey % 3 = 2 THEN 'added'
                 WHEN o_orderkey % 5 = 0 THEN 'changed'
                 ELSE 'unchanged'
               END AS change_type
        FROM orders
        WHERE o_orderkey % 3 IN (0, 1, 2)
    ) t
    GROUP BY change_type
    ORDER BY change_type
    """,
    "lake",
)
def manifest_changes_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changefeed over a versioned table: v1 holds orders with
    key%3 ∈ {0,1}; v2 OVERWRITES with key%3 ∈ {0,2} and bumps the
    price of key%5 == 0 rows.  ``changes(v1, v2)`` must classify
    key%3==1 as removed, key%3==2 as added, key%3==0 ∧ key%5==0 as
    changed, the rest unchanged — exercising time travel (v1 is read
    AFTER the overwrite) and the snapshot diff end-to-end."""
    t = tempfile.mkdtemp(prefix="mlake_chg_") + "/tbl"
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    M.commit(o.filter(F.col("o_orderkey") % 3 <= 1), t)
    v2 = o.filter(F.col("o_orderkey") % 3 != 1).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    M.commit(v2, t, mode="overwrite")
    return (
        M.changes(spark, t, ["o_orderkey"], 1, 2)
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("change_type")
    )


@register(
    "manifest_evolved_pruned_read",
    f"""
    SELECT CASE WHEN o_orderkey % 4 = 0 THEN 'none' ELSE 'online' END
             AS channel,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum({sql_igrid('o_totalprice', 2)}) AS BIGINT)
             AS sum_price_e2
    FROM orders
    WHERE o_orderkey % 4 IN (0, 1) AND o_totalprice < 100000.0
    GROUP BY channel
    ORDER BY channel
    """,
    "lake",
)
def manifest_evolved_pruned_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Schema evolution + stats-pruned read: v1 commits orders
    key%4==0 WITHOUT the channel column; v2 appends key%4==1 WITH it.
    The latest read goes through ``where=`` (file skipping against
    the per-file min/max stats, then the exact residual filter) and
    must see v1's rows with a NULL channel — the
    unionByName(allowMissingColumns=True) reconciliation — while both
    commits' totals match the symbolic recompute."""
    t = tempfile.mkdtemp(prefix="mlake_evo_") + "/tbl"
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    M.commit(
        o.filter(F.col("o_orderkey") % 4 == 0).repartitionByRange(
            4, "o_totalprice"
        ),
        t,
    )
    M.commit(
        o.filter(F.col("o_orderkey") % 4 == 1).withColumn(
            "o_channel", F.lit("online")
        ),
        t,
    )
    df = M.read_version(spark, t, where=[("o_totalprice", "<", 100000.0)])
    return (
        df.groupBy(
            F.coalesce("o_channel", F.lit("none")).alias("channel")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(igrid("o_totalprice", 2)).alias("sum_price_e2"),
        )
        .orderBy("channel")
    )


@register(
    "manifest_mor_delete_read",
    f"""
    SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'old' ELSE 'new' END
             AS cohort,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum({sql_igrid('o_totalprice', 2)}) AS BIGINT)
             AS sum_price_e2
    FROM orders
    WHERE (o_orderkey % 2 = 0 AND o_orderstatus <> 'F')
       OR (o_orderkey % 2 = 1 AND o_orderstatus = 'F')
    GROUP BY cohort
    ORDER BY cohort
    """,
    "lake",
)
def manifest_mor_delete_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE on the driver path: commit even-key orders,
    tombstone status 'F' via the metadata-only ``delete_where``, then
    APPEND odd-key 'F' rows — which must survive (the tombstone is
    scoped to the dirs existing at publish time).  The aggregate over
    the latest read therefore sees even-key non-F rows plus odd-key F
    rows exactly; a retro-deleting or non-deleting reader diverges."""
    t = tempfile.mkdtemp(prefix="mlake_mor_") + "/tbl"
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    M.commit(o.filter(F.col("o_orderkey") % 2 == 0), t)
    M.delete_where(t, [("o_orderstatus", "==", "F")])
    M.commit(
        o.filter(
            (F.col("o_orderkey") % 2 == 1) & (F.col("o_orderstatus") == "F")
        ),
        t,
    )
    df = M.read_version(spark, t)
    return (
        df.groupBy(
            F.when(F.col("o_orderkey") % 2 == 0, "old")
            .otherwise("new")
            .alias("cohort")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(igrid("o_totalprice", 2)).alias("sum_price_e2"),
        )
        .orderBy("cohort")
    )


@register(
    "manifest_update_read",
    f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN o_orderstatus = 'F'
                         THEN {sql_igrid('o_totalprice * 2.0', 2)}
                         ELSE {sql_igrid('o_totalprice', 2)} END)
                AS BIGINT) AS sum_price_e2
    FROM orders
    WHERE o_orderkey % 2 = 0
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    "lake",
)
def manifest_update_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read UPDATE on the driver path: commit even-key
    orders, double the price of status-'F' rows via ``update_where``
    (one atomic version: scoped tombstone + rewritten rows), then
    aggregate the latest read.  Non-matching rows must be untouched
    and matching rows must appear exactly once with the new value —
    a reader that double-counts (tombstone not applied) or loses rows
    (rewrite dropped) diverges from the symbolic recompute."""
    t = tempfile.mkdtemp(prefix="mlake_upd_") + "/tbl"
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    M.commit(o.filter(F.col("o_orderkey") % 2 == 0), t)
    M.update_where(
        spark,
        t,
        [("o_orderstatus", "==", "F")],
        {"o_totalprice": F.col("o_totalprice") * 2.0},
    )
    df = M.read_version(spark, t)
    return (
        df.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(igrid("o_totalprice", 2)).alias("sum_price_e2"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "manifest_asof_read",
    f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum({sql_igrid('o_totalprice', 2)}) AS BIGINT)
             AS sum_price_e2
    FROM orders
    WHERE o_orderkey % 2 = 0
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    "lake",
)
def manifest_asof_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp time travel on the driver path: v1 commits even-key
    orders, v2 OVERWRITES with a 30-row slice; reading
    ``as_of`` the midpoint of the two commit timestamps must resolve
    v1 (latest version at-or-before the instant, Delta semantics) and
    see the pre-overwrite rows — a resolver that rounds up, reads the
    tip, or mis-orders non-monotonic clocks diverges."""
    import json as _json

    t = tempfile.mkdtemp(prefix="mlake_asof_") + "/tbl"
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    M.commit(o.filter(F.col("o_orderkey") % 2 == 0), t)
    M.commit(o.limit(30), t, mode="overwrite")
    with open(t + "/_manifests/v000001.json") as fh:
        ts1 = _json.load(fh)["ts"]
    with open(t + "/_manifests/v000002.json") as fh:
        ts2 = _json.load(fh)["ts"]
    df = M.read_version(spark, t, as_of=(ts1 + ts2) / 2)
    return (
        df.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(igrid(F.col("o_totalprice"), 2)).alias("sum_price_e2"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "manifest_merge_read",
    f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN o_orderkey % 3 = 0
                         THEN {sql_igrid('o_totalprice * 2.0', 2)}
                         ELSE {sql_igrid('o_totalprice', 2)} END)
                AS BIGINT) AS sum_price_e2
    FROM orders
    WHERE (o_orderkey % 2 = 0 OR o_orderkey % 3 = 0)
      AND NOT (o_orderkey % 9 = 0)
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    "lake",
)
def manifest_merge_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO on the driver path: commit even-key orders, then
    merge a source of key%3==0 rows at doubled price with key%9==0
    flagged for delete — one atomic version doing update (even ∩ %3),
    insert (odd ∩ %3), and delete (%9, which implies %3) at file
    granularity (operators/manifest.py::merge_into).  The aggregate
    over the post-merge snapshot diverges if the merge double-applies
    an update, loses a carried-over file, resurrects a deleted key,
    or drops an insert."""
    t = tempfile.mkdtemp(prefix="mlake_mrg_") + "/tbl"
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    M.commit(
        o.filter(F.col("o_orderkey") % 2 == 0).repartitionByRange(
            4, "o_orderkey"
        ),
        t,
    )
    src = (
        o.filter(F.col("o_orderkey") % 3 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2.0)
        .withColumn("__del", F.col("o_orderkey") % 9 == 0)
    )
    M.merge_into(spark, t, src, ["o_orderkey"], delete_col="__del")
    return (
        M.read_version(spark, t)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # merged rows already HOLD the doubled price (applied in
            # the source before the merge) — one igrid covers both
            F.sum(igrid(F.col("o_totalprice"), 2)).alias("sum_price_e2"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "manifest_sql_pruned_read",
    f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum({sql_igrid('o_totalprice', 2)}) AS BIGINT)
             AS sum_price_e2
    FROM orders
    WHERE o_totalprice < 100000.0 AND o_orderstatus <> 'F'
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    "lake",
)
def manifest_sql_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL surface over a versioned table: register the
    ``manifest_table`` Python DataSource and answer a filtered
    aggregate through ``spark.sql``, with the WHERE pushed into
    footer-stats FILE SKIPPING (the range-partitioned layout makes
    the o_totalprice predicate prune whole files — the same
    ``_file_may_match`` proofs as ``read_version(where=...)``) and a
    merge-on-read tombstone applied executor-side as an Arrow mask.
    A reader that prunes a file it should scan, misses the tombstone,
    or drops the residual re-apply diverges from the symbolic
    recompute."""
    import tempfile

    from finance_etl_pipeline_spark.sources.lakestream import (
        ManifestTableDataSource,
    )

    t = tempfile.mkdtemp(prefix="mlake_sql_") + "/tbl"
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    M.commit(o.repartitionByRange(5, "o_totalprice"), t)
    M.delete_where(t, [("o_orderstatus", "==", "F")])
    spark.dataSource.register(ManifestTableDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    (
        spark.read.format("manifest_table")
        .option("table_dir", t)
        .option("pushdown", "true")
        .load()
        .createOrReplaceTempView("manifest_sql_pruned_tbl")
    )
    return spark.sql(
        f"""
        SELECT o_orderstatus,
               CAST(sum(1) AS BIGINT) AS n_orders,
               CAST(sum({sql_igrid('o_totalprice', 2)}) AS BIGINT)
                 AS sum_price_e2
        FROM manifest_sql_pruned_tbl
        WHERE o_totalprice < 100000.0
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """
    )


@register(
    "manifest_compacted_read",
    f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum({sql_igrid('o_totalprice', 2)}) AS BIGINT)
             AS sum_price_e2
    FROM orders
    WHERE o_orderkey % 2 = 0 AND o_custkey <= 500
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    "lake",
)
def manifest_compacted_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE on the driver path: commit orders key%2==0 as many
    small files (two appends, 8 partitions each), run
    ``compact_table`` with z-ordering on (o_custkey, o_totalprice),
    then answer a box-filtered aggregate through the compacted
    version's stats-pruned read.  Wrong rewrites (dropped/duplicated
    rows), stats harvested from the wrong layout, or pruning that
    changes answers all diverge from the symbolic recompute."""
    t = tempfile.mkdtemp(prefix="mlake_opt_") + "/tbl"
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    even = o.filter(F.col("o_orderkey") % 2 == 0)
    M.commit(even.filter(F.col("o_orderkey") % 4 == 0).repartition(8), t)
    M.commit(even.filter(F.col("o_orderkey") % 4 == 2).repartition(8), t)
    M.compact_table(
        spark, t, target_bytes=64 * 1024,
        zorder_cols=["o_custkey", "o_totalprice"],
    )
    df = M.read_version(spark, t, where=[("o_custkey", "<=", 500)])
    return (
        df.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(igrid("o_totalprice", 2)).alias("sum_price_e2"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "manifest_sql_merge_read",
    f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN o_orderkey % 5 = 0
                         THEN {sql_igrid('o_totalprice * 2.0', 2)}
                         ELSE {sql_igrid('o_totalprice', 2)} END)
                AS BIGINT) AS sum_price_e2
    FROM orders
    WHERE (o_orderkey % 2 = 0 OR o_orderkey % 5 = 0)
      AND NOT (o_orderkey % 10 = 0)
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    "lake",
)
def manifest_sql_merge_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO as a SQL STATEMENT (operators/sqldml.py — the
    Delta/Iceberg statement surface on the manifest log): commit
    even-key orders, then merge a doubled-price key%5 source with
    key%10 flagged DELETE through ``execute_dml`` text — update
    (even ∩ %5), insert (odd ∩ %5), delete (%10) in one
    conflict-aborting version.  Diverges if the statement parser
    mis-binds the ON keys, drops a WHEN clause, or the underlying
    file-granular merge mis-applies."""
    from finance_etl_pipeline_spark.operators.sqldml import execute_dml

    t = tempfile.mkdtemp(prefix="mlake_sqlmrg_") + "/tbl"
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    M.commit(
        o.filter(F.col("o_orderkey") % 2 == 0).repartitionByRange(
            4, "o_orderkey"
        ),
        t,
    )
    (
        o.filter(F.col("o_orderkey") % 5 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2.0)
        .withColumn("is_del", F.col("o_orderkey") % 10 == 0)
        .createOrReplaceTempView("mlake_sqlmrg_src")
    )
    execute_dml(
        spark,
        """MERGE INTO tgt USING mlake_sqlmrg_src AS s
           ON tgt.o_orderkey = s.o_orderkey
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *
           WHEN MATCHED AND s.is_del THEN DELETE""",
        {"tgt": t},
    )
    return (
        M.read_version(spark, t)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(igrid(F.col("o_totalprice"), 2)).alias("sum_price_e2"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "manifest_sql_update_delete_read",
    f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum({sql_igrid('p', 2)}) AS BIGINT) AS sum_price_e2
    FROM (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderstatus = 'O'
                    THEN o_totalprice * 1.5 ELSE o_totalprice END AS p
        FROM orders
        WHERE o_orderkey % 4 = 0
    ) u
    WHERE NOT (p < 5000.0)
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    "lake",
)
def manifest_sql_update_delete_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """UPDATE then DELETE as SQL statements, composing on the log:
    the UPDATE rewrites status-'O' rows at 1.5× into a new dir with a
    scoped tombstone; the DELETE tombstones by POST-update price —
    its predicate must see the rewritten values (rewrite dir included
    in the tombstone scope) and the pre-update copies must stay dead
    under the first tombstone.  Wrong scoping double-counts or
    resurrects rows and diverges from the symbolic recompute."""
    from finance_etl_pipeline_spark.operators.sqldml import execute_dml

    t = tempfile.mkdtemp(prefix="mlake_squd_") + "/tbl"
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    M.commit(o.filter(F.col("o_orderkey") % 4 == 0), t)
    execute_dml(
        spark,
        "UPDATE tgt SET o_totalprice = o_totalprice * 1.5 "
        "WHERE o_orderstatus = 'O'",
        {"tgt": t},
    )
    execute_dml(
        spark, "DELETE FROM tgt WHERE o_totalprice < 5000.0", {"tgt": t}
    )
    return (
        M.read_version(spark, t)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(igrid(F.col("o_totalprice"), 2)).alias("sum_price_e2"),
        )
        .orderBy("o_orderstatus")
    )


#: 200-file range-clustered lineitem snapshot (same bytes as the
#: 16-file bench table — more, smaller files): the non-toy scale for
#: manifest metadata cost, where the sharded log and the skipping
#: proofs process a file population instead of a handful.  Built once
#: per (process, sf_dir) like _BENCH_TBL.
_BENCH_WIDE_TBL: dict[str, str] = {}

#: dedicated merge-bench table (orders, unique keys, 200 files) — kept
#: separate from the read-bench tables because each merge run PUBLISHES
#: versions; the read benches must stay single-version snapshots
_BENCH_MERGE_TBL: dict[str, str] = {}


def _bench_wide_table(spark: SparkSession, sf_dir: str) -> str:
    t = _BENCH_WIDE_TBL.get(sf_dir)
    if t is not None:
        return t
    t = tempfile.mkdtemp(prefix="mlake_wide_") + "/tbl"
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate"
    )
    M.commit(li.repartitionByRange(200, "l_shipdate"), t)
    _BENCH_WIDE_TBL[sf_dir] = t
    return t


def _bench_merge_table(spark: SparkSession, sf_dir: str) -> str:
    t = _BENCH_MERGE_TBL.get(sf_dir)
    if t is not None:
        return t
    t = tempfile.mkdtemp(prefix="mlake_mdelta_") + "/tbl"
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    M.commit(o.repartitionByRange(200, "o_orderkey"), t)
    _BENCH_MERGE_TBL[sf_dir] = t
    return t


@register("manifest_pruned_read_200f", _BENCH_SQL, "lake", "bench")
def manifest_pruned_read_200f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``manifest_pruned_read`` at a NON-TOY file population: the same
    sf bytes clustered into 200 files, so the timed quantity includes
    resolving a 200-entry shard, proving ~170 of 200 files out against
    their stats, and scanning the ~30 survivors.  Tracks the metadata
    path's scaling with #files round over round — the 16-file pair
    alone cannot distinguish per-file metadata cost from fixed
    overhead."""
    import datetime

    t = _bench_wide_table(spark, sf_dir)
    cut = datetime.datetime.strptime(_BENCH_CUT, "%Y-%m-%d %H:%M:%S")
    df = M.read_version(spark, t, where=[("l_shipdate", "<", cut)])
    return _bench_agg(df)


@register(
    "manifest_merge_small_delta",
    f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN o_orderkey <= 256
                         THEN {sql_igrid('42.0', 2)}
                         ELSE {sql_igrid('o_totalprice', 2)} END)
                AS BIGINT) AS sum_price_e2
    FROM orders
    """,
    "lake",
    "bench",
)
def manifest_merge_small_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-delta MERGE INTO a 200-file table, timed end to end:
    source-key-envelope stats pruning must touch ~1 of 200 range-
    clustered files, rewrite it, and publish one version whose
    manifest carries the other ~199 entries by shard REFERENCE — then
    the post-merge read aggregates the whole table.  The merge is
    content-idempotent (same keys, fixed value), so repeated bench
    iterations and the oracle see one stable answer while versions
    stack; a merge that rewrites more than the touched file or a
    publish that re-serializes the full file map shows up as timing
    growth here long before correctness breaks."""
    t = _bench_merge_table(spark, sf_dir)
    o = table(spark, sf_dir, "orders")
    src = (
        o.filter(F.col("o_orderkey") <= 256)
        .select("o_orderkey")
        .withColumn("o_totalprice", F.lit(42.0))
    )
    M.merge_into(spark, t, src, ["o_orderkey"])
    return M.read_version(spark, t).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(igrid(F.col("o_totalprice"), 2)).alias("sum_price_e2"),
    )


@register(
    "manifest_changefeed_rows",
    f"""
    SELECT change_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN change_type = 'removed' THEN 0
                         WHEN o_orderkey % 7 = 0
                           THEN {sql_igrid('o_totalprice + 1.0', 2)}
                         ELSE {sql_igrid('o_totalprice', 2)} END)
                AS BIGINT) AS sum_price_e2
    FROM (
        SELECT o_orderkey, o_totalprice,
               CASE
                 WHEN o_orderkey % 3 = 1 THEN 'removed'
                 WHEN o_orderkey % 3 = 2 THEN 'added'
                 WHEN o_orderkey % 7 = 0 THEN 'changed'
               END AS change_type
        FROM orders
        WHERE o_orderkey % 3 IN (1, 2)
           OR (o_orderkey % 3 = 0 AND o_orderkey % 7 = 0)
    ) t
    GROUP BY change_type
    ORDER BY change_type
    """,
    "lake",
)
def manifest_changefeed_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLYABLE changefeed (``changefeed_rows`` — Delta's
    table_changes shape): v1 holds keys %3 ∈ {0,1}, v2 overwrites
    with %3 ∈ {0,2} and bumps %7 prices.  The feed between them must
    emit 'removed' rows with NULL payloads (delete markers — the
    price contributes 0), 'added' rows with the v2 payload, and
    'changed' rows with the bumped price, and must NOT ship
    'unchanged' rows at all — a feed that leaks snapshots instead of
    deltas inflates every downstream CDC consumer at scale."""
    t = tempfile.mkdtemp(prefix="mlake_cfr_") + "/tbl"
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    M.commit(o.filter(F.col("o_orderkey") % 3 <= 1), t)
    v2 = o.filter(F.col("o_orderkey") % 3 != 1).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    M.commit(v2, t, mode="overwrite")
    feed = M.changefeed_rows(spark, t, ["o_orderkey"], 1, 2)
    return (
        feed.groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.coalesce(igrid(F.col("o_totalprice"), 2), F.lit(0))
            ).alias("sum_price_e2"),
        )
        .orderBy("change_type")
    )


@register(
    "manifest_clone_cow_read",
    f"""
    SELECT cohort,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum({sql_igrid('p', 2)}) AS BIGINT) AS sum_price_e2
    FROM (
        SELECT 'clone' AS cohort,
               CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice * 3.0
                    ELSE o_totalprice END AS p
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL
        SELECT 'source' AS cohort, o_totalprice AS p
        FROM orders WHERE o_orderkey % 2 = 0
    ) t
    GROUP BY cohort
    ORDER BY cohort
    """,
    "lake",
)
def manifest_clone_cow_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHALLOW CLONE isolation, value-verified end to end: clone an
    even-key orders table (zero copy), MERGE tripled prices for
    key%11 into the CLONE, then aggregate CLONE and SOURCE side by
    side — the clone must show the copy-on-write values while the
    source reads byte-identical originals through the very files the
    clone references.  A clone whose DML leaks into the source, or
    whose reads miss the de-referenced rewrite, diverges."""
    t_src = tempfile.mkdtemp(prefix="mlake_clsrc_") + "/tbl"
    t_dst = tempfile.mkdtemp(prefix="mlake_cldst_") + "/tbl"
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    M.commit(
        o.filter(F.col("o_orderkey") % 2 == 0).repartitionByRange(
            4, "o_orderkey"
        ),
        t_src,
    )
    M.clone_table(t_src, t_dst)
    M.merge_into(
        spark,
        t_dst,
        o.filter(
            (F.col("o_orderkey") % 2 == 0) & (F.col("o_orderkey") % 11 == 0)
        ).withColumn("o_totalprice", F.col("o_totalprice") * 3.0),
        ["o_orderkey"],
    )
    clone = M.read_version(spark, t_dst).select(
        F.lit("clone").alias("cohort"), F.col("o_totalprice").alias("p")
    )
    source = M.read_version(spark, t_src).select(
        F.lit("source").alias("cohort"), F.col("o_totalprice").alias("p")
    )
    return (
        clone.unionByName(source)
        .groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(igrid(F.col("p"), 2)).alias("sum_price_e2"),
        )
        .orderBy("cohort")
    )


@register(
    "manifest_constraint_gate_read",
    f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(CASE WHEN o_totalprice <= 0 THEN 1 END) AS BIGINT)
             AS n_violations,
           CAST(sum({sql_igrid('o_totalprice', 2)}) AS BIGINT)
             AS sum_price_e2
    FROM (
        SELECT o_totalprice FROM orders WHERE o_orderkey % 3 = 0
        UNION ALL
        SELECT o_totalprice FROM orders WHERE o_orderkey % 3 = 1
    ) t
    """,
    "lake",
)
def manifest_constraint_gate_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CHECK constraints gating the log, value-verified: commit
    key%3==0 orders, add ``price > 0``, then attempt a NEGATED-price
    commit (must abort publishing NOTHING) followed by a clean
    key%3==1 commit (must land).  The final aggregate equals exactly
    base + clean — zero violations in the table; a gate that lets the
    bad commit through (or aborts AFTER referencing its files)
    diverges on both the violation count and the sum."""
    t = tempfile.mkdtemp(prefix="mlake_cons_") + "/tbl"
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    M.commit(o.filter(F.col("o_orderkey") % 3 == 0), t)
    M.add_constraint(spark, t, "price_pos", "o_totalprice > 0")
    try:
        M.commit(
            o.filter(F.col("o_orderkey") % 3 == 2).withColumn(
                "o_totalprice", -F.col("o_totalprice")
            ),
            t,
        )
    except M.ConstraintViolationError:
        pass  # the gate working IS the scenario
    M.commit(o.filter(F.col("o_orderkey") % 3 == 1), t)
    return M.read_version(spark, t).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(
            F.when(F.col("o_totalprice") <= 0, F.lit(1))
        ).alias("n_violations"),
        F.sum(igrid(F.col("o_totalprice"), 2)).alias("sum_price_e2"),
    )


@register(
    "manifest_stream_capped_drain",
    f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
           CAST(sum({sql_igrid('o_totalprice', 2)}) AS BIGINT)
             AS sum_price_e2
    FROM orders
    """,
    "lake",
    "streaming",
)
def manifest_stream_capped_drain(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Admission-controlled streaming drain, end to end: orders land
    in a manifest table as a 3-version backlog, a capped stream
    (``max_files_per_trigger=3`` — Delta maxFilesPerTrigger semantics
    on the version-offset log) drains it in bounded micro-batches
    through the exactly-once manifest sink, and the sink table must
    reproduce the batch table bit-for-bit: same row count, same key
    count (no replay duplicates across the capped batch boundaries),
    same price sum.  The cap forces mid-version offset splits
    ({{"version": v, "index": i}}), so this certifies the split
    bookkeeping, not just the happy path."""
    from finance_etl_pipeline_spark.sources.lakestream import (
        ManifestTableDataSource,
    )
    from finance_etl_pipeline_spark.streaming.sink import (
        append_stream_to_manifest,
    )

    spark.dataSource.register(ManifestTableDataSource)
    root = tempfile.mkdtemp(prefix="mlake_drain_")
    src, sink_t, ckpt = f"{root}/src", f"{root}/sink", f"{root}/ck"
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    # 3 versions x 4 files: the cap of 3 cannot align with version
    # boundaries, so at least one offset lands mid-version
    for r in range(3):
        M.commit(o.filter(F.col("o_orderkey") % 3 == r).repartition(4), src)

    stream = (
        spark.readStream.format("manifest_table")
        .option("table_dir", src)
        .option("max_files_per_trigger", "3")
        .load()
    )
    q = (
        append_stream_to_manifest(stream, sink_t, app_id="capped_drain")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(60)

    return M.read_version(spark, sink_t).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col("o_orderkey")).alias("n_keys"),
        F.sum(igrid(F.col("o_totalprice"), 2)).alias("sum_price_e2"),
    )


@register(
    "manifest_rename_drop_read",
    f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum({sql_igrid('price', 2)}) AS BIGINT) AS sum_price_e2,
           CAST(count(note) AS BIGINT) AS n_notes
    FROM (
        SELECT o_totalprice AS price,
               CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END AS note
        FROM orders
    ) t
    WHERE price >= 1000.0
    """,
    "lake",
)
def manifest_rename_drop_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column mapping end to end: commit orders, RENAME
    o_totalprice→price (metadata-only — the files keep the physical
    name), DROP o_orderdate, append post-rename rows under the NEW
    logical names, and read back with a stats-pruned predicate on the
    RENAMED column.  Old rows surface the renamed values, the dropped
    column is gone for every row, the re-added 'note' column reads
    NULL for pre-add rows (no resurrection of dropped bytes), and
    file skipping still prunes on the renamed column's physical
    stats."""
    t = tempfile.mkdtemp(prefix="mlake_ren_") + "/tbl"
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus", "o_orderdate"
    )
    # half the rows pre-rename (even keys)
    M.commit(
        o.filter(F.col("o_orderkey") % 2 == 0).repartition(4), t
    )
    M.rename_column(t, "o_totalprice", "price")
    M.drop_column(t, "o_orderdate")
    # the other half post-rename, under the new logical names, with a
    # 'note' column that only post-rename rows populate
    post = (
        o.filter(F.col("o_orderkey") % 2 == 1)
        .select(
            "o_orderkey",
            F.col("o_totalprice").alias("price"),
            "o_orderstatus",
            F.col("o_orderstatus").alias("note"),
        )
        .repartition(4)
    )
    M.commit(post, t)
    got = M.read_version(spark, t, where=[("price", ">=", 1000.0)])
    return got.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(igrid(F.col("price"), 2)).alias("sum_price_e2"),
        F.count(F.col("note")).alias("n_notes"),
    )


_BLOOM_TBL: dict[str, str] = {}


def _bloom_table(spark: SparkSession, sf_dir: str) -> str:
    """lineitem striped ROUND-ROBIN across 16 files (every file's
    l_orderkey range covers every key — min/max skipping is useless
    by construction) with a per-file bloom on l_orderkey; built once
    per (process, sf_dir) so the bench times the READ."""
    t = _BLOOM_TBL.get(sf_dir)
    if t is not None:
        return t
    t = tempfile.mkdtemp(prefix="mlake_bloom_") + "/tbl"
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    M.commit(li.repartition(16), t, bloom_cols=["l_orderkey"])
    _BLOOM_TBL[sf_dir] = t
    return t


@register(
    "manifest_bloom_point_read",
    f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(sum({sql_igrid('l_extendedprice', 2)}) AS BIGINT)
             AS sum_price_e2
    FROM lineitem
    WHERE l_orderkey IN (1, 7, 32)
    """,
    "lake",
    "bench",
)
def manifest_bloom_point_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup on a high-cardinality UNSORTED id where min/max
    stats prune nothing: the per-file bloom index
    (``commit(bloom_cols=...)`` / ``add_bloom_index``) proves the
    keys absent from all but ~1 file per key BEFORE any file is
    opened — the id-equality shape that otherwise scans the whole
    table at 100 TB."""
    t = _bloom_table(spark, sf_dir)
    got = M.read_version(
        spark, t, where=[("l_orderkey", "in", [1, 7, 32])]
    )
    return got.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.sum(igrid(F.col("l_extendedprice"), 2)).alias("sum_price_e2"),
    )


@register(
    "manifest_compact_where_read",
    f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum({sql_igrid('o_totalprice', 2)}) AS BIGINT)
             AS sum_price_e2
    FROM orders
    WHERE NOT (o_orderkey < 1000 AND o_orderstatus = 'F')
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    "lake",
)
def manifest_compact_where_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scoped OPTIMIZE end to end: orders land hive-partitioned by
    status across TWO fragmented appends, a merge-on-read delete
    tombstones a slice of the 'F' partition, and ``compact_where``
    rewrites ONLY that partition (materializing its tombstones; every
    other partition's files carry by reference).  The read must see
    the delete applied exactly once and every other row untouched —
    and the 'F' partition must hold fewer files than before while the
    others hold exactly the same ones (asserted in
    tests/test_compact_where.py; here the oracle certifies values)."""
    t = tempfile.mkdtemp(prefix="mlake_cw_") + "/tbl"
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    M.commit(
        o.filter(F.col("o_orderkey") % 2 == 0),
        t,
        partition_by=["o_orderstatus"],
    )
    M.commit(
        o.filter(F.col("o_orderkey") % 2 == 1),
        t,
        partition_by=["o_orderstatus"],
    )
    M.delete_where(
        t,
        [("o_orderkey", "<", 1000), ("o_orderstatus", "==", "F")],
    )
    M.compact_where(spark, t, [("o_orderstatus", "==", "F")])
    got = M.read_version(spark, t)
    return (
        got.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(igrid(F.col("o_totalprice"), 2)).alias("sum_price_e2"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "manifest_stream_drain_availablenow",
    f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
           CAST(sum({sql_igrid('o_totalprice', 2)}) AS BIGINT)
             AS sum_price_e2
    FROM orders
    """,
    "lake",
    "streaming",
)
def manifest_stream_drain_availablenow(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Drain-then-stop with admission control (``lakestream.drain``):
    orders land as a 3-version backlog, ``drain`` pulls it through the
    exactly-once manifest sink in bounded micro-batches
    (``max_files_per_trigger=3`` forces mid-version offset splits) and
    STOPS at the tip pinned at call time — Delta's
    maxFilesPerTrigger-under-availableNow semantics, which the
    engine's AvailableNow wrapper for Python sources cannot express
    (it would stop after ONE capped batch).  The sink must reproduce
    the batch table bit-for-bit: same rows, same distinct keys (no
    replay duplicates across capped boundaries), same price sum."""
    from finance_etl_pipeline_spark.sources.lakestream import drain
    from finance_etl_pipeline_spark.streaming.sink import (
        append_stream_to_manifest,
    )

    root = tempfile.mkdtemp(prefix="mlake_drainan_")
    src, sink_t, ckpt = f"{root}/src", f"{root}/sink", f"{root}/ck"
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    for r in range(3):
        M.commit(o.filter(F.col("o_orderkey") % 3 == r).repartition(4), src)

    out = drain(
        spark,
        src,
        lambda df: append_stream_to_manifest(
            df, sink_t, app_id="drain_an"
        ),
        ckpt,
        max_files_per_trigger=3,
    )
    assert out["reached_tip"] and out["batches"] >= 4, out

    return M.read_version(spark, sink_t).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col("o_orderkey")).alias("n_keys"),
        F.sum(igrid(F.col("o_totalprice"), 2)).alias("sum_price_e2"),
    )


@register(
    "manifest_conflict_rebase_rewrites",
    f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum({sql_igrid('o_totalprice', 2)}) AS BIGINT)
             AS sum_abs_e2,
           CAST(sum(CASE WHEN o_orderkey % 3 = 0
                         THEN -{sql_igrid('o_totalprice', 2)}
                         ELSE {sql_igrid('o_totalprice', 2)} END)
             AS BIGINT) AS sum_signed_e2
    FROM orders
    WHERE o_orderkey % 5 <> 4
    """,
    "lake",
)
def manifest_conflict_rebase_rewrites(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Generalized logical conflict resolution (r10), end to end:
    orders land partitioned by ``bucket = o_orderkey % 5`` in two
    fragmented appends; an UPDATE of buckets <= 3 (negate key%3==0
    prices — sign-exact under the integer-cent grid) publishes while
    a DISJOINT ``delete_where(bucket == 4)`` wins the race, then a
    scoped OPTIMIZE of bucket 1 publishes while a scoped OPTIMIZE of
    bucket 2 wins its race.  Both rebases must land BOTH writers
    (file-set intersection proofs: the hive partitioning makes every
    pair provably disjoint).  The final aggregates equal the symbolic
    oracle — a lost update, a resurrected bucket-4 row, or a dropped
    compaction row all diverge."""
    t = tempfile.mkdtemp(prefix="mlake_rebase_") + "/tbl"
    o = (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .withColumn("bucket", (F.col("o_orderkey") % 5).cast("int"))
    )
    M.commit(
        o.filter(F.col("o_orderkey") % 2 == 0).repartition(2),
        t,
        partition_by=["bucket"],
    )
    M.commit(
        o.filter(F.col("o_orderkey") % 2 == 1).repartition(2),
        t,
        partition_by=["bucket"],
    )

    def _race(action):
        orig = M._publish
        state = {"armed": True}

        def hooked(table_dir, build):
            if state["armed"]:
                state["armed"] = False
                action(table_dir)
            return orig(table_dir, build)

        M._publish = hooked
        return orig

    orig = _race(lambda td: M.delete_where(td, [("bucket", "==", 4)]))
    try:
        M.update_where(
            spark,
            t,
            [("bucket", "<=", 3)],
            {
                "o_totalprice": F.when(
                    F.col("o_orderkey") % 3 == 0,
                    -F.col("o_totalprice"),
                ).otherwise(F.col("o_totalprice"))
            },
        )
    finally:
        M._publish = orig
    orig = _race(
        lambda td: M.compact_where(spark, td, [("bucket", "==", 2)])
    )
    try:
        M.compact_where(spark, t, [("bucket", "==", 1)])
    finally:
        M._publish = orig

    return M.read_version(spark, t).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(igrid(F.abs(F.col("o_totalprice")), 2)).alias("sum_abs_e2"),
        F.sum(igrid(F.col("o_totalprice"), 2)).alias("sum_signed_e2"),
    )


@register(
    "manifest_catalog_named_table",
    f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN o_orderkey % 7 = 0
                         THEN -{sql_igrid('o_totalprice', 2)}
                         ELSE {sql_igrid('o_totalprice', 2)} END)
             AS BIGINT) AS sum_signed_e2
    FROM orders
    WHERE o_orderkey % 4 <> 3
    """,
    "lake",
)
def manifest_catalog_named_table(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Warehouse catalog end to end (r10, operators/catalog.py):
    CREATE TABLE ... AS lands an orders slice as a MANAGED table under
    a fresh warehouse root, an UPDATE addresses it BY NAME (the
    catalog supplies the dir map to the DML layer), and the final read
    resolves the name again — name→dir resolution, the CTAS commit,
    and by-name DML must compose exactly or the signed sum diverges
    from the symbolic oracle."""
    from finance_etl_pipeline_spark.operators import catalog as C
    from finance_etl_pipeline_spark.operators.sqldml import (
        execute_ddl,
        execute_dml,
    )

    root = tempfile.mkdtemp(prefix="mlake_cat_") + "/wh"
    table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    ).createOrReplaceTempView("cat_orders_src")
    execute_ddl(
        spark,
        "CREATE TABLE kept_orders AS SELECT *, CAST(o_orderkey % 7 AS "
        "INT) AS bucket7 FROM cat_orders_src WHERE o_orderkey % 4 <> 3",
        root,
    )
    execute_dml(
        spark,
        "UPDATE kept_orders SET o_totalprice = -o_totalprice "
        "WHERE bucket7 = 0",
        {r["name"]: r["dir"] for r in C.show_tables(root)},
    )
    return M.read_version(spark, C.resolve(root, "kept_orders")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(igrid(F.col("o_totalprice"), 2)).alias("sum_signed_e2"),
    )


@register(
    "manifest_checkpointed_travel",
    f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum({sql_igrid('o_totalprice', 2)}) AS BIGINT)
             AS sum_price_e2
    FROM orders
    WHERE o_orderkey % 3 <> 2 AND o_orderkey >= 100
    """,
    "lake",
)
def manifest_checkpointed_travel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Manifest-log checkpoints end to end (r10): a 31-version history
    (2 appends + 27 metadata tombstone versions + a real delete + a
    late append) resolves TIMESTAMP travel to the pre-late-append
    instant through block summaries written every 10 commits
    (_CHECKPOINT_EVERY) — the deep-history path that would otherwise
    walk every manifest.  The snapshot read must equal the symbolic
    slice: both appended thirds, minus keys < 100, WITHOUT the late
    third committed after the travel instant."""
    t = tempfile.mkdtemp(prefix="mlake_ckpt_") + "/tbl"
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    M.commit(o.filter(F.col("o_orderkey") % 3 == 0), t)
    M.commit(o.filter(F.col("o_orderkey") % 3 == 1), t)
    for i in range(27):  # deep metadata-only history
        M.delete_where(t, [("o_orderkey", "==", -(10_000 + i))])
    M.delete_where(t, [("o_orderkey", "<", 100)])  # v30
    ts_v30 = M._read_manifest(t, 30)["ts"]
    M.commit(o.filter(F.col("o_orderkey") % 3 == 2), t)  # v31, late
    assert M.latest_version(t) == 31
    v = M.version_as_of(t, ts_v30)
    assert v == 30, v
    return M.read_version(spark, t, v).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(igrid(F.col("o_totalprice"), 2)).alias("sum_price_e2"),
    )


@register(
    "manifest_sql_lifecycle",
    f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN o_orderkey % 9 = 0
                         THEN -{sql_igrid('o_totalprice', 2)}
                         ELSE {sql_igrid('o_totalprice', 2)} END)
             AS BIGINT) AS sum_signed_e2
    FROM orders
    WHERE o_orderkey % 2 = 0 AND o_orderkey % 5 <> 0
    """,
    "lake",
)
def manifest_sql_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL SQL statement surface on one named table (r10):
    CREATE TABLE AS (even orders), INSERT INTO (a named SELECT,
    by-name matching), UPDATE (negate key%9==0 — sign-exact under the
    cent grid), DELETE (key%5==0 via a bucket column), OPTIMIZE
    (materializes the tombstones), VACUUM (reclaims the pre-compact
    files), DESCRIBE HISTORY (asserted python-side; served through
    checkpoints on long logs) — then a read resolved by NAME must
    equal the symbolic oracle.  One statement chain, six verbs, zero
    Python-API calls."""
    from finance_etl_pipeline_spark.operators import catalog as C
    from finance_etl_pipeline_spark.operators.sqldml import (
        execute_ddl,
        execute_dml,
    )

    root = tempfile.mkdtemp(prefix="mlake_sql_") + "/wh"
    table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    ).createOrReplaceTempView("lc_orders_src")
    execute_ddl(
        spark,
        "CREATE TABLE lc AS SELECT *, CAST(o_orderkey % 9 AS INT) AS "
        "b9, CAST(o_orderkey % 5 AS INT) AS b5 FROM lc_orders_src "
        "WHERE o_orderkey % 4 = 0",
        root,
    )
    names = {r["name"]: r["dir"] for r in C.show_tables(root)}
    # the odd-even half arrives by INSERT INTO (by-name matching)
    execute_dml(
        spark,
        "INSERT INTO lc SELECT *, CAST(o_orderkey % 9 AS INT) AS b9, "
        "CAST(o_orderkey % 5 AS INT) AS b5 FROM lc_orders_src "
        "WHERE o_orderkey % 4 = 2",
        names,
    )
    execute_dml(
        spark, "UPDATE lc SET o_totalprice = -o_totalprice WHERE b9 = 0",
        names,
    )
    execute_dml(spark, "DELETE FROM lc WHERE b5 = 0", names)
    execute_dml(spark, "OPTIMIZE lc", names)
    execute_dml(spark, "VACUUM lc RETAIN 0 HOURS KEEP LAST 1", names)
    res = execute_dml(spark, "DESCRIBE HISTORY lc", names)
    assert [r["version"] for r in res["rows"]] == [5], res["rows"]
    return M.read_version(spark, C.resolve(root, "lc")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(igrid(F.col("o_totalprice"), 2)).alias("sum_signed_e2"),
    )


@register(
    "manifest_sql_time_travel",
    f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum({sql_igrid('o_totalprice', 2)}) AS BIGINT)
             AS sum_price_e2
    FROM orders
    WHERE o_orderkey % 3 = 0
    """,
    "lake",
)
def manifest_sql_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL time travel in SELECT (r11): ``FROM t VERSION AS OF 1``
    rewrites to a pinned snapshot view (operators/sqldml.py::
    expand_time_travel — the Delta SELECT-surface shape) while the
    LATEST version holds a second third plus a delete.  The pinned
    read must equal the v1 slice exactly; the function also proves the
    latest tip genuinely differs (so a pass cannot come from the
    rewrite silently resolving to the tip) and that the ``t@1``
    shorthand resolves to the same snapshot."""
    from finance_etl_pipeline_spark.operators.sqldml import (
        expand_time_travel,
    )

    t = tempfile.mkdtemp(prefix="mlake_sqltt_") + "/tbl"
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    M.commit(o.filter(F.col("o_orderkey") % 3 == 0), t)  # v1: the pin
    M.commit(o.filter(F.col("o_orderkey") % 3 == 1), t)  # v2
    M.delete_where(t, [("o_orderkey", "<", 1000)])  # v3: tip differs
    stmt = expand_time_travel(
        spark, "SELECT * FROM tt VERSION AS OF 1", {"tt": t}
    )
    assert "tt__asof_v1" in stmt, stmt
    pinned = spark.sql(stmt)
    # shorthand resolves to the same snapshot; tip genuinely differs
    short = spark.sql(expand_time_travel(spark, "SELECT * FROM tt@1", {"tt": t}))
    assert short.count() == pinned.count()
    assert M.read_version(spark, t).count() != pinned.count()
    return pinned.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(igrid(F.col("o_totalprice"), 2)).alias("sum_price_e2"),
    )


@register(
    "manifest_restore_table",
    f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum({sql_igrid('o_totalprice', 2)}) AS BIGINT)
             AS sum_price_e2
    FROM orders
    WHERE o_orderkey % 4 IN (0, 1)
    """,
    "lake",
)
def manifest_restore_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE TABLE end to end (r11): two good appends (quarters 0
    and 1), then a BAD delete (drops half the rows) and a bad append
    (quarter 2), then ``RESTORE TABLE t TO VERSION AS OF 2`` through
    the SQL surface — the tip must equal the v2 snapshot exactly
    (both good quarters, nothing deleted, no quarter 2), history is
    preserved (the bad versions stay time-travelable), and the
    restore landed as a NEW version, not a history rewrite."""
    from finance_etl_pipeline_spark.operators.sqldml import execute_dml

    t = tempfile.mkdtemp(prefix="mlake_restore_") + "/tbl"
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    M.commit(o.filter(F.col("o_orderkey") % 4 == 0), t)  # v1
    M.commit(o.filter(F.col("o_orderkey") % 4 == 1), t)  # v2: the target
    M.delete_where(t, [("o_orderkey", ">", 0)])  # v3: the bad delete
    M.commit(o.filter(F.col("o_orderkey") % 4 == 2), t)  # v4: bad append
    res = execute_dml(
        spark, "RESTORE TABLE t TO VERSION AS OF 2", {"t": t}
    )
    assert res == {"op": "restore", "table": "t", "version": 5}, res
    # history preserved: the bad tip is still readable by version
    assert M.latest_version(t) == 5
    assert M._read_manifest(t, 4)["mode"] == "append"
    return M.read_version(spark, t).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(igrid(F.col("o_totalprice"), 2)).alias("sum_price_e2"),
    )


@register(
    "manifest_catalog_view",
    f"""
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum({sql_igrid('o_totalprice', 2)}) AS BIGINT)
             AS sum_price_e2
    FROM (
        SELECT CAST(o_orderkey % 7 AS INT) AS bucket, o_totalprice
        FROM orders
        WHERE o_orderkey % 2 = 0
    )
    WHERE bucket < 3
    GROUP BY bucket
    ORDER BY bucket
    """,
    "lake",
)
def manifest_catalog_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog VIEWS end to end (r11): CTAS a named table, persist a
    view over it (the shared-SELECT shape the reference re-derives in
    three scripts — see operators/catalog.py::create_view), persist a
    SECOND view over the FIRST (dependency-ordered fixpoint
    registration), then answer through the outer view.  Also proves
    the view reflects CURRENT table state: the result is computed
    AFTER an INSERT that landed post-CREATE VIEW."""
    from finance_etl_pipeline_spark.operators import catalog as C
    from finance_etl_pipeline_spark.operators.sqldml import (
        execute_ddl,
        execute_dml,
        register_catalog_views,
    )

    root = tempfile.mkdtemp(prefix="mlake_view_") + "/wh"
    table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    ).createOrReplaceTempView("vw_orders_src")
    execute_ddl(
        spark,
        "CREATE TABLE vt AS SELECT o_orderkey, o_totalprice "
        "FROM vw_orders_src WHERE o_orderkey % 4 = 0",
        root,
    )
    names = {r["name"]: r["dir"] for r in C.show_tables(root)}
    # the table view for CREATE VIEW validation + later reads
    M.read_version(spark, names["vt"]).createOrReplaceTempView("vt")
    execute_ddl(
        spark,
        "CREATE VIEW v_even AS SELECT CAST(o_orderkey % 7 AS INT) AS "
        "bucket, o_totalprice FROM vt",
        root,
    )
    # the CLI registers existing catalog views before each statement;
    # mirror that so the second CREATE's validation can see the first
    register_catalog_views(spark, root)
    execute_ddl(
        spark,
        "CREATE VIEW v_low AS SELECT * FROM v_even WHERE bucket < 3",
        root,
    )
    # the other even half arrives AFTER the views were defined
    execute_dml(
        spark,
        "INSERT INTO vt SELECT o_orderkey, o_totalprice FROM "
        "vw_orders_src WHERE o_orderkey % 4 = 2",
        names,
    )
    M.read_version(spark, names["vt"]).createOrReplaceTempView("vt")
    status = register_catalog_views(spark, root)
    assert status == {"v_even": None, "v_low": None}, status
    return spark.sql(
        "SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(sum(CAST(floor(o_totalprice * 100 + 0.5001) AS BIGINT)) "
        "AS BIGINT) AS sum_price_e2 "
        "FROM v_low GROUP BY bucket ORDER BY bucket"
    )


@register(
    "manifest_stats_agg",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(CASE WHEN o_orderkey % 2 = 1 THEN 1 END)
                AS BIGINT) AS n_flag,
           min(o_totalprice) AS mn_price,
           max(o_totalprice) AS mx_price,
           min(o_orderdate) AS mn_date,
           max(o_orderdate) AS mx_date,
           min(o_orderpriority) AS mn_prio,
           max(o_orderstatus) AS mx_status
    FROM orders
    """,
    "lake",
)
def manifest_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregates: ``SELECT count/min/max FROM t`` routed
    through ``sqldml.try_metadata_select`` — answered ENTIRELY from the
    manifest's per-file footer stats (O(#files) driver walk, zero data
    files opened; on 100 TB this is the difference between a shard read
    and a full-corpus scan).  The table is built in two commits with an
    appended column (``o_flag`` exists only in commit 2), so the oracle
    must agree with the evolution semantics: ``count(o_flag)`` counts
    only post-evolution rows while pre-evolution files contribute NULLs
    without being opened.  The route either PROVES the exact answer or
    declines (this entry raises rather than silently falling back, so
    the correctness gate certifies the metadata path itself — compare
    the scan-equivalence pytests in tests/test_metadata_select.py)."""
    from finance_etl_pipeline_spark.operators.sqldml import (
        try_metadata_select,
    )

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
        "o_orderstatus",
    )
    t = tempfile.mkdtemp(prefix="mlake_statsagg_") + "/tbl"
    M.commit(orders.filter(F.col("o_orderkey") % 2 == 0), t)
    M.commit(
        orders.filter(F.col("o_orderkey") % 2 == 1).withColumn(
            "o_flag", F.lit(1).cast("long")
        ),
        t,
        mode="append",
    )
    df = try_metadata_select(
        spark,
        "SELECT count(*) AS n_rows, count(o_flag) AS n_flag, "
        "min(o_totalprice) AS mn_price, max(o_totalprice) AS mx_price, "
        "min(o_orderdate) AS mn_date, max(o_orderdate) AS mx_date, "
        "min(o_orderpriority) AS mn_prio, "
        "max(o_orderstatus) AS mx_status FROM t",
        {"t": t},
    )
    if df is None:
        raise RuntimeError(
            "metadata aggregate route declined on a stats-complete "
            "table — the fast path regressed"
        )
    return df


@register(
    "manifest_copy_into_idempotent",
    f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
           CAST(sum({sql_igrid('o_totalprice', 2)}) AS BIGINT)
             AS sum_price_e2
    FROM orders
    WHERE o_orderkey % 3 <> 2
    """,
    "lake",
)
def manifest_copy_into_idempotent(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COPY INTO (idempotent file ingestion): two source batches land
    via three COPY statements — the middle one re-runs the first batch
    verbatim and must ingest NOTHING (load-history dedup by source
    path).  The oracle is the plain union of both batches; if
    idempotence regressed, every first-batch row double-counts and
    n_rows/sum diverge.  n_keys (distinct) would NOT catch the dup —
    n_rows and the sum are the sensitive probes.  Reference ingest
    shape: src/finance_etl/pipeline.py:53-84 re-reads the same raw_dir
    file drops on every scheduled run — idempotent ingestion is what
    keeps a re-run from double-loading that directory."""
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="mlake_copyinto_")
    src1, src2, t = f"{root}/b1", f"{root}/b2", f"{root}/tbl"
    orders.filter(F.col("o_orderkey") % 3 == 0).repartition(3).write.parquet(src1)
    orders.filter(F.col("o_orderkey") % 3 == 1).repartition(2).write.parquet(src2)
    r1 = M.copy_into(spark, t, src1)
    r2 = M.copy_into(spark, t, src1)  # replay: must be a no-op
    if r2["ingested"] != 0 or r2["version"] != r1["version"]:
        raise RuntimeError(f"COPY INTO replay ingested rows: {r2}")
    M.copy_into(spark, t, src2)
    return M.read_version(spark, t).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_keys"),
        F.sum(igrid(F.col("o_totalprice"), 2)).alias("sum_price_e2"),
    )


@register(
    "manifest_partition_agg",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(o_totalprice) AS mn_price,
           max(o_totalprice) AS mx_price,
           CAST(count(o_orderdate) AS BIGINT) AS n_dates
    FROM orders
    WHERE o_orderkey % 2 = 0
    GROUP BY o_orderpriority
    """,
    "lake",
)
def manifest_partition_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY over a hive-partition column answered from METADATA
    alone: each file's partition identity is an exact manifest fact
    (min = max path stats, raw strings for string columns), so
    per-partition count/min/max aggregate per-file stats without
    opening a data file — SHOW PARTITIONS as real SQL, exact row
    counts included.  Two appends fragment every partition across
    commits, so the entry also proves cross-commit accumulation."""
    from finance_etl_pipeline_spark.operators.sqldml import (
        try_metadata_select,
    )

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority", "o_orderdate"
    ).filter(F.col("o_orderkey") % 2 == 0)
    t = tempfile.mkdtemp(prefix="mlake_partagg_") + "/tbl"
    M.commit(
        orders.filter(F.col("o_orderkey") % 4 == 0),
        t,
        partition_by=["o_orderpriority"],
    )
    M.commit(
        orders.filter(F.col("o_orderkey") % 4 == 2),
        t,
        mode="append",
        partition_by=["o_orderpriority"],
    )
    df = try_metadata_select(
        spark,
        "SELECT o_orderpriority, count(*) AS n_rows, "
        "min(o_totalprice) AS mn_price, max(o_totalprice) AS mx_price, "
        "count(o_orderdate) AS n_dates "
        "FROM t GROUP BY o_orderpriority",
        {"t": t},
    )
    if df is None:
        raise RuntimeError(
            "grouped metadata aggregate declined on a fully "
            "partitioned table — the fast path regressed"
        )
    return df


@register(
    "manifest_partition_filter_agg",
    """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(o_totalprice) AS mn_price,
           max(o_totalprice) AS mx_price
    FROM orders
    WHERE o_orderkey % 2 = 0 AND o_orderpriority = '1-URGENT'
    GROUP BY o_orderstatus
    """,
    "lake",
)
def manifest_partition_filter_agg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """WHERE partition-equality + GROUP BY partition column, both
    served from METADATA: the predicate includes/excludes whole files
    by their exact partition identity (every row of a file shares its
    partition values), then surviving files aggregate per group — the
    `count the rows of ONE partition` probe a 100 TB table answers
    without opening a data file."""
    from finance_etl_pipeline_spark.operators.sqldml import (
        try_metadata_select,
    )

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority", "o_orderstatus"
    ).filter(F.col("o_orderkey") % 2 == 0)
    t = tempfile.mkdtemp(prefix="mlake_partfilter_") + "/tbl"
    M.commit(
        orders, t, partition_by=["o_orderpriority", "o_orderstatus"]
    )
    df = try_metadata_select(
        spark,
        "SELECT o_orderstatus, count(*) AS n_rows, "
        "min(o_totalprice) AS mn_price, max(o_totalprice) AS mx_price "
        "FROM t WHERE o_orderpriority = '1-URGENT' "
        "GROUP BY o_orderstatus",
        {"t": t},
    )
    if df is None:
        raise RuntimeError(
            "filtered metadata aggregate declined on a fully "
            "partitioned table — the fast path regressed"
        )
    return df


@register(
    "manifest_convert_parquet",
    f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum({sql_igrid('o_totalprice', 2)}) AS BIGINT)
             AS sum_price_e2
    FROM orders
    WHERE o_orderkey % 3 = 0 AND o_orderpriority = '2-HIGH'
    GROUP BY o_orderstatus
    """,
    "lake",
)
def manifest_convert_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONVERT TO MANIFEST: a hive-partitioned parquet directory is
    adopted IN PLACE (zero bytes copied) as v1 of a new table, then
    read back through the manifest with a partition predicate — the
    answer proves both the adopted file inventory (nothing lost or
    doubled) and partition pruning over path-derived identities.  The
    filter goes through read_version(where=...), so a pruning bug
    that wrongly drops or keeps an adopted file diverges from the
    oracle."""
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority", "o_orderstatus"
    ).filter(F.col("o_orderkey") % 3 == 0)
    root = tempfile.mkdtemp(prefix="mlake_convert_")
    src = f"{root}/src"
    orders.write.partitionBy("o_orderpriority").parquet(src)
    t = f"{root}/tbl"
    M.convert_parquet(spark, src, t)
    df = M.read_version(
        spark, t, where=[("o_orderpriority", "==", "2-HIGH")]
    )
    return (
        df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(igrid(F.col("o_totalprice"), 2)).alias("sum_price_e2"),
        )
    )
