"""PERSISTED IVF index for ANN search — the 100 TB posture the
inline ``plans/ivf.py`` path lacks: centroids + cell assignments are
MATERIALIZED once as manifest tables (operators/manifest.py), searches
read the index and probe ``nprobe`` cells without ever re-running
training, and appends assign ONLY the new vectors (cost O(|new| ×
n_cells), never a rebuild).

Layout under ``index_dir``:

    centroids/     manifest table (cell_id, cv array<double>, cn)
    assignments/   manifest table (vec_id, v array<double>, nrm),
                   hive-partitioned by cell_id

Partitioning the assignment table by ``cell_id`` IS the IVF storage
layout: a search that probes ``nprobe`` of ``n_cells`` cells reads
``nprobe / n_cells`` of the corpus — enforced by the manifest's
partition-level file skipping (``read_version(where=('cell_id','in',
...))`` prunes whole cells from METADATA, no directory listing).

Centroids train two ways (``method=``): ``'first_k'`` — the vectors
with id < n_cells, deterministic, matching ``plans/ivf.py`` so the
DuckDB oracle can mirror the assignment — or ``'kmeans'`` (Lloyd's
via operators/kmeans.py, the real coarse quantizer, itself
oracle-mirrored CTE-for-CTE).  Index BALANCE is monitored from
metadata alone (``ivf_cell_counts`` / ``ivf_skew`` — manifest
per-file stats, no data file opened), and ``ivf_maybe_recluster``
retrains + reassigns when drift skews cells past a bound — the
missing half of incremental maintenance, since appends only ever
assign into the ORIGINAL cells.  Rounding is identical to the inline
path
(fround 6 for centroid similarity, igrid 4 for result cosine), so the
persisted search returns bit-identical results to the inline IVF —
the equivalence tests/test_ann_index.py pins.

Reference parity: Chezhira/finance-etl-pipeline has no ANN surface; this
follows the public IVF/Faiss + Delta-table composition pattern.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.scalars import fround, igrid
from finance_etl_pipeline_spark.operators import manifest as M
from finance_etl_pipeline_spark.operators.similarity import (
    as_double,
    dot,
    norm,
)

N_CELLS = 8
NPROBE = 2

_CENTROID_SCHEMA = "cell_id long, cv array<double>, cn double"


def _read_centroids(spark: SparkSession, index_dir: str) -> DataFrame:
    """The persisted centroids table — via the driver-local read fast
    path when eligible (always, for tables this module writes: tiny,
    overwrite-only, unmapped), else the full ``read_version``.  Same
    snapshot, same values; spares a scan job per lifecycle call."""
    local = M.read_version_local(spark, _centroids_dir(index_dir))
    return (
        local
        if local is not None
        else M.read_version(spark, _centroids_dir(index_dir))
    )


def _centroids_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "centroids")


def _assignments_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "assignments")


def _base(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    v = as_double(F.col(vec_col))
    return emb.select(
        F.col(id_col).alias("vec_id"),
        v.alias("v"),
        norm(v).alias("nrm"),
    )


def _centroid_sim() -> F.Column:
    return fround(
        dot(F.col("v"), F.col("cv"))
        / F.nullif(F.col("nrm") * F.col("cn"), F.lit(0.0)),
        6,
    )


def _assign_cells(base: DataFrame, cents: DataFrame, top: int) -> DataFrame:
    """(vec_id, cell_id, rn) — each vector ranked against every
    centroid; rn=1 is its home cell.  One broadcast pass over the
    corpus: |cells| is small by construction, so the crossJoin is
    corpus × broadcast, never a shuffle of the corpus."""
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("centroid_sim"), F.col("cell_id")
    )
    return (
        base.crossJoin(F.broadcast(cents))
        .select(
            "vec_id", "cell_id", _centroid_sim().alias("centroid_sim")
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top)
        .select("vec_id", "cell_id", "rn")
    )


def _assign_home_cells(base: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, v, nrm, cell_id) — each vector in its home (top-1)
    cell, as ONE map-side-combined aggregate.

    The general ``_assign_cells(top=1)`` ranks with a window
    partitioned by vec_id and then JOINS back to the corpus to
    recover (v, nrm) — a ×n_cells row blow-up through a sort plus a
    full corpus shuffle, for information the crossJoin row already
    had in hand.  Here the argmax is ``min_by`` over the
    (−sim, cell_id) struct (same ordering as the window: similarity
    DESC, cell_id ASC; fround'd sim makes the negation exact) and
    v/nrm ride along as ``first`` (constant within the group), so
    the ×n_cells explosion collapses in the partial aggregate before
    the single exchange and no join-back exists.  Used by every
    top-1 consumer (build / append / sync); search keeps
    ``_assign_cells`` for top=nprobe.

    NULL similarity (a zero-norm centroid makes every sim NULL via
    the nullif guard) must lose to any real similarity: the window's
    ``desc(centroid_sim)`` sorts NULLS LAST, but struct-field ordering
    is NULLS FIRST, so the negated sim is coalesced to +inf — NULL
    cells lose to every real cell, and all-NULL vectors tie-break to
    the smallest cell_id exactly like the window did.

    Contract: ``vec_id`` is assumed UNIQUE in ``base`` (true for every
    caller — ids come from a keyed table).  Duplicate ids would
    collapse to one output row here, where the window + join-back
    emitted one row per duplicate."""
    best = F.min_by(
        F.col("cell_id"),
        F.struct(
            F.coalesce(
                -F.col("centroid_sim"), F.lit(float("inf"))
            ).alias("ns"),
            F.col("cell_id"),
        ),
    )
    return (
        base.crossJoin(F.broadcast(cents))
        .select(
            "vec_id", "v", "nrm", "cell_id",
            _centroid_sim().alias("centroid_sim"),
        )
        .groupBy("vec_id")
        .agg(
            F.first("v").alias("v"),
            F.first("nrm").alias("nrm"),
            best.alias("cell_id"),
        )
        .select("vec_id", "v", "nrm", "cell_id")
    )


def _meta_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "meta")


def ivf_build_index(
    spark: SparkSession,
    emb: DataFrame,
    index_dir: str,
    n_cells: int = N_CELLS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "first_k",
    iterations: int = 3,
) -> int:
    """Materialize the IVF index: centroids table + cell-partitioned
    assignment table + a 1-row meta table (n_cells/method/iterations —
    what ``ivf_maybe_recluster`` needs to rebuild), each one manifest
    version.  Returns the assignment table's published version.
    Idempotent per call (overwrite): rebuilding refreshes each table
    atomically for readers (snapshot isolation per table).

    ``method``: ``'first_k'`` (deterministic — the vectors with
    id < n_cells, mirrored by the DuckDB oracle) or ``'kmeans'``
    (Lloyd's via operators/kmeans.py — the real coarse quantizer; the
    centroid COUNT may come back < n_cells when a cell empties)."""
    base = _base(emb, id_col, vec_col)
    if method == "kmeans":
        from finance_etl_pipeline_spark.operators.kmeans import kmeans

        train = base.select("vec_id", "v").cache()
        try:
            _, centroids = kmeans(train, k=n_cells, iterations=iterations)
        finally:
            train.unpersist()
        cents = spark.createDataFrame(
            [(int(i), [float(x) for x in cv]) for i, (_, cv) in
             enumerate(centroids)],
            "cell_id long, cv array<double>",
        ).withColumn("cn", norm(F.col("cv")))
    elif method == "first_k":
        cents = base.filter(F.col("vec_id") < n_cells).select(
            F.col("vec_id").alias("cell_id"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("cn"),
        )
    else:
        raise ValueError(f"unknown IVF training method: {method!r}")
    # tiny-commit fast path (r12): centroids are ≤ n_cells rows by
    # construction — collect ONCE (bit-exact Spark-computed values)
    # and publish driver-locally via commit_rows.  The old shape paid
    # a repartition shuffle + a Spark write job + a footer-harvest
    # pass for each of the two metadata-sized commits (~1-2 s per
    # build; it also obsoletes the r11 repartition(1)-vs-coalesce(1)
    # scheduler-stall workaround — no Spark write runs at all now).
    cent_rows = [
        (int(r["cell_id"]), list(r["cv"]), float(r["cn"]))
        for r in cents.collect()
    ]
    M.commit_rows(
        spark,
        cent_rows,
        _CENTROID_SCHEMA,
        _centroids_dir(index_dir),
        mode="overwrite",
    )
    M.commit_rows(
        spark,
        [(int(n_cells), method, int(iterations))],
        "n_cells long, method string, iterations long",
        _meta_dir(index_dir),
        mode="overwrite",
    )
    # the assignment consumes the collected centroids as a LOCAL
    # relation — same values, and the broadcast build no longer
    # re-runs the first_k filter scan
    cents = spark.createDataFrame(cent_rows, _CENTROID_SCHEMA)
    assigned = _assign_home_cells(base, cents)
    # one output file per cell: the write is repartitioned ON the
    # partition column so each task owns whole cells
    assigned = assigned.repartition(n_cells, "cell_id")
    return M.commit(
        assigned,
        _assignments_dir(index_dir),
        mode="overwrite",
        partition_by=["cell_id"],
    )


def ivf_index_append(
    spark: SparkSession,
    new_emb: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Incremental maintenance: assign ONLY the appended vectors
    against the PERSISTED centroids (cost O(|new| × n_cells)) and
    append them to the assignment table — training is never re-run.
    The append is one manifest version; concurrent searches keep
    their snapshot."""
    cents = _read_centroids(spark, index_dir)
    base = _base(new_emb, id_col, vec_col)
    assigned = _assign_home_cells(base, cents)
    n_cells = cents.count()  # tiny table; bounded by construction
    assigned = assigned.repartition(int(n_cells), "cell_id")
    return M.commit(
        assigned,
        _assignments_dir(index_dir),
        mode="append",
        partition_by=["cell_id"],
    )


def ivf_search(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = NPROBE,
) -> DataFrame:
    """Top-``k`` neighbors per query from the PERSISTED index:
    (query_id, vec_id, cosine_e4, rank).  ``queries`` is
    (query_id, qv array<double>, qn) — small by contract (the capped
    query-set shape of operators/similarity.py).

    Cost shape at scale: centroids are a tiny broadcast; the probed
    cell set (≤ |queries| × nprobe distinct values, ≤ n_cells — a
    BOUNDED driver collect) prunes the assignment scan to
    nprobe/n_cells of the corpus via partition-level file skipping;
    the candidate join is broadcast(queries × cells) → cell members.
    Training never runs here — the 'index built per query' gap this
    module closes."""
    adir = _assignments_dir(index_dir)
    cents = _read_centroids(spark, index_dir)
    qbase = queries.select(
        F.col("query_id").alias("vec_id"),
        F.col("qv").alias("v"),
        F.col("qn").alias("nrm"),
    )
    qc = _assign_cells(qbase, cents, top=nprobe).select(
        F.col("vec_id").alias("query_id"), "cell_id"
    )
    # bounded collect: ≤ |queries| × nprobe rows (queries are small by
    # contract) — collected ONCE and reused as a local relation, so
    # the probed-cell set and the candidate join's build side no
    # longer evaluate the assignment window (and re-scan the query
    # frame) separately (r12; guide §1.2 don't compute things twice)
    qcells_rows = qc.collect()
    probed = sorted({r["cell_id"] for r in qcells_rows})
    qcells = spark.createDataFrame(
        [tuple(r) for r in qcells_rows], qc.schema
    )
    members = M.read_version(
        spark, adir, where=[("cell_id", "in", probed)]
    )
    q = queries.select("query_id", "qv", "qn")
    cosine = igrid(
        dot(F.col("qv"), F.col("v"))
        / F.nullif(F.col("qn") * F.col("nrm"), F.lit(0.0)),
        4,
    )
    pairs = (
        F.broadcast(q.join(qcells, "query_id"))
        .join(members, "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cosine.alias("cosine_e4"))
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_e4"), F.col("vec_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def ivf_delete(index_dir: str, vec_ids: list[int]) -> int:
    """Delete vectors from the index by id — a merge-on-read tombstone
    on the assignment table (``manifest.delete_where``), so the delete
    is METADATA-ONLY (no cell file rewritten) and every search path is
    correct by construction: ``ivf_search`` reads through
    ``read_version``, which applies the tombstone, so deleted ids can
    never surface as neighbors.  Returns the assignment table's new
    version.  Exact per-cell counts under tombstones need a scan —
    ``ivf_cell_counts`` switches automatically (pass ``spark``).

    Keep the id list bounded (it is stored in the manifest as an IN
    predicate); for bulk churn driven by a base table, use
    ``ivf_sync`` — its removals ride a file-granular COW merge whose
    metadata cost is O(1) per version, not O(|ids|)."""
    if not vec_ids:
        return M.latest_version(_assignments_dir(index_dir))
    return M.delete_where(
        _assignments_dir(index_dir),
        [("vec_id", "in", [int(i) for i in vec_ids])],
    )


def _sync_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "sync")


def ivf_sync(
    spark: SparkSession,
    index_dir: str,
    table_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    from_version: int | None = None,
) -> dict:
    """Incrementally reconcile the index with a BASE manifest table's
    churn by consuming its changefeed (``manifest.changefeed_rows``)
    since the last sync: added vectors are assigned against the
    persisted centroids and inserted, removed ids deleted, changed
    vectors re-assigned — one file-granular copy-on-write
    ``merge_into`` version on the assignment table, cost ∝ |delta| +
    |touched cell files|, never a rebuild or a base-table scan beyond
    the two snapshot reads the feed itself needs.

    The cursor (last synced base version) persists as a 1-row manifest
    table under ``<index_dir>/sync``, so syncs resume across processes
    exactly-once-per-version.  With no cursor and no ``from_version``,
    the first sync bootstraps from the full snapshot (the
    ``from_version=0`` feed — every key 'added'); an index just built
    from ``read_version(base)`` at a known version passes
    ``from_version=<that version>`` once to mark itself synced without
    replaying the bootstrap.  Returns {'from_version', 'to_version',
    'n_changes'} (n_changes = feed rows applied; 0 means the index was
    already current).

    A changed vector may move cells: the merge updates its row (new
    cell_id) inside a rewrite dir, so the hive cell layout degrades
    gradually under churn — per-file min/max stats keep cell pruning
    CORRECT regardless, and ``ivf_maybe_recluster`` restores the clean
    layout once skew crosses the bound (the monitor→recluster loop
    this module already ships)."""
    sdir = _sync_dir(index_dir)
    stored = None
    if M.latest_version(sdir) > 0:
        cur = M.read_rows_local(sdir)
        if cur is None:  # fallback: cursor table needs the full path
            cur = [
                r.asDict() for r in M.read_version(spark, sdir).collect()
            ]
        stored = int(cur[0]["base_version"])
    from_v = from_version if from_version is not None else (stored or 0)
    to_v = M.latest_version(table_dir)
    if to_v == from_v:
        if stored != from_v:  # an explicit mark-synced still persists
            M.commit_rows(
                spark,
                [(int(to_v),)],
                "base_version long",
                sdir,
                mode="overwrite",
            )
        return {"from_version": from_v, "to_version": to_v, "n_changes": 0}
    feed = M.changefeed_rows(
        spark, table_dir, [id_col], from_v, to_v
    ).cache()
    try:
        n_changes = feed.count()
        if n_changes:
            cents = _read_centroids(spark, index_dir)
            live = feed.filter(F.col("change_type") != "removed").select(
                F.col(id_col), F.col(vec_col)
            )
            base = _base(live, id_col, vec_col)
            assigned = _assign_home_cells(base, cents).select(
                "vec_id", "v", "nrm", "cell_id",
                F.lit(False).alias("__del"),
            )
            sch = {f.name: f.dataType for f in assigned.schema.fields}
            removed = feed.filter(
                F.col("change_type") == "removed"
            ).select(
                F.col(id_col).cast(sch["vec_id"]).alias("vec_id"),
                F.lit(None).cast(sch["v"]).alias("v"),
                F.lit(None).cast(sch["nrm"]).alias("nrm"),
                F.lit(None).cast(sch["cell_id"]).alias("cell_id"),
                F.lit(True).alias("__del"),
            )
            M.merge_into(
                spark,
                _assignments_dir(index_dir),
                assigned.unionByName(removed),
                ["vec_id"],
                delete_col="__del",
            )
    finally:
        feed.unpersist()
    M.commit_rows(
        spark, [(int(to_v),)], "base_version long", sdir, mode="overwrite"
    )
    return {
        "from_version": from_v,
        "to_version": to_v,
        "n_changes": int(n_changes),
    }


def ivf_cell_counts(
    index_dir: str, spark: SparkSession | None = None
) -> dict[int, int]:
    """Per-cell LIVE row counts.  Append-only indexes (no tombstones)
    answer from the assignment table's MANIFEST alone (per-file stats
    grouped by the hive partition value — O(#files) of metadata even
    at 100 TB).  Once ``ivf_delete`` has landed merge-on-read
    tombstones, per-file counts over-count the deleted rows, so the
    metadata path is no longer exact: pass ``spark`` and the counts
    come from one tombstone-applying scan (a groupBy over the pruned
    read); without a session this raises rather than return wrong
    numbers."""
    adir = _assignments_dir(index_dir)
    m = M._read_manifest(adir, M.latest_version(adir))

    def _scan_counts() -> dict[int, int]:
        return {
            int(r["cell_id"]): int(r["n"])
            for r in M.read_version(spark, adir)
            .groupBy("cell_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    if m.get("deletes"):
        if spark is None:
            raise ValueError(
                "the assignment table carries delete tombstones "
                "(ivf_delete); exact cell counts need a scan — pass "
                "spark"
            )
        return _scan_counts()
    counts: dict[int, int] = {}
    for d in m["dirs"]:
        for e in M._dir_entries(adir, m, d) or []:
            cid = (e.get("parts") or {}).get("cell_id")
            if cid is None:
                # merge-rewritten files are unpartitioned: their exact
                # per-cell split needs the stats min==max fast path or
                # a scan
                st = (e.get("stats") or {}).get("cell_id") or {}
                if (
                    st.get("min") is not None
                    and st.get("min") == st.get("max")
                ):
                    cid = st["min"]
                elif spark is not None:
                    return _scan_counts()
                else:
                    raise ValueError(
                        "a rewritten assignment file spans cells; "
                        "exact counts need a scan — pass spark"
                    )
            counts[int(cid)] = counts.get(int(cid), 0) + int(e["rows"])
    return counts


def ivf_skew(index_dir: str, spark: SparkSession | None = None) -> float:
    """Balance factor of the index: max cell rows / ideal-even rows
    (1.0 = perfectly balanced, n_cells = everything in one cell).
    Computed metadata-only via ``ivf_cell_counts`` while the index is
    append-only (pass ``spark`` to stay exact after deletes/sync
    churn); the declared n_cells (meta table at build time) is the
    denominator's cell count, so cells EMPTIED by drift count against
    balance too."""
    counts = ivf_cell_counts(index_dir, spark)
    total = sum(counts.values())
    if not total:
        return 1.0
    # declared cell count from the meta table's manifest stats —
    # metadata-only like the counts themselves
    mdir = _meta_dir(index_dir)
    declared = None
    if M.latest_version(mdir) > 0:  # pre-meta indexes degrade below
        mm = M._read_manifest(mdir, M.latest_version(mdir))
        for d in mm["dirs"]:
            for e in M._dir_entries(mdir, mm, d) or []:
                st = e.get("stats", {}).get("n_cells")
                if st and st.get("max") is not None:
                    declared = int(st["max"])
    n = declared or len(counts)
    return max(counts.values()) / (total / n)


def ivf_maybe_recluster(
    spark: SparkSession,
    index_dir: str,
    skew_threshold: float = 2.0,
    iterations: int | None = None,
) -> int | None:
    """Re-cluster the index when distribution drift has skewed it past
    ``skew_threshold`` (balance factor, see ``ivf_skew``); returns the
    rebuilt assignment table's version, or None when the index is
    still balanced (O(#files) metadata check, nothing else runs).

    The rebuild trains k-means over the CURRENT vectors (regardless of
    the original build method — re-running 'first_k' would reproduce
    the same drifted centroids) with the meta table's n_cells, then
    overwrites centroids + assignments atomically per table.  This is
    the missing half of incremental maintenance: appends only ever
    assign into the ORIGINAL cells, so under drift cells skew — a
    probed giant cell approaches a full scan and recall decays for
    queries whose true neighbors straddle stale boundaries."""
    if ivf_skew(index_dir, spark) <= skew_threshold:
        return None
    mdir = _meta_dir(index_dir)
    mrows = M.read_rows_local(mdir)
    meta = (
        mrows[0]
        if mrows is not None
        else M.read_version(spark, mdir).collect()[0].asDict()
    )
    vecs = M.read_version(spark, _assignments_dir(index_dir)).select(
        "vec_id", "v"
    )
    return ivf_build_index(
        spark,
        vecs,
        index_dir,
        n_cells=int(meta["n_cells"]),
        id_col="vec_id",
        vec_col="v",
        method="kmeans",
        iterations=int(
            meta["iterations"] if iterations is None else iterations
        ),
    )
