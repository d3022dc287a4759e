"""IVF-style ANN (coarse quantization) — the second scale path for
similarity search next to LSH buckets (ann_lsh_buckets).

Cells come from 8 deterministic centroids (the vectors with
vec_id < 8 — a real deployment uses k-means; determinism is required
here so the DuckDB oracle can mirror the assignment).  Each vector lives
in ONE cell; queries probe their NPROBE nearest cells — cost is
NPROBE/|cells| of the corpus per query, recall is the dial (the
corpus here is near-random, the adversarial case for IVF, so
nprobe=2 is what keeps recall useful; see tests/test_ann_recall.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.scalars import fround, igrid
from finance_etl_pipeline_spark.operators.similarity import (
    QUERY_CAP,
    as_double,
    dot,
    norm,
    query_set,
)
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import spread, table

N_CELLS = 8
NPROBE = 2

_IVF_SQL = f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    ),
    cents AS (
      SELECT vec_id AS cell_id, v AS cv, nrm AS cn FROM base WHERE vec_id < {N_CELLS}
    ),
    ranked AS (
      SELECT b.vec_id, c.cell_id,
             row_number() OVER (
               PARTITION BY b.vec_id
               ORDER BY floor((list_dot_product(b.v, c.cv) / nullif(b.nrm * c.cn, 0.0)) * 1000000 + 0.5001) / 1000000 DESC,
                        c.cell_id
             ) AS rn
      FROM base b CROSS JOIN cents c
    ),
    assign AS (SELECT vec_id, cell_id FROM ranked WHERE rn = 1),
    qcells AS (
      SELECT vec_id AS query_id, cell_id
      FROM ranked WHERE rn <= {NPROBE} AND vec_id % 50 = 0
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM base
         WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT {QUERY_CAP}),
    pairs AS (
      SELECT DISTINCT q.query_id, b.vec_id,
             CAST(floor((list_dot_product(q.qv, b.v) / nullif(q.qn * b.nrm, 0.0)) * 10000 + 0.5001) AS BIGINT) AS cosine_e4
      FROM q
      JOIN qcells qc ON qc.query_id = q.query_id
      JOIN assign a ON a.cell_id = qc.cell_id
      JOIN base b ON b.vec_id = a.vec_id
      WHERE b.vec_id != q.query_id
    )
    SELECT query_id, vec_id, cosine_e4,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine_e4 DESC, vec_id) AS BIGINT) AS rank
    FROM pairs
    QUALIFY rank <= 3
    ORDER BY query_id, rank
"""


@register("ann_ivf_topk", _IVF_SQL, "llm", "similarity")
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-3 with nprobe=2: every vector lives in its nearest of 8
    cells; each query probes its 2 nearest cells. At 100 TB the
    assignment is one broadcast pass over the corpus and each search
    touches ~NPROBE/N_CELLS of it."""
    emb = table(spark, sf_dir, "embeddings")
    base = spread(emb).select(
        "vec_id",
        as_double(F.col("embedding")).alias("v"),
        norm(as_double(F.col("embedding"))).alias("nrm"),
    )
    cents = base.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cell_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    sim_to_cent = fround(
        dot(F.col("v"), F.col("cv")) / F.nullif(F.col("nrm") * F.col("cn"), F.lit(0.0)),
        6,
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("centroid_sim"), F.col("cell_id")
    )
    ranked = (
        base.crossJoin(F.broadcast(cents))
        .select("vec_id", "cell_id", sim_to_cent.alias("centroid_sim"))
        .withColumn("rn", F.row_number().over(w_assign))
    )
    assign = ranked.filter(F.col("rn") == 1).select("vec_id", "cell_id")
    qcells = (
        ranked.filter((F.col("rn") <= NPROBE) & (F.col("vec_id") % 50 == 0))
        .select(F.col("vec_id").alias("query_id"), "cell_id")
    )
    q = query_set(base, F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    cell_members = assign.join(base, "vec_id").select(
        "cell_id", "vec_id", "v", "nrm"
    )
    cosine = igrid(
        dot(F.col("qv"), F.col("v")) / F.nullif(F.col("qn") * F.col("nrm"), F.lit(0.0)),
        4,
    )
    pairs = (
        F.broadcast(q.join(qcells, "query_id"))
        .join(cell_members, "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cosine.alias("cosine_e4"))
        .distinct()
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("cosine_e4"), F.col("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= 3)
        .orderBy("query_id", "rank")
    )


NPROBES = (1, 2, 4)

_SWEEP_SQL = f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    ),
    cents AS (
      SELECT vec_id AS cell_id, v AS cv, nrm AS cn FROM base WHERE vec_id < {N_CELLS}
    ),
    ranked AS (
      SELECT b.vec_id, c.cell_id,
             row_number() OVER (
               PARTITION BY b.vec_id
               ORDER BY floor((list_dot_product(b.v, c.cv) / nullif(b.nrm * c.cn, 0.0)) * 1000000 + 0.5001) / 1000000 DESC,
                        c.cell_id
             ) AS rn
      FROM base b CROSS JOIN cents c
    ),
    assign AS (SELECT vec_id, cell_id FROM ranked WHERE rn = 1),
    q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM base
         WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT {QUERY_CAP}),
    levels AS (SELECT unnest([{", ".join(str(n) for n in NPROBES)}]) AS np),
    qcells AS (
      SELECT l.np, r.vec_id AS query_id, r.cell_id
      FROM ranked r CROSS JOIN levels l
      WHERE r.vec_id % 50 = 0 AND r.rn <= l.np
    ),
    cand AS (
      SELECT qc.np, q.query_id, b.vec_id,
             CAST(floor((list_dot_product(q.qv, b.v) / nullif(q.qn * b.nrm, 0.0)) * 10000 + 0.5001) AS BIGINT) AS cosine_e4
      FROM q
      JOIN qcells qc ON qc.query_id = q.query_id
      JOIN assign a ON a.cell_id = qc.cell_id
      JOIN base b ON b.vec_id = a.vec_id
      WHERE b.vec_id != q.query_id
    ),
    scanned AS (
      SELECT np, query_id, count(*) AS n_scanned FROM cand GROUP BY np, query_id
    ),
    ivf_top AS (
      SELECT np, query_id, vec_id FROM (
        SELECT np, query_id, vec_id,
               row_number() OVER (PARTITION BY np, query_id
                                  ORDER BY cosine_e4 DESC, vec_id) AS rk
        FROM cand
      ) WHERE rk <= 3
    ),
    exact_top AS (
      SELECT query_id, vec_id FROM (
        SELECT q.query_id, b.vec_id,
               row_number() OVER (
                 PARTITION BY q.query_id
                 ORDER BY CAST(floor((list_dot_product(q.qv, b.v) / nullif(q.qn * b.nrm, 0.0)) * 10000 + 0.5001) AS BIGINT) DESC,
                          b.vec_id
               ) AS rk
        FROM q JOIN base b ON b.vec_id != q.query_id
      ) WHERE rk <= 3
    ),
    hits AS (
      SELECT i.np, count(*) AS n_hits
      FROM ivf_top i JOIN exact_top e
        ON e.query_id = i.query_id AND e.vec_id = i.vec_id
      GROUP BY i.np
    ),
    nq AS (SELECT count(*) AS n_queries FROM q)
    SELECT l.np AS nprobe,
           CAST(nq.n_queries AS BIGINT) AS n_queries,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(floor(coalesce(h.n_hits, 0) / (3.0 * nq.n_queries) * 10000 + 0.5001) AS BIGINT) AS recall_e4,
           CAST(coalesce(s.total_scanned, 0) AS BIGINT) AS total_scanned
    FROM levels l
    CROSS JOIN nq
    LEFT JOIN hits h ON h.np = l.np
    LEFT JOIN (SELECT np, sum(n_scanned) AS total_scanned FROM scanned GROUP BY np) s
      ON s.np = l.np
    ORDER BY nprobe
"""


@register("ann_ivf_probe_sweep", _SWEEP_SQL, "llm", "similarity", "eval")
def ann_ivf_probe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF quality/cost dial, measured: recall@3 against the exact
    cosine ground truth AND total candidates scanned, for
    nprobe ∈ {1, 2, 4} — the recall-vs-work curve an operator reads
    before picking nprobe on a new corpus (the IVF analogue of
    dd_lsh_band_sweep's band-width sweep).  Everything is derived from
    ONE centroid-ranking pass: each nprobe level re-filters the same
    ranked assignment, so the sweep costs one extra aggregate per
    level, not a recomputation.

    Scale: the exact arm is |queries| × corpus (broadcast query set —
    fine for an evaluation run on a sample); the IVF arms touch
    nprobe/N_CELLS of the corpus per query.  Output is |levels| rows."""
    emb = table(spark, sf_dir, "embeddings")
    base = spread(emb).select(
        "vec_id",
        as_double(F.col("embedding")).alias("v"),
        norm(as_double(F.col("embedding"))).alias("nrm"),
    )
    cents = base.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cell_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    sim_to_cent = fround(
        dot(F.col("v"), F.col("cv"))
        / F.nullif(F.col("nrm") * F.col("cn"), F.lit(0.0)),
        6,
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("centroid_sim"), F.col("cell_id")
    )
    ranked = (
        base.crossJoin(F.broadcast(cents))
        .select("vec_id", "v", "nrm", "cell_id", sim_to_cent.alias("centroid_sim"))
        .withColumn("rn", F.row_number().over(w_assign))
    )
    # ONE physical pass over the corpus: the assigned table (vector +
    # home cell) is eagerly pinned, and every later arm — query set,
    # cell members, the exact ground-truth scan — reads the pinned
    # 2-int-plus-vector rows instead of re-ranking the parquet scan.
    # Same posture and cluster caveat (persist(DISK_ONLY)) as the
    # shingle index in dd_minhash_lsh_pairs.
    assigned = (
        ranked.filter(F.col("rn") == 1)
        .select("vec_id", "cell_id", "v", "nrm")
        .localCheckpoint(eager=True)
    )
    levels = spark.createDataFrame([(n,) for n in NPROBES], ["np"])
    # query cells re-rank ONLY the query vectors (|queries| × k rows)
    q_ranked = (
        query_set(assigned, F.col("vec_id") % 50 == 0)
        .select("vec_id", "v", "nrm")
        .crossJoin(F.broadcast(cents))
        .select("vec_id", "cell_id", sim_to_cent.alias("centroid_sim"))
        .withColumn("rn", F.row_number().over(w_assign))
    )
    qcells = (
        q_ranked.join(F.broadcast(levels), F.col("rn") <= F.col("np"))
        .select("np", F.col("vec_id").alias("query_id"), "cell_id")
    )
    q = query_set(assigned, F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    cell_members = assigned.select("cell_id", "vec_id", "v", "nrm")
    cosine = igrid(
        dot(F.col("qv"), F.col("v"))
        / F.nullif(F.col("qn") * F.col("nrm"), F.lit(0.0)),
        4,
    )
    cand = (
        F.broadcast(q.join(qcells, "query_id"))
        .join(cell_members, "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("np", "query_id", "vec_id", cosine.alias("cosine_e4"))
    )
    scanned = cand.groupBy("np").agg(
        F.count(F.lit(1)).alias("total_scanned")
    )
    w_ivf = Window.partitionBy("np", "query_id").orderBy(
        F.desc("cosine_e4"), F.col("vec_id")
    )
    ivf_top = (
        cand.withColumn("rk", F.row_number().over(w_ivf))
        .filter(F.col("rk") <= 3)
        .select("np", "query_id", "vec_id")
    )
    exact_pairs = (
        F.broadcast(q)
        .crossJoin(assigned.select("vec_id", "v", "nrm"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cosine.alias("cosine_e4"))
    )
    w_exact = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_e4"), F.col("vec_id")
    )
    exact_top = (
        exact_pairs.withColumn("rk", F.row_number().over(w_exact))
        .filter(F.col("rk") <= 3)
        .select("query_id", "vec_id")
    )
    hits = ivf_top.join(exact_top, ["query_id", "vec_id"]).groupBy("np").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    nq = q.agg(F.count(F.lit(1)).alias("n_queries"))
    return (
        levels.crossJoin(F.broadcast(nq))
        .join(F.broadcast(hits), "np", "left")
        .join(F.broadcast(scanned), "np", "left")
        .select(
            F.col("np").alias("nprobe"),
            F.col("n_queries").cast("long").alias("n_queries"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            igrid(
                F.coalesce("n_hits", F.lit(0))
                / (3.0 * F.col("n_queries")),
                4,
            ).alias("recall_e4"),
            F.coalesce("total_scanned", F.lit(0))
            .cast("long")
            .alias("total_scanned"),
        )
        .orderBy("nprobe")
    )


#: persisted index roots, built once per (process, sf_dir) — repeated
#: invocations (bench warm-up + timed runs) time the SEARCH half only,
#: which is the point of a persisted index
_INDEX_DIRS: dict[str, str] = {}


def _persisted_index(spark: SparkSession, sf_dir: str) -> str:
    import tempfile

    got = _INDEX_DIRS.get(sf_dir)
    if got is not None:
        return got
    from finance_etl_pipeline_spark.operators.ann_index import (
        ivf_build_index,
        ivf_index_append,
    )

    idx = tempfile.mkdtemp(prefix="ann_ivf_idx_") + "/index"
    emb = spread(table(spark, sf_dir, "embeddings"))
    # build on ~80% of the corpus (keeping the deterministic centroid
    # vectors vec_id < N_CELLS in the build half), then APPEND the
    # rest: the published index only matches the full-corpus oracle
    # if incremental maintenance assigns appended vectors correctly
    in_build = (F.col("vec_id") % 5 != 0) | (F.col("vec_id") < N_CELLS)
    ivf_build_index(spark, emb.filter(in_build), idx)
    ivf_index_append(spark, emb.filter(~in_build), idx)
    _INDEX_DIRS[sf_dir] = idx
    return idx


@register("ann_ivf_persisted_topk", _IVF_SQL, "llm", "similarity", "bench")
def ann_ivf_persisted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-3 from the PERSISTED index (operators/ann_index.py):
    centroids + cell-partitioned assignments live as manifest tables
    (built once: 80% bulk build + 20% incremental append), and the
    search half reads the index, probes nprobe=2 cells via
    partition-pruned manifest reads, and never touches training —
    the 100 TB posture the inline ann_ivf_topk lacks.  Same
    deterministic centroids and rounding as the inline path, so the
    same DuckDB oracle certifies both."""
    from finance_etl_pipeline_spark.operators.ann_index import ivf_search

    idx = _persisted_index(spark, sf_dir)
    base = spread(table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        as_double(F.col("embedding")).alias("v"),
        norm(as_double(F.col("embedding"))).alias("nrm"),
    )
    q = query_set(base, F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    return ivf_search(spark, idx, q, k=3, nprobe=NPROBE)


def _recluster_sql() -> str:
    from finance_etl_pipeline_spark.functions.scalars import sql_round
    from finance_etl_pipeline_spark.plans.kmeans_sql import kmeans_ctes

    ctes, _, cfinal = kmeans_ctes("base", 64)
    sim = sql_round(
        "list_dot_product(b.v, c.cv) / nullif(b.n * c.cn, 0.0)", 6
    )
    return (
        "WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v "
        "FROM embeddings),\n    "
        + ",\n    ".join(ctes)
        + f""",
    cents AS (
      SELECT row_number() OVER (ORDER BY cluster) - 1 AS cell_id,
             v AS cv, sqrt(list_dot_product(v, v)) AS cn
      FROM {cfinal}
    ),
    nb AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM base
    ),
    assign AS (
      SELECT vec_id, cell_id FROM (
        SELECT b.vec_id, c.cell_id,
               row_number() OVER (
                 PARTITION BY b.vec_id
                 ORDER BY {sim} DESC, c.cell_id) AS rn
        FROM nb b CROSS JOIN cents c
      ) WHERE rn = 1
    )
    SELECT CAST(cell_id AS BIGINT) AS cell_id,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(vec_id) AS BIGINT) AS sum_vec_id
    FROM assign GROUP BY cell_id ORDER BY cell_id"""
    )


@register(
    "ann_ivf_reclustered_cells",
    _recluster_sql(),
    "llm",
    "similarity",
    "iterative",
)
def ann_ivf_reclustered_cells(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Index re-clustering end to end (r10): build the persisted IVF
    index with K-MEANS centroids on 2/3 of the corpus, append the
    rest against the frozen centroids, then force
    ``ivf_maybe_recluster`` — the rebuild must retrain Lloyd's over
    the FULL corpus (seed = 8 lowest vec_ids, the deterministic
    contract of operators/kmeans.py) and reassign every vector by
    rounded cosine.  The oracle recomputes the same recurrence
    CTE-for-CTE in DuckDB; the per-cell (count, sum of ids) pair
    diverges on any training, reindexing, or assignment drift.  The
    emitted counts are additionally asserted equal to the
    METADATA-ONLY ``ivf_cell_counts`` (manifest per-file stats — the
    balance monitor never opens a data file)."""
    import tempfile

    from finance_etl_pipeline_spark.operators import manifest as M
    from finance_etl_pipeline_spark.operators.ann_index import (
        ivf_build_index,
        ivf_cell_counts,
        ivf_index_append,
        ivf_maybe_recluster,
    )

    idx = tempfile.mkdtemp(prefix="ann_ivf_rc_") + "/index"
    emb = spread(table(spark, sf_dir, "embeddings"))
    in_build = F.col("vec_id") % 3 != 2
    ivf_build_index(spark, emb.filter(in_build), idx, method="kmeans")
    ivf_index_append(spark, emb.filter(~in_build), idx)
    assert ivf_maybe_recluster(spark, idx, skew_threshold=0.0) is not None

    out = (
        M.read_version(spark, os.path.join(idx, "assignments"))
        .groupBy("cell_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("vec_id").alias("sum_vec_id"),
        )
        .select(
            F.col("cell_id").cast("long").alias("cell_id"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("sum_vec_id").cast("long").alias("sum_vec_id"),
        )
        .orderBy("cell_id")
    )
    # pin the per-cell aggregate before the assertion collect: the
    # returned frame is consumed AGAIN by the caller's action, and
    # unpinned that re-runs the assignment-table read + groupBy (r12;
    # guide §1.2 don't compute twice — the pin is 8 rows)
    out = out.localCheckpoint(eager=True)
    meta_counts = ivf_cell_counts(idx)
    content_counts = {
        int(r["cell_id"]): int(r["n_rows"]) for r in out.collect()
    }
    assert meta_counts == content_counts, (meta_counts, content_counts)
    return out


_DELETE_SYNC_SQL = f"""
    WITH orig AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    live AS (
      SELECT vec_id,
             CASE WHEN vec_id % 25 = 7
                  THEN list_transform(v, x -> -x) ELSE v END AS v
      FROM orig WHERE vec_id % 10 <> 9
    ),
    cents AS (
      SELECT vec_id AS cell_id, v AS cv,
             sqrt(list_dot_product(v, v)) AS cn
      FROM orig WHERE vec_id < {N_CELLS}
    ),
    nb AS (
      SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM live
    ),
    assign AS (
      SELECT vec_id, cell_id FROM (
        SELECT b.vec_id, c.cell_id,
               row_number() OVER (
                 PARTITION BY b.vec_id
                 ORDER BY floor((list_dot_product(b.v, c.cv)
                   / nullif(b.nrm * c.cn, 0.0)) * 1000000 + 0.5001)
                   / 1000000 DESC,
                          c.cell_id
               ) AS rn
        FROM nb b CROSS JOIN cents c
      ) WHERE rn = 1
    )
    SELECT CAST(cell_id AS BIGINT) AS cell_id,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(vec_id) AS BIGINT) AS sum_vec_id
    FROM assign GROUP BY cell_id ORDER BY cell_id
"""


@register("ann_ivf_delete_sync", _DELETE_SYNC_SQL, "llm", "similarity")
def ann_ivf_delete_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index maintenance under base-table churn (r11): the corpus
    lives as a manifest table, the persisted IVF index is built from
    its v1 (frozen first-8 centroids), then the base DELETEs every
    %10==9 vector and UPDATEs (negates) every %25==7 vector —
    ``ivf_sync`` consumes the base's changefeed and reconciles the
    assignment table in ONE copy-on-write merge (removed ids deleted,
    changed vectors re-assigned against the frozen centroids; no
    retraining, no rebuild).  The oracle recomputes the full post-churn
    assignment symbolically: any leaked deleted id, stale vector, or
    assignment drift diverges the per-cell (count, id-sum) pair.  The
    emitted counts are additionally asserted equal to the scan-exact
    ``ivf_cell_counts(spark=...)`` — the monitor contract after
    deletes."""
    import tempfile

    from finance_etl_pipeline_spark.operators import manifest as M
    from finance_etl_pipeline_spark.operators.ann_index import (
        ivf_build_index,
        ivf_cell_counts,
        ivf_sync,
    )

    work = tempfile.mkdtemp(prefix="ann_ivf_sync_")
    base_t, idx = work + "/base", work + "/index"
    emb = spread(table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        "embedding",
        (F.col("vec_id") % 10).cast("int").alias("b10"),
        (F.col("vec_id") % 25).cast("int").alias("b25"),
    )
    M.commit(emb, base_t)  # v1
    ivf_build_index(spark, M.read_version(spark, base_t), idx)
    ivf_sync(spark, idx, base_t, from_version=1)  # mark synced at v1
    M.delete_where(base_t, [("b10", "==", 9)])  # v2
    M.update_where(
        spark,
        base_t,
        [("b25", "==", 7)],
        {"embedding": F.expr("transform(embedding, x -> -x)")},
    )  # v3
    res = ivf_sync(spark, idx, base_t)
    assert res["from_version"] == 1 and res["to_version"] == 3, res
    out = (
        M.read_version(spark, os.path.join(idx, "assignments"))
        .groupBy("cell_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("vec_id").alias("sum_vec_id"),
        )
        .select(
            F.col("cell_id").cast("long").alias("cell_id"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("sum_vec_id").cast("long").alias("sum_vec_id"),
        )
        .orderBy("cell_id")
    )
    # same 8-row pin as ann_ivf_reclustered_cells: assertion collect +
    # the caller's action would otherwise each run the read + groupBy
    out = out.localCheckpoint(eager=True)
    exact_counts = ivf_cell_counts(idx, spark)
    content_counts = {
        int(r["cell_id"]): int(r["n_rows"]) for r in out.collect()
    }
    assert exact_counts == content_counts, (exact_counts, content_counts)
    return out
