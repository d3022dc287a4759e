"""Persisted IVF index (operators/ann_index.py): bit-equivalence with
the inline IVF path, incremental append maintenance, search-side
partition pruning, and the no-training-at-search-time contract."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from finance_etl_pipeline_spark.operators import manifest as M
from finance_etl_pipeline_spark.operators.ann_index import (
    N_CELLS,
    NPROBE,
    ivf_build_index,
    ivf_index_append,
    ivf_search,
)
from finance_etl_pipeline_spark.operators.similarity import (
    as_double,
    dot,
    norm,
)
from finance_etl_pipeline_spark.sources.readers import spread, table


def _base(spark, sf_dir):
    emb = spread(table(spark, sf_dir, "embeddings"))
    return emb, emb.select(
        "vec_id",
        as_double(F.col("embedding")).alias("v"),
        norm(as_double(F.col("embedding"))).alias("nrm"),
    )


def _queries(base):
    return base.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )


def test_persisted_search_equals_inline_ivf(spark, sf_dir, tmp_path):
    from finance_etl_pipeline_spark.plans.ivf import ann_ivf_topk

    emb, base = _base(spark, sf_dir)
    idx = str(tmp_path / "index")
    ivf_build_index(spark, emb, idx)
    got = ivf_search(
        spark, idx, _queries(base), k=3, nprobe=NPROBE
    ).collect()
    want = ann_ivf_topk(spark, sf_dir).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_append_then_search_matches_full_build(spark, sf_dir, tmp_path):
    """Incremental maintenance: build on a subset, append the rest —
    search results must equal a full one-shot build (same centroids,
    so the same assignment for every vector regardless of arrival)."""
    emb, base = _base(spark, sf_dir)
    full_idx = str(tmp_path / "full")
    inc_idx = str(tmp_path / "inc")
    ivf_build_index(spark, emb, full_idx)
    in_build = (F.col("vec_id") % 3 != 0) | (F.col("vec_id") < N_CELLS)
    ivf_build_index(spark, emb.filter(in_build), inc_idx)
    v = ivf_index_append(spark, emb.filter(~in_build), inc_idx)
    assert v == 2  # one build version + one append version
    q = _queries(base)
    got = ivf_search(spark, inc_idx, q, k=3).collect()
    want = ivf_search(spark, full_idx, q, k=3).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_search_never_trains_or_writes(spark, sf_dir, tmp_path):
    """The search half is read-only over the index tables: versions
    do not move, no matter how many searches run."""
    emb, base = _base(spark, sf_dir)
    idx = str(tmp_path / "index")
    ivf_build_index(spark, emb, idx)
    cv = M.latest_version(f"{idx}/centroids")
    av = M.latest_version(f"{idx}/assignments")
    for _ in range(2):
        ivf_search(spark, idx, _queries(base), k=3).collect()
    assert M.latest_version(f"{idx}/centroids") == cv
    assert M.latest_version(f"{idx}/assignments") == av


def test_search_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    """A probed read opens only the probed cells' files — the
    manifest's partition-level skipping enforcing the nprobe/n_cells
    scan fraction the layout promises."""
    emb, _ = _base(spark, sf_dir)
    idx = str(tmp_path / "index")
    ivf_build_index(spark, emb, idx)
    adir = f"{idx}/assignments"
    all_files = (
        M.read_version(spark, adir)
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    two_cells = (
        M.read_version(spark, adir, where=[("cell_id", "in", [0, 1])])
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    assert two_cells < all_files
    assert two_cells <= 2  # one file per cell by construction


def test_recall_floor_vs_exact(spark, sf_dir, tmp_path):
    """Persisted-IVF top-3 recall vs exact brute force stays above
    the floor the inline path is pinned to (nprobe=2 of 8 cells on a
    near-random corpus)."""
    from finance_etl_pipeline_spark.operators.similarity import cosine_topk

    emb, base = _base(spark, sf_dir)
    idx = str(tmp_path / "index")
    ivf_build_index(spark, emb, idx)
    got = ivf_search(spark, idx, _queries(base), k=3).collect()
    approx = {(r["query_id"], r["vec_id"]) for r in got}
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(
            emb, F.col("vec_id") % 50 == 0, k=3
        ).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.25, recall
# ------------------------------------------- r10: k-means + recluster


def _unit(v):
    import numpy as np

    v = np.asarray(v, dtype=float)
    return (v / np.linalg.norm(v)).tolist()


def _drift_corpus():
    """8 anchored clusters of 10 (ids 0-7 ARE the centers, so both
    'first_k' and the k-means seed start exact) — cluster 2's center
    is a DECOY direction d with cos(m, d) slightly above cos(m, e0):
    for a query near the drift center m (midway e0/e1), the FROZEN
    probe order is (d, e0-or-e1), so nprobe=2 fetches the decoy cell
    plus ONE half of the drift ball — recall ~0.5.  The 200-vector
    drift ball (ids 1000+, lean 0.06 toward e0/e1 alternating, noise
    0.015) splits 50/50 between stale cells 0 and 1.  After
    re-clustering, centroids 0 and 1 migrate INTO the ball (cos ~0.99
    to its queries), the decoy ranks third, and nprobe=2 covers the
    whole ball."""
    import numpy as np

    eye = np.eye(4)
    m = _unit(eye[0] + eye[1])
    # cos(m, decoy) ≈ 0.7155 — above cos(m, e0) = 0.7071, so a query
    # AT m ranks the decoy's cell first under the frozen centroids
    decoy = _unit([0.506, 0.506, 0.494, 0.494])
    centers = [
        eye[0].tolist(),
        eye[1].tolist(),
        decoy,
        eye[3].tolist(),
        (-eye[0]).tolist(),
        (-eye[1]).tolist(),
        (-eye[2]).tolist(),
        (-eye[3]).tolist(),
    ]
    rows = [(i, centers[i]) for i in range(8)]
    rng = np.random.default_rng(7)
    nid = 8
    for c in centers:
        for _ in range(9):
            rows.append(
                (nid, _unit(np.asarray(c) + rng.normal(0, 0.02, 4)))
            )
            nid += 1
    drift = []
    for i in range(200):
        lean = eye[0] if i % 2 == 0 else eye[1]
        drift.append(
            (
                1000 + i,
                _unit(
                    np.asarray(m)
                    + 0.06 * lean
                    + rng.normal(0, 0.015, 4)
                ),
            )
        )
    queries = [
        (2000 + j, _unit(np.asarray(m) + rng.normal(0, 0.003, 4)))
        for j in range(8)
    ]
    return rows, drift, queries


def _exact_topk(corpus, qv, k):
    """Brute-force oracle at the SAME quantization + tie rule as
    ivf_search (igrid 4, ties to lowest vec_id), so recall measures
    probe coverage, not 1e-4 tie shuffling."""
    import math

    import numpy as np

    qv = np.asarray(qv)
    sims = [
        (
            math.floor(
                float(
                    np.dot(qv, v)
                    / (np.linalg.norm(qv) * np.linalg.norm(v))
                )
                * 10**4
                + 0.5001
            ),
            i,
        )
        for i, v in corpus
    ]
    sims.sort(key=lambda t: (-t[0], t[1]))
    return {i for _, i in sims[:k]}


def _recall(spark, idx, corpus, queries, k=10, nprobe=NPROBE):
    q = spark.createDataFrame(
        queries, "query_id long, qv array<double>"
    ).withColumn("qn", F.expr("sqrt(aggregate(qv, 0d, (a, x) -> a + x*x))"))
    got = ivf_search(spark, idx, q, k=k, nprobe=nprobe).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, set()).add(r.vec_id)
    recs = []
    for qid, qv in queries:
        exact = _exact_topk(corpus, qv, k)
        recs.append(len(by_q.get(qid, set()) & exact) / k)
    return sum(recs) / len(recs)


def test_kmeans_build_and_metadata_counts(spark, tmp_path):
    from finance_etl_pipeline_spark.operators.ann_index import (
        ivf_cell_counts,
        ivf_skew,
    )

    rows, _, _ = _drift_corpus()
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = str(tmp_path / "index")
    ivf_build_index(spark, emb, idx, method="kmeans")
    counts = ivf_cell_counts(idx)
    assert sum(counts.values()) == 80
    # metadata counts equal a real group-by of the assignment table
    real = {
        int(r.cell_id): r.n
        for r in M.read_version(spark, idx + "/assignments")
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert counts == real
    # 8 clean anchored clusters: balanced
    assert ivf_skew(idx) <= 1.5


def test_recluster_restores_recall_after_drift(spark, tmp_path):
    from finance_etl_pipeline_spark.operators.ann_index import (
        ivf_cell_counts,
        ivf_maybe_recluster,
        ivf_skew,
    )

    rows, drift, queries = _drift_corpus()
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = str(tmp_path / "index")
    ivf_build_index(spark, emb, idx, method="kmeans")
    assert ivf_maybe_recluster(spark, idx, skew_threshold=2.0) is None

    # drift lands: appends assign into the FROZEN cells only, recall
    # for drift-center queries decays (decoy cell outranks one half)
    new = spark.createDataFrame(
        drift, "vec_id long, embedding array<double>"
    )
    ivf_index_append(spark, new, idx)
    corpus = rows + drift
    frozen = _recall(spark, idx, corpus, queries)
    assert frozen < 0.8, frozen
    assert ivf_skew(idx) > 2.0

    v = ivf_maybe_recluster(spark, idx, skew_threshold=2.0)
    assert v is not None
    after = _recall(spark, idx, corpus, queries)
    assert after >= 0.9, (frozen, after)
    assert sum(ivf_cell_counts(idx).values()) == 280


def test_skew_on_pre_meta_index_degrades(spark, tmp_path):
    """An index built before the meta table existed (legacy layout)
    must still answer ivf_skew from the observed cell count instead of
    crashing on the missing meta manifest."""
    import shutil

    from finance_etl_pipeline_spark.operators.ann_index import ivf_skew

    rows, _, _ = _drift_corpus()
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = str(tmp_path / "index")
    ivf_build_index(spark, emb, idx, method="kmeans")
    shutil.rmtree(idx + "/meta")  # simulate a pre-r10 index
    assert 1.0 <= ivf_skew(idx) <= 1.5
