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
