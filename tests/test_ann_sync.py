"""IVF index lifecycle under churn (r11): ivf_delete (MoR tombstones,
deleted ids never surface, counts stay exact via the scan path) and
ivf_sync (base-table changefeed → one COW merge on the assignment
table, cursor persisted, equivalence with a from-scratch rebuild)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from finance_etl_pipeline_spark.operators import manifest as M
from finance_etl_pipeline_spark.operators.ann_index import (
    ivf_build_index,
    ivf_cell_counts,
    ivf_delete,
    ivf_search,
    ivf_sync,
)
from finance_etl_pipeline_spark.operators.similarity import as_double, norm
from finance_etl_pipeline_spark.sources.readers import spread, table


def _emb(spark, sf_dir):
    return spread(table(spark, sf_dir, "embeddings"))


def _queries(spark, sf_dir):
    base = _emb(spark, sf_dir).select(
        "vec_id",
        as_double(F.col("embedding")).alias("v"),
        norm(as_double(F.col("embedding"))).alias("nrm"),
    )
    return base.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )


def test_delete_hides_ids_and_counts_stay_exact(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "index")
    emb = _emb(spark, sf_dir)
    ivf_build_index(spark, emb, idx)
    q = _queries(spark, sf_dir)
    before = ivf_search(spark, idx, q, k=5).collect()
    victims = sorted(
        {int(r.vec_id) for r in before[: len(before) // 2]}
    )[:8]
    assert victims
    counts_before = ivf_cell_counts(idx)  # append-only: metadata path
    v = ivf_delete(idx, victims)
    assert v == 2  # build + tombstone version
    after = ivf_search(spark, idx, q, k=5).collect()
    assert not ({int(r.vec_id) for r in after} & set(victims))
    # metadata-only counts refuse under tombstones; the scan is exact
    with pytest.raises(ValueError, match="pass\\s+spark"):
        ivf_cell_counts(idx)
    counts_after = ivf_cell_counts(idx, spark)
    assert sum(counts_before.values()) - sum(counts_after.values()) == len(
        victims
    )
    want = {
        int(r.cell_id): int(r.n)
        for r in M.read_version(
            spark, str(tmp_path / "index" / "assignments")
        )
        .groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert counts_after == want
    # empty delete is a version no-op
    assert ivf_delete(idx, []) == v


def test_sync_tracks_base_table_churn(spark, sf_dir, tmp_path):
    """Index built from a base manifest table at v1; the base then
    appends, deletes, and updates; ivf_sync must reconcile the index
    to EXACTLY the current base — same live ids, same vectors, same
    search results as a from-scratch rebuild over the same centroids."""
    base_t = str(tmp_path / "base")
    idx = str(tmp_path / "index")
    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    M.commit(
        emb.filter(F.col("vec_id") % 5 != 4), base_t
    )  # v1: most vectors
    ivf_build_index(
        spark, M.read_version(spark, base_t), idx
    )
    # built from v1: mark synced without replaying the bootstrap feed
    res = ivf_sync(spark, idx, base_t, from_version=1)
    assert res == {"from_version": 1, "to_version": 1, "n_changes": 0}
    # churn: append the held-out fifth, delete %7==0, update (negate)
    # %11==3 vectors
    M.commit(emb.filter(F.col("vec_id") % 5 == 4), base_t)  # v2
    M.delete_where(base_t, [("vec_id", "<", 40)])  # v3
    M.update_where(
        spark,
        base_t,
        [("vec_id", ">=", 400), ("vec_id", "<", 420)],
        {"embedding": F.expr("transform(embedding, x -> -x)")},
    )  # v4
    res = ivf_sync(spark, idx, base_t)
    assert res["to_version"] == 4 and res["n_changes"] > 0
    # cursor persisted: a second sync is a no-op
    res2 = ivf_sync(spark, idx, base_t)
    assert res2 == {"from_version": 4, "to_version": 4, "n_changes": 0}
    # the synced assignment set == the base table, exactly
    assign = M.read_version(spark, idx + "/assignments")
    base_now = M.read_version(spark, base_t)
    assert assign.count() == base_now.count()
    got_ids = {int(r.vec_id) for r in assign.select("vec_id").collect()}
    want_ids = {int(r.vec_id) for r in base_now.select("vec_id").collect()}
    assert got_ids == want_ids
    # updated vectors carry the NEW values: compare against a fresh
    # assignment of the live base over the SAME persisted centroids
    # (sync never retrains — that is ivf_maybe_recluster's job)
    from finance_etl_pipeline_spark.operators.ann_index import (
        _assign_cells,
        _assignments_dir,
        _base as _vbase,
        _centroids_dir,
    )

    q = _queries(spark, sf_dir).filter(F.col("query_id") >= 50)
    rebuilt = str(tmp_path / "rebuilt")
    cents = M.read_version(spark, _centroids_dir(idx))
    M.commit(cents.coalesce(1), _centroids_dir(rebuilt), mode="overwrite")
    b = _vbase(base_now, "vec_id", "embedding")
    fresh = (
        _assign_cells(b, cents, top=1)
        .select("vec_id", "cell_id")
        .join(b, "vec_id")
        .select("vec_id", "v", "nrm", "cell_id")
    )
    M.commit(
        fresh.repartition(8, "cell_id"),
        _assignments_dir(rebuilt),
        mode="overwrite",
        partition_by=["cell_id"],
    )
    got = ivf_search(spark, idx, q, k=3).collect()
    want = ivf_search(spark, rebuilt, q, k=3).collect()
    assert want and [tuple(r) for r in got] == [tuple(r) for r in want]
    # counts under sync churn: scan path equals groupBy truth
    counts = ivf_cell_counts(idx, spark)
    assert sum(counts.values()) == base_now.count()


def test_skew_monitor_stays_exact_after_delete(spark, sf_dir, tmp_path):
    from finance_etl_pipeline_spark.operators.ann_index import ivf_skew

    idx = str(tmp_path / "index")
    ivf_build_index(spark, _emb(spark, sf_dir), idx)
    s0 = ivf_skew(idx)
    ivf_delete(idx, [0, 1, 2, 3])
    with pytest.raises(ValueError):
        ivf_skew(idx)  # metadata path refuses under tombstones
    s1 = ivf_skew(idx, spark)
    assert s1 > 0 and abs(s1 - s0) < 1.0
