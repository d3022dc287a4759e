"""K-means verified against an independent numpy Lloyd's run, plus
SemDeDup invariants.

The oracle-parity check proves Spark and DuckDB execute the same
recurrence; these tests prove the recurrence IS Lloyd's algorithm
(numpy twin with identical init/quantization reproduces every
assignment exactly), that the objective behaves (SSE non-increasing
across iterations), that assignment is genuinely map-only (no
Exchange in the assignment plan), and that cluster-restricted
semantic dedup returns a subset of the exact n² near-dup pairs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.operators import kmeans as KM
from finance_etl_pipeline_spark.operators.similarity import as_double
from finance_etl_pipeline_spark.sources.readers import table


def _base(spark, sf_dir):
    return (
        table(spark, sf_dir, "embeddings")
        .select("vec_id", as_double(F.col("embedding")).alias("v"))
        .cache()
    )


def _numpy_kmeans(ids, x, k, iterations):
    """Same algorithm, same quantization, in numpy."""
    fr = np.vectorize(KM.pyfround)
    order = np.argsort(ids)
    cents = {i: x[order[i]] for i in range(k)}

    def assign(cents):
        cids = sorted(cents)
        d = np.stack(
            [fr(((x - cents[c]) ** 2).sum(axis=1)) for c in cids], axis=1
        )
        # argmin with tie → lowest cluster id (np.argmin keeps first)
        return np.array([cids[j] for j in d.argmin(axis=1)]), d.min(axis=1)

    labels, dist = assign(cents)
    for _ in range(iterations):
        cents = {
            c: fr(x[labels == c].mean(axis=0))
            for c in sorted(set(labels.tolist()))
        }
        labels, dist = assign(cents)
    return labels, dist


def test_kmeans_matches_numpy_lloyds(spark, sf_dir):
    base = _base(spark, sf_dir)
    rows = base.orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows])
    x = np.array([r.v for r in rows], dtype=np.float64)
    want_labels, want_dist = _numpy_kmeans(ids, x, KM.K, KM.ITERATIONS)

    assigned, cents = KM.kmeans(base)
    got = {r.vec_id: (r.cluster, r.dist) for r in assigned.collect()}
    assert len(got) == len(ids)
    for vid, wl, wd in zip(ids.tolist(), want_labels.tolist(), want_dist.tolist()):
        gl, gd = got[vid]
        assert gl == wl, f"vec {vid}: cluster {gl} != numpy {wl}"
        assert abs(gd - wd) < 1e-9
    assert 1 < len(cents) <= KM.K


def test_kmeans_sse_non_increasing(spark, sf_dir):
    base = _base(spark, sf_dir)
    cents = KM.initial_centroids(base, KM.K)
    assigned = KM.assign_clusters(base, cents)
    sses = [assigned.agg(F.sum("dist")).collect()[0][0]]
    for _ in range(KM.ITERATIONS):
        cents = KM.update_centroids(assigned)
        assigned = KM.assign_clusters(base, cents)
        sses.append(assigned.agg(F.sum("dist")).collect()[0][0])
    for prev, cur in zip(sses, sses[1:]):
        # 1e-6 quantization of dists/centroids can nudge the exact
        # Lloyd's monotonicity by a rounding quantum per row
        assert cur <= prev + 1e-3 * len(sses), (sses, "SSE increased")
    assert sses[-1] < sses[0]


def test_assignment_plan_is_map_only(spark, sf_dir):
    import contextlib
    import io

    base = table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    cents = KM.initial_centroids(base, KM.K)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        KM.assign_clusters(base, cents).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan


def test_semantic_dedup_pairs_subset_of_exact(spark, sf_dir):
    from finance_etl_pipeline_spark.plans import all_queries

    reg = all_queries()
    sem = {
        (r.vec_a, r.vec_b, r.cosine_e4)
        for r in reg["dd_semantic_dedup"].fn(spark, sf_dir).collect()
    }
    exact = {
        (r.vec_a, r.vec_b, r.cosine_e4)
        for r in reg["dd_embedding_neardup"].fn(spark, sf_dir).collect()
    }
    assert sem <= exact
    # the cluster restriction must actually prune (scale story) while
    # still finding something on this corpus at the calibrated threshold
    assert len(exact) > 0
