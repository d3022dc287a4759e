"""Distributed Lloyd's k-means over an embedding column.

The reference has no clustering surface (SURVEY.md §2.10 extension
scope); this is the unsupervised counterpart of the label-centroid
classifier in plans/emb_neardup.py, and the training step that IVF
coarse quantization (plans/ivf.py) and SemDeDup-style semantic dedup
(plans/semdedup.py) consume.

Spark-first shape, per iteration:

- **Assignment is map-only.** Centroids live on the driver (k×d
  doubles) and are compiled into the plan as literal arrays; the
  argmin over k squared distances is an ``array_min`` over
  ``struct(dist, cluster)`` — whole-stage codegen, zero shuffle,
  O(n·k·d) compute spread over all partitions.  This is the right
  plan at 100 TB: the data never moves for assignment.
- **The update shuffles k×d groups, not n rows.**  ``posexplode`` →
  ``groupBy(cluster, pos).avg`` partial-aggregates map-side, so the
  exchange carries at most k×d rows per input partition.
- **Driver state is k×d doubles** (collect of the k×d means) — the
  classic small-model / big-data split.

Determinism contract (cross-engine oracle parity): init = the k
lowest-id vectors verbatim; distances and updated centroid
components are quantized with ``fround`` each iteration so
summation-order ULPs between Spark and DuckDB can never flip an
argmin; ties on rounded distance break to the lowest cluster id.
An empty cluster simply drops out (both engines group by surviving
clusters).

Literal-array assignment scales to k in the hundreds (expression
size grows with k·d); for k in the thousands, switch assignment to a
broadcast crossJoin + ``min_by`` — same semantics, one broadcast.
"""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.scalars import fround

K = 8
ITERATIONS = 3
ROUND_N = 6

Centroids = list[tuple[int, list[float]]]


def pyfround(x: float, n: int = ROUND_N) -> float:
    """Driver-side twin of functions.scalars.fround (same floor+fudge)."""
    p = 10**n
    return math.floor(x * p + 0.5001) / p


def sqdist_to(v: Column, centroid: list[float]) -> Column:
    """Squared L2 distance from array column ``v`` to a literal centroid."""
    lit_c = F.array(*[F.lit(float(x)) for x in centroid])
    return sqdist_cols(v, lit_c)


def sqdist_cols(a: Column, b: Column) -> Column:
    """Squared L2 distance between two double-array columns — the
    same sequential zip_with/aggregate fold both engines mirror."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def argmin_candidates(v: Column, centroids: Centroids) -> Column:
    """``struct(dist, cluster)`` of the nearest centroid: the k
    centroids ride as ONE literal array of (cv, cluster) structs and
    the fround'd distance is a single ``transform`` lambda evaluated
    k times per row, so the expression tree is O(k·d) literals but
    O(1) operator nodes — where the per-candidate unrolled form this
    replaces built k separate fold subtrees, whose analysis/codegen
    cost dominated each driver job at small inputs (r12 A/B: one
    kmeans update job 1.06 → 0.76 s warm at sf0.1, values
    bit-identical — same fround'd fold per candidate, same
    (dist, cluster) array_min ordering with lowest-cluster
    tie-break)."""
    lit = F.array(
        *[
            F.struct(
                F.array(*[F.lit(float(x)) for x in vec]).alias("cv"),
                F.lit(cid).alias("cluster"),
            )
            for cid, vec in centroids
        ]
    )
    return F.array_min(
        F.transform(
            lit,
            lambda c: F.struct(
                fround(sqdist_cols(v, c["cv"]), ROUND_N).alias("dist"),
                c["cluster"].alias("cluster"),
            ),
        )
    )


def assign_clusters(base: DataFrame, centroids: Centroids) -> DataFrame:
    """Map-only nearest-centroid assignment.

    ``base`` must carry ``vec_id`` and a double-array column ``v``.
    Returns ``(vec_id, v, cluster, dist)`` with ``dist`` quantized by
    ``fround(ROUND_N)`` and ties broken to the lowest cluster id (the
    struct array_min orders by (dist, cluster))."""
    best = argmin_candidates(F.col("v"), centroids)
    return base.select(
        "vec_id", "v", best["cluster"].alias("cluster"), best["dist"].alias("dist")
    )


def initial_centroids(base: DataFrame, k: int = K) -> Centroids:
    """Deterministic seed: the k lowest-vec_id vectors, verbatim."""
    rows = base.orderBy("vec_id").limit(k).collect()
    return [(i, [float(x) for x in r.v]) for i, r in enumerate(rows)]


def update_centroids(assigned: DataFrame) -> Centroids:
    """Element-wise mean per cluster, quantized; empty clusters drop.

    Partial aggregation bounds the shuffle at k×d rows per input
    partition; the collect moves k×d doubles to the driver."""
    rows = (
        assigned.select("cluster", F.posexplode("v").alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(F.avg("val").alias("m"))
        .collect()
    )
    by_cluster: dict[int, dict[int, float]] = defaultdict(dict)
    for r in rows:
        by_cluster[r.cluster][r.pos] = pyfround(r.m)
    return [
        (cid, [dims[p] for p in range(len(dims))])
        for cid, dims in sorted(by_cluster.items())
    ]


def kmeans(
    base: DataFrame, k: int = K, iterations: int = ITERATIONS
) -> tuple[DataFrame, Centroids]:
    """Lloyd's iterations; returns (final assignment, final centroids).

    Exactly ``iterations`` centroid updates, assignments before and
    after each (no early exit) — a fixed-depth recurrence that a SQL
    oracle can unroll CTE-for-CTE.  Cache ``base`` at the call site:
    every update triggers one job over it."""
    centroids = initial_centroids(base, k)
    assigned = assign_clusters(base, centroids)
    for _ in range(iterations):
        centroids = update_centroids(assigned)
        assigned = assign_clusters(base, centroids)
    return assigned, centroids
