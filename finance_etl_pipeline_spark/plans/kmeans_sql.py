"""Oracle-SQL generator for the deterministic Lloyd's recurrence in
operators/kmeans.py — shared by the k-means / SemDeDup plans
(plans/semdedup.py) and product quantization (plans/pq.py), which
trains one codebook PER SUBSPACE and therefore needs the same CTE
chain emitted several times under distinct prefixes.

The generated chain mirrors operators/kmeans.py::kmeans exactly:
init = k lowest-vec_id vectors, per-iteration ``fround`` quantization
of distances and centroid components, (dist, cluster) tie-break.
"""

from __future__ import annotations

from finance_etl_pipeline_spark.functions.scalars import sql_round
from finance_etl_pipeline_spark.operators import kmeans as KM


def sql_sqdist(v: str, c: str) -> str:
    """Squared L2 via dot-product expansion (list_dot_product is the
    proven-available DuckDB primitive); sub-ULP differences vs the
    Spark Σ(x-y)² fold are absorbed by the 1e-6 quantization."""
    return (
        f"list_dot_product({v}, {v}) - 2 * list_dot_product({v}, {c})"
        f" + list_dot_product({c}, {c})"
    )


def kmeans_ctes(
    base: str,
    dim: int,
    prefix: str = "",
    k: int = KM.K,
    iterations: int = KM.ITERATIONS,
) -> tuple[list[str], str, str]:
    """CTE chain for one Lloyd's run over ``base`` (vec_id, v).

    Returns ``(ctes, final_assignment, final_centroids)`` where the
    names are ``{prefix}a{iterations}`` / ``{prefix}c{iterations}``.
    """
    ctes = [
        f"""{prefix}init AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v
      FROM (SELECT vec_id, v FROM {base} ORDER BY vec_id LIMIT {k})
    )"""
    ]

    def assignment(name: str, cents: str) -> str:
        d = sql_round(sql_sqdist("b.v", "c.v"), KM.ROUND_N)
        return f"""{name} AS (
      SELECT vec_id, v, cluster, dist FROM (
        SELECT b.vec_id, b.v, c.cluster, {d} AS dist,
               row_number() OVER (
                 PARTITION BY b.vec_id ORDER BY {d}, c.cluster) AS rn
        FROM {base} b CROSS JOIN {cents} c
      ) WHERE rn = 1
    )"""

    ctes.append(assignment(f"{prefix}a0", f"{prefix}init"))
    for it in range(1, iterations + 1):
        m = sql_round("avg(v[i])", KM.ROUND_N)
        ctes.append(
            f"""{prefix}c{it} AS (
      SELECT cluster, list(m ORDER BY pos) AS v FROM (
        SELECT cluster, i AS pos, {m} AS m
        FROM {prefix}a{it - 1}, range(1, {dim + 1}) t(i)
        GROUP BY cluster, i
      ) GROUP BY cluster
    )"""
        )
        ctes.append(assignment(f"{prefix}a{it}", f"{prefix}c{it}"))
    return ctes, f"{prefix}a{iterations}", f"{prefix}c{iterations}"
