"""K-means clustering and SemDeDup-style semantic dedup over the
embeddings table.

Two queries:

- ``emb_kmeans_clusters`` — Lloyd's k-means (operators/kmeans.py),
  fixed iterations, fully value-hash-verified: the loop unrolls into
  one assignment CTE + one centroid CTE per iteration (the
  graph_pagerank_copurchase precedent for iterative algorithms).
- ``dd_semantic_dedup`` — the SemDeDup recipe (Abbas et al. 2023,
  arXiv:2303.09540): cluster first, then search for near-duplicate
  pairs only WITHIN a cluster.  Candidate volume is Σ|cluster|²
  instead of n² — with production k ≈ n / target_cluster_size the
  per-cluster pair join is constant-bounded, which is what makes
  embedding dedup feasible at 100 TB.  Here the brute within-cluster
  join doubles as a recall probe against dd_embedding_neardup (the
  exact n² baseline): tests/test_kmeans.py asserts containment.

Skew note: with the test-scale k=8 the pair join keys on only 8
cluster ids; at real scale k is thousands-to-millions, the key is
high-cardinality, and AQE skew-split handles hot clusters.

Determinism: distances/centroids quantized per iteration (see
operators/kmeans.py); cosine quantized at 4dp like every similarity
query.  The oracle hardcodes DIM=64 (the testdata embedding width);
the Spark side is dimension-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.scalars import igrid, sql_igrid
from finance_etl_pipeline_spark.operators import kmeans as KM
from finance_etl_pipeline_spark.operators.similarity import as_double, dot
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.plans.kmeans_sql import kmeans_ctes
from finance_etl_pipeline_spark.sources.readers import spread, table

DIM = 64
COSINE_THRESHOLD = 0.45  # near-random synthetic corpus; prod ≈ 0.95+


def _kmeans_ctes() -> str:
    """The WITH-chain: init → a0 → (c1 → a1) … for ITERATIONS rounds
    (shared generator in plans/kmeans_sql.py)."""
    ctes, _, _ = kmeans_ctes("base", DIM)
    return "WITH " + ",\n    ".join(
        ["base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)"]
        + ctes
    )


def _final_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    base = (
        spread(emb)
        .select("vec_id", as_double(F.col("embedding")).alias("v"))
        .cache()
    )
    assigned, _ = KM.kmeans(base)
    # pin the final assignment: dd_semantic_dedup consumes it on BOTH
    # sides of the within-cluster pair join, and unpinned each side
    # re-runs the full literal-centroid argmin over the corpus (the
    # HOF distance is the expensive part of this plan).  For
    # emb_kmeans_clusters (single consumer) the checkpoint is
    # cost-neutral: one materialization either way.
    return assigned.localCheckpoint(eager=True)


@register(
    "emb_kmeans_clusters",
    _kmeans_ctes()
    + f"""
    SELECT vec_id, cluster,
           CAST(floor(dist * 1000000 + 0.5001) AS BIGINT) AS dist_e6
    FROM a{KM.ITERATIONS} ORDER BY vec_id""",
    "llm",
    "similarity",
    "iterative",
)
def emb_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final Lloyd's assignment: (vec_id, cluster, squared distance).

    Assignment never shuffles (literal-centroid array_min, map-only);
    each of the {ITERATIONS} updates shuffles only k×d partial means
    — see operators/kmeans.py for the 100 TB rationale."""
    from finance_etl_pipeline_spark.functions.scalars import igrid

    return _final_assignment(spark, sf_dir).select(
        "vec_id", "cluster", igrid("dist", 6).alias("dist_e6")
    ).orderBy("vec_id")


@register(
    "dd_semantic_dedup",
    _kmeans_ctes()
    + f""",
    nrm AS (
      SELECT vec_id, sqrt(list_dot_product(v, v)) AS n FROM base
    )
    SELECT * FROM (
      SELECT a.cluster, a.vec_id AS vec_a, b.vec_id AS vec_b,
             {sql_igrid(
                 "list_dot_product(a.v, b.v) / nullif(na.n * nb.n, 0.0)", 4
             )} AS cosine_e4
      FROM a{KM.ITERATIONS} a
      JOIN a{KM.ITERATIONS} b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      JOIN nrm na ON a.vec_id = na.vec_id
      JOIN nrm nb ON b.vec_id = nb.vec_id
    ) WHERE cosine_e4 >= {int(COSINE_THRESHOLD * 10000)}
    ORDER BY vec_a, vec_b""",
    "llm",
    "dedup",
    "similarity",
)
def dd_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: near-dup pairs restricted to a shared k-means cluster.

    The cluster restriction is the scale story — pair candidates are
    generated per cluster (Σ|cluster|² ≪ n²), the same candidate-
    pruning shape as MinHash bands and IVF cells.  Keeper policy on a
    pair list is min(vec_id), as in dd_dedup_clusters."""
    assigned = _final_assignment(spark, sf_dir)
    withn = assigned.withColumn("nrm", F.sqrt(dot(F.col("v"), F.col("v"))))
    a = withn.select(
        "cluster",
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = withn.select(
        F.col("cluster").alias("cluster_b"),
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cosine = igrid(
        dot(F.col("va"), F.col("vb"))
        / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0)),
        4,
    )
    return (
        a.join(
            b,
            (F.col("cluster") == F.col("cluster_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .select("cluster", "vec_a", "vec_b", cosine.alias("cosine_e4"))
        .filter(F.col("cosine_e4") >= int(COSINE_THRESHOLD * 10000))
        .orderBy("vec_a", "vec_b")
    )
