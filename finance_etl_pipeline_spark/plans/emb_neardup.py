"""Embedding-cosine near-duplicate pairs — the last dedup modality
(exact / MinHash / SimHash / n-gram Jaccard are text-side; this one
catches semantic dups that survive rewording).

The synthetic corpus is near-random (max off-diagonal cosine ≈ 0.51),
so the threshold is calibrated to 0.45 to keep the result set
non-trivial; production near-dup thresholds sit at 0.95+ on real
embedding spaces.  At this SF the pair join is brute force; at scale
the candidate set comes from ann_lsh_buckets / ann_ivf_topk cells
first (same pattern as the MinHash candidate restriction)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.scalars import fround
from finance_etl_pipeline_spark.operators.similarity import as_double, dot, norm
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import spread, table

THRESHOLD = 0.45


@register(
    "dd_embedding_neardup",
    f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    )
    SELECT * FROM (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             floor((list_dot_product(a.v, b.v) / nullif(a.nrm * b.nrm, 0.0)) * 10000 + 0.5001) / 10000 AS cosine
      FROM base a JOIN base b ON a.vec_id < b.vec_id
    ) WHERE cosine >= {THRESHOLD}
    ORDER BY vec_a, vec_b
    """,
    "llm",
    "dedup",
    "similarity",
)
def dd_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All embedding pairs with cosine ≥ threshold (vec_a < vec_b)."""
    emb = table(spark, sf_dir, "embeddings")
    base = spread(emb).select(
        "vec_id",
        as_double(F.col("embedding")).alias("v"),
        norm(as_double(F.col("embedding"))).alias("nrm"),
    )
    a = base.select(
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cosine = fround(
        dot(F.col("va"), F.col("vb")) / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0)),
        4,
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cosine.alias("cosine"))
        .filter(F.col("cosine") >= THRESHOLD)
        .orderBy("vec_a", "vec_b")
    )
