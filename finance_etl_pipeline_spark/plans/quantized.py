"""Int8-quantized similarity search — the memory-bandwidth scale path
for ANN (beyond-reference; companion to ann_lsh_buckets / ann_ivf_topk).

At 100 TB of embeddings the bottleneck is scan bandwidth: symmetric
per-vector int8 quantization (scale = max|x|/127) shrinks vectors 4×
(with the float32 source; 8× vs double) and turns the inner loop into
integer multiply-adds.  The cosine of two quantized vectors needs no
dequantization at all — the scales cancel:

    cos(q_a, q_b) = Σ(a_i·b_i) / (sqrt(Σ a_i²) · sqrt(Σ b_i²))

with every Σ an EXACT integer (64-dim · 127² ≪ 2⁶³), so the whole
pipeline is bit-deterministic cross-engine: quantization uses only
floor/abs/division on IEEE doubles, and ranking happens on the rounded
cosine.  tests/test_ann_recall.py measures top-3 recall of the
quantized ranking against exact double cosine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.scalars import igrid
from finance_etl_pipeline_spark.operators.similarity import (
    QUERY_CAP,
    as_double,
    query_set,
)
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import spread, table

QUERY_STRIDE = 50  # same query set as ann_cosine_topk / ann_ivf_topk
TOP_K = 3


def quantize_expr(v: Column) -> Column:
    """int8 symmetric quantization: round(x / (max|x|/127)) as long.

    floor(x/s + 0.5) is identical in Spark and DuckDB (one IEEE
    divide + add + floor); a zero vector keeps scale 0 → guarded to
    all-zero codes."""
    s = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    return F.when(
        s == 0.0, F.transform(v, lambda x: F.lit(0).cast("long"))
    ).otherwise(
        F.transform(v, lambda x: F.floor(x / s + F.lit(0.5)).cast("long"))
    )


def idot(a: Column, b: Column) -> Column:
    """Exact integer dot product (no float accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


_Q_SQL = f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    scaled AS (
      SELECT vec_id,
             list_aggregate(list_transform(v, x -> abs(x)), 'max') / 127.0 AS s,
             v
      FROM base
    ),
    codes AS (
      SELECT vec_id,
             CASE WHEN s = 0
                  THEN list_transform(v, x -> CAST(0 AS BIGINT))
                  ELSE list_transform(v, x -> CAST(floor(x / s + 0.5) AS BIGINT))
             END AS q
      FROM scaled
    ),
    normed AS (
      SELECT vec_id, q,
             sqrt(CAST(list_dot_product(q, q) AS DOUBLE)) AS qn
      FROM codes
    ),
    qset AS (
      SELECT * FROM normed WHERE vec_id % {QUERY_STRIDE} = 0
      ORDER BY vec_id LIMIT {QUERY_CAP}
    ),
    pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id,
             CAST(floor((CAST(list_dot_product(a.q, b.q) AS DOUBLE)
                    / nullif(a.qn * b.qn, 0.0)) * 10000 + 0.5001) AS BIGINT)
               AS cosine_q_e4
      FROM qset a JOIN normed b ON b.vec_id != a.vec_id
    )
    SELECT query_id, vec_id, cosine_q_e4,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine_q_e4 DESC, vec_id) AS BIGINT) AS rank
    FROM pairs
    QUALIFY rank <= {TOP_K}
    ORDER BY query_id, rank
"""


@register("ann_int8_topk", _Q_SQL, "llm", "similarity", "quantized")
def ann_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-3 cosine over int8-quantized embeddings.  Same
    join shape as ann_cosine_topk (broadcast query side × partitioned
    corpus) but the corpus scan moves 4× fewer bytes and the dot
    products are integer ops — at cluster scale that is the difference
    between bandwidth-bound and compute-bound."""
    emb = spread(table(spark, sf_dir, "embeddings"))
    codes = emb.select(
        "vec_id", quantize_expr(as_double(F.col("embedding"))).alias("q")
    )
    normed = codes.select(
        "vec_id",
        "q",
        F.sqrt(idot(F.col("q"), F.col("q")).cast("double")).alias("qn"),
    )
    q = query_set(normed, F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qq"),
        F.col("qn").alias("qqn"),
    )
    cos = igrid(
        idot(F.col("qq"), F.col("q")).cast("double")
        / F.nullif(F.col("qqn") * F.col("qn"), F.lit(0.0)),
        4,
    )
    pairs = (
        F.broadcast(q)
        .join(normed, F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cos.alias("cosine_q_e4"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_q_e4"), "vec_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )
