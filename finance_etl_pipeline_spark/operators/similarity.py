"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the correctness baseline — query set ×
  corpus with higher-order-function dot products (JVM-side, no UDF);
- LSH hyperplane bucketing: the scale path — deterministic md5-derived
  ±1 hyperplanes hash each vector to a bucket; near-neighbor search
  then only compares within buckets (candidates ∝ bucket size, not n).
  The plane matrix is precomputed once as literals (plans/llm.py
  ann_lsh_buckets) — no per-row hashing.

Floats are cast to double *before* any arithmetic: float32 partial
sums would diverge between engines; double dot products on the same
inputs are bit-identical (both engines fold sequentially).
Similarities are quantized to an exact e4 integer grid (``igrid``)
before ranking so rank order is deterministic cross-engine (ties
broken by vec_id) and the emitted column is hash-canonicalization-
proof (BIGINT, never a double).

At cluster scale the corpus side stays partitioned; the query set is
broadcast.  IVF-style coarse quantization would replace the random
hyperplanes with k-means centroids — same join shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.scalars import igrid

NUM_PLANES = 16

# hard cap on the ANN query workload: every query set in the package
# passes through query_set(), so every downstream broadcast and the
# exact ground-truth pass is O(QUERY_CAP · n) BY CONSTRUCTION.  The
# testdata carve (vec_id % 50 == 0) alone is SF-proportional; the cap
# never binds at test SFs (carve ≤ 40 rows ≤ sf0.1) so oracles are
# value-identical with or without it.
QUERY_CAP = 64


def query_set(base: DataFrame, query_pred: Column, cap: int = QUERY_CAP) -> DataFrame:
    """The bounded ANN query workload: rows of ``base`` matching
    ``query_pred``, capped to the ``cap`` smallest ``vec_id``s.

    Deterministic (vec_id is unique, so orderBy+limit is a total
    order) and cheap: Spark plans it as TakeOrdered — O(log cap) per
    row per partition plus a cap-row merge, never a global sort.  The
    cap is what turns "bounded by query workload by definition" from
    an assumption about the predicate into a structural property of
    the plan."""
    return base.filter(query_pred).orderBy("vec_id").limit(cap)


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_topk(
    emb: DataFrame, query_pred: Column, k: int = 5, dims: int | None = None
) -> DataFrame:
    """Top-k cosine neighbors for each query vector (brute force).

    The query side is small by construction → broadcast; the corpus
    never shuffles until the final per-query top-k (TakeOrdered-style
    via a rank window partitioned by query).  ``dims`` scores on the
    embedding's first ``dims`` components only (Matryoshka-style
    truncation — norms are recomputed over the slice)."""
    from finance_etl_pipeline_spark.sources.readers import spread

    raw = (
        F.col("embedding")
        if dims is None
        else F.slice(F.col("embedding"), 1, dims)
    )
    base = spread(emb).select(
        "vec_id",
        as_double(raw).alias("v"),
        norm(as_double(raw)).alias("nrm"),
    )
    q = query_set(base, query_pred).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    sim = igrid(
        dot(F.col("qv"), F.col("v"))
        / F.nullif(F.col("qn") * F.col("nrm"), F.lit(0.0)),
        4,
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(base)
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", sim.alias("cosine_e4"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_e4"), F.col("vec_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            "cosine_e4",
            F.col("rank").cast("long").alias("rank"),
        )
    )
