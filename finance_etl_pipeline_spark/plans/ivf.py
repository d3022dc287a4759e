"""IVF-style ANN (coarse quantization) — the second scale path for
similarity search next to LSH buckets (ann_lsh_buckets).

Cells come from 8 deterministic centroids (the vectors with
vec_id < 8 — a real deployment uses k-means; determinism is required
here so the DuckDB oracle can mirror the assignment).  Each vector lives
in ONE cell; queries probe their NPROBE nearest cells — cost is
NPROBE/|cells| of the corpus per query, recall is the dial (the
corpus here is near-random, the adversarial case for IVF, so
nprobe=2 is what keeps recall useful; see tests/test_ann_recall.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.scalars import fround, igrid
from finance_etl_pipeline_spark.operators.similarity import as_double, dot, norm
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import spread, table

N_CELLS = 8
NPROBE = 2

_IVF_SQL = f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    ),
    cents AS (
      SELECT vec_id AS cell_id, v AS cv, nrm AS cn FROM base WHERE vec_id < {N_CELLS}
    ),
    ranked AS (
      SELECT b.vec_id, c.cell_id,
             row_number() OVER (
               PARTITION BY b.vec_id
               ORDER BY floor((list_dot_product(b.v, c.cv) / nullif(b.nrm * c.cn, 0.0)) * 1000000 + 0.5001) / 1000000 DESC,
                        c.cell_id
             ) AS rn
      FROM base b CROSS JOIN cents c
    ),
    assign AS (SELECT vec_id, cell_id FROM ranked WHERE rn = 1),
    qcells AS (
      SELECT vec_id AS query_id, cell_id
      FROM ranked WHERE rn <= {NPROBE} AND vec_id % 50 = 0
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM base WHERE vec_id % 50 = 0),
    pairs AS (
      SELECT DISTINCT q.query_id, b.vec_id,
             CAST(floor((list_dot_product(q.qv, b.v) / nullif(q.qn * b.nrm, 0.0)) * 10000 + 0.5001) AS BIGINT) AS cosine_e4
      FROM q
      JOIN qcells qc ON qc.query_id = q.query_id
      JOIN assign a ON a.cell_id = qc.cell_id
      JOIN base b ON b.vec_id = a.vec_id
      WHERE b.vec_id != q.query_id
    )
    SELECT query_id, vec_id, cosine_e4,
           CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine_e4 DESC, vec_id) AS BIGINT) AS rank
    FROM pairs
    QUALIFY rank <= 3
    ORDER BY query_id, rank
"""


@register("ann_ivf_topk", _IVF_SQL, "llm", "similarity")
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-3 with nprobe=2: every vector lives in its nearest of 8
    cells; each query probes its 2 nearest cells. At 100 TB the
    assignment is one broadcast pass over the corpus and each search
    touches ~NPROBE/N_CELLS of it."""
    emb = table(spark, sf_dir, "embeddings")
    base = spread(emb).select(
        "vec_id",
        as_double(F.col("embedding")).alias("v"),
        norm(as_double(F.col("embedding"))).alias("nrm"),
    )
    cents = base.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cell_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    sim_to_cent = fround(
        dot(F.col("v"), F.col("cv")) / F.nullif(F.col("nrm") * F.col("cn"), F.lit(0.0)),
        6,
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("centroid_sim"), F.col("cell_id")
    )
    ranked = (
        base.crossJoin(F.broadcast(cents))
        .select("vec_id", "cell_id", sim_to_cent.alias("centroid_sim"))
        .withColumn("rn", F.row_number().over(w_assign))
    )
    assign = ranked.filter(F.col("rn") == 1).select("vec_id", "cell_id")
    qcells = (
        ranked.filter((F.col("rn") <= NPROBE) & (F.col("vec_id") % 50 == 0))
        .select(F.col("vec_id").alias("query_id"), "cell_id")
    )
    q = base.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    cell_members = assign.join(base, "vec_id").select(
        "cell_id", "vec_id", "v", "nrm"
    )
    cosine = igrid(
        dot(F.col("qv"), F.col("v")) / F.nullif(F.col("qn") * F.col("nrm"), F.lit(0.0)),
        4,
    )
    pairs = (
        F.broadcast(q.join(qcells, "query_id"))
        .join(cell_members, "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cosine.alias("cosine_e4"))
        .distinct()
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("cosine_e4"), F.col("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rank") <= 3)
        .orderBy("query_id", "rank")
    )
