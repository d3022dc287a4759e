"""Product-quantization ANN over the embeddings table.

``ann_pq_adc_topk`` — train 4 per-subspace codebooks (deterministic
Lloyd's, operators/kmeans.py), encode the corpus as 4 small codes,
search by asymmetric distance computation.  Fully value-hash-verified:
the oracle unrolls all four subspace k-means runs CTE-for-CTE
(plans/kmeans_sql.py), joins the final assignments into a codes
relation, and recomputes the ADC sum in the same fixed term order.

Scale story (operators/pq.py): the corpus side of the search moves
only (vec_id, 4 codes) — at 100 TB of float32 embeddings that is the
difference between scanning 25 TB and scanning ~100 GB per query
batch.  Recall vs exact L2 is measured in tests/test_pq.py; on this
near-random corpus (the adversarial case for any quantizer) the test
asserts a floor, not a ceiling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.scalars import sql_round
from finance_etl_pipeline_spark.operators import pq as PQ
from finance_etl_pipeline_spark.operators.kmeans import ROUND_N
from finance_etl_pipeline_spark.operators.similarity import (
    QUERY_CAP,
    as_double,
    query_set,
)
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.plans.kmeans_sql import kmeans_ctes, sql_sqdist
from finance_etl_pipeline_spark.sources.readers import spread, table

DIM = 64
QUERY_STRIDE = 50  # same query set as ann_cosine_topk / ann_ivf_topk
TOP_K = 3


def _pq_pairs_ctes() -> list[str]:
    """Shared CTE chain: codebooks, codes, query set, ADC pair table."""
    ctes = ["base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)"]
    assigns, cents = [], []
    for i, (start, length) in enumerate(
        PQ.subspace_bounds(DIM, PQ.M_SUBSPACES)
    ):
        sub_base = f"s{i}base"
        ctes.append(
            f"{sub_base} AS (SELECT vec_id, v[{start}:{start + length - 1}] AS v"
            " FROM base)"
        )
        sub_ctes, a_final, c_final = kmeans_ctes(
            sub_base, length, prefix=f"s{i}_", k=PQ.K_SUB,
            iterations=PQ.ITERATIONS,
        )
        ctes.extend(sub_ctes)
        assigns.append(a_final)
        cents.append(c_final)

    code_cols = ", ".join(
        f"x{i}.cluster AS code{i}" for i in range(PQ.M_SUBSPACES)
    )
    code_joins = " ".join(
        f"JOIN {assigns[i]} x{i} ON x{i}.vec_id = b.vec_id"
        for i in range(PQ.M_SUBSPACES)
    )
    ctes.append(
        f"codes AS (SELECT b.vec_id, {code_cols} FROM base b {code_joins})"
    )
    ctes.append(
        "q AS (SELECT vec_id AS query_id, v AS qv FROM base"
        f" WHERE vec_id % {QUERY_STRIDE} = 0"
        f" ORDER BY vec_id LIMIT {QUERY_CAP})"
    )

    terms = []
    cent_joins = []
    for i, (start, length) in enumerate(
        PQ.subspace_bounds(DIM, PQ.M_SUBSPACES)
    ):
        qslice = f"q.qv[{start}:{start + length - 1}]"
        terms.append(sql_round(sql_sqdist(qslice, f"c{i}.v"), ROUND_N))
        cent_joins.append(f"JOIN {cents[i]} c{i} ON c{i}.cluster = x.code{i}")
    adist = sql_round(" + ".join(terms), ROUND_N)
    ctes.append(
        f"""pairs AS (
      SELECT q.query_id, x.vec_id, {adist} AS adist
      FROM q CROSS JOIN codes x {' '.join(cent_joins)}
      WHERE x.vec_id != q.query_id
    )"""
    )
    return ctes


def _pq_sql() -> str:
    ctes = _pq_pairs_ctes()
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT query_id, vec_id,
           CAST(floor(adist * 1000000 + 0.5001) AS BIGINT) AS adist_e6,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY adist, vec_id) AS BIGINT) AS rank
    FROM pairs
    QUALIFY rank <= {TOP_K}
    ORDER BY query_id, rank"""
    )


RERANK_C = 10  # PQ candidates fetched per query before exact rerank


def _pq_rerank_sql() -> str:
    ctes = _pq_pairs_ctes()
    exact = sql_round(sql_sqdist("q.qv", "b.v"), ROUND_N)
    ctes.append(
        f"""cand AS (
      SELECT query_id, vec_id
      FROM (SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY adist, vec_id) AS crank
            FROM pairs)
      WHERE crank <= {RERANK_C}
    )"""
    )
    ctes.append(
        f"""exact AS (
      SELECT c.query_id, c.vec_id, {exact} AS dist
      FROM cand c
      JOIN base b ON b.vec_id = c.vec_id
      JOIN q ON q.query_id = c.query_id
    )"""
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT query_id, vec_id,
           CAST(floor(dist * 1000000 + 0.5001) AS BIGINT) AS dist_e6,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY dist, vec_id) AS BIGINT) AS rank
    FROM exact
    QUALIFY rank <= {TOP_K}
    ORDER BY query_id, rank"""
    )


@register("ann_pq_adc_topk", _pq_sql(), "llm", "similarity", "quantized")
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC top-3: corpus stored as 4 codebook codes per vector;
    distance = Σ per-subspace ‖q_sub − centroid[code]‖².  The search
    scan never touches a corpus vector — see operators/pq.py."""
    emb = table(spark, sf_dir, "embeddings")
    base = (
        spread(emb)
        .select("vec_id", as_double(F.col("embedding")).alias("v"))
        .cache()
    )
    books = PQ.train_codebooks(base, DIM)
    from finance_etl_pipeline_spark.functions.scalars import igrid

    out = PQ.adc_topk(
        base, DIM, books, F.col("vec_id") % QUERY_STRIDE == 0, TOP_K
    )
    # emit the already-gridded distance as its exact e6 integer —
    # scalar-only, hash-canonicalization-proof output schema
    return out.select(
        "query_id", "vec_id", igrid("adist", 6).alias("adist_e6"), "rank"
    )


@register(
    "ann_pq_rerank_topk", _pq_rerank_sql(), "llm", "similarity", "quantized"
)
def ann_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieve-and-rerank — the standard production ANN
    pattern: PQ/ADC fetches the top-10 candidates per query from the
    codes-only scan, then EXACT squared distance on the original
    vectors of those 10 reranks to the final top-3.  Recall recovers
    toward exact search while the full-precision vectors are touched
    only for |queries| × 10 rows — at 100 TB the rerank join reads a
    vanishing fraction of the corpus (point lookups on vec_id), and
    the first stage still never scans a raw vector.

    Determinism: both stages rank on ROUND_N-gridded distances with
    vec_id tiebreaks; the candidate cut (crank ≤ 10) and final rank
    are therefore bit-stable cross-engine."""
    from finance_etl_pipeline_spark.operators.kmeans import ROUND_N as _RN
    from finance_etl_pipeline_spark.operators.pq import sqdist

    emb = table(spark, sf_dir, "embeddings")
    base = (
        spread(emb)
        .select("vec_id", as_double(F.col("embedding")).alias("v"))
        .cache()
    )
    books = PQ.train_codebooks(base, DIM)
    pred = F.col("vec_id") % QUERY_STRIDE == 0
    cand = PQ.adc_topk(base, DIM, books, pred, RERANK_C).select(
        "query_id", "vec_id"
    )
    q = query_set(base, pred).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    from finance_etl_pipeline_spark.functions.scalars import fround
    from pyspark.sql.window import Window

    exact = (
        cand.join(base, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "vec_id",
            fround(sqdist(F.col("qv"), F.col("v")), _RN).alias("dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("dist", "vec_id")
    from finance_etl_pipeline_spark.functions.scalars import igrid

    return (
        exact.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id", "vec_id", igrid("dist", 6).alias("dist_e6"), "rank"
        )
        .orderBy("query_id", "rank")
    )
