"""Maximal Marginal Relevance (MMR) diversified retrieval.

Carbonell & Goldstein (1998): after ranking candidates by relevance,
select results greedily by ``λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)`` so
each pick is relevant to the query but dissimilar from what is already
selected — the standard answer to near-duplicate clutter in retrieval
results (RAG context assembly, search-result diversification).

Spark-first shape: the greedy loop has a FIXED small depth (k=5), so
it is unrolled as five DataFrame stages — each step is an anti-join
(drop already-selected), a max-similarity aggregate against the
selected set, and a per-query window argmax.  No driver round-trips,
no UDFs; the DuckDB oracle unrolls the identical five steps as CTEs
(the same fixed-depth-unroll technique as the k-means and PQ oracles).

Determinism: relevance and pairwise similarity are frounded at 4 dp
before any ranking, the MMR score is re-frounded after the affine
combination, and every argmax breaks ties by vec_id — so the selected
SET and ORDER are bit-identical cross-engine.

Scale (100 TB): everything after the top-N relevance stage operates on
|queries| × N rows (N=20 here) — candidate generation is the only
corpus-sized stage, and it swaps for the IVF/PQ scale paths
(plans/ivf.py, operators/pq.py) without touching the MMR unroll.  The
pairwise-similarity table is |queries| × N² — still query-proportional,
never corpus-proportional.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.scalars import fround, igrid
from finance_etl_pipeline_spark.operators import similarity as S
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import spread, table

_N_CAND = 20  # relevance candidates per query
_K = 5  # diversified picks per query
_LAM = 0.7  # relevance weight
_LAM1 = 0.3  # 1-λ as its OWN literal: Python's 1-0.7 is NOT the double 0.3


def _mmr_oracle() -> str:
    """Fixed-depth CTE unrolling of the greedy MMR loop."""
    steps = []
    prev = "sel1"
    for k in range(2, _K + 1):
        steps.append(f"""
    ms{k} AS (
      SELECT p.query_id, p.a AS vec_id, max(p.sim) AS maxsim
      FROM pairsim p JOIN {prev} s
        ON p.query_id = s.query_id AND p.b = s.vec_id
      GROUP BY p.query_id, p.a
    ),
    pick{k} AS (
      SELECT query_id, vec_id, {k} AS mmr_rank, score FROM (
        SELECT c.query_id, c.vec_id,
               floor(({_LAM} * c.rel - {_LAM1} * ms.maxsim) * 10000
                     + 0.5001) / 10000 AS score,
               row_number() OVER (
                 PARTITION BY c.query_id
                 ORDER BY floor(({_LAM} * c.rel - {_LAM1} * ms.maxsim)
                                * 10000 + 0.5001) / 10000 DESC, c.vec_id
               ) AS rn
        FROM rel c
        JOIN ms{k} ms
          ON c.query_id = ms.query_id AND c.vec_id = ms.vec_id
        LEFT JOIN {prev} s
          ON c.query_id = s.query_id AND c.vec_id = s.vec_id
        WHERE s.vec_id IS NULL
      ) WHERE rn = 1
    ),
    sel{k} AS (SELECT query_id, vec_id, mmr_rank, score FROM {prev}
               UNION ALL
               SELECT query_id, vec_id, mmr_rank, score FROM pick{k})""")
        prev = f"sel{k}"
    unrolled = ",".join(steps)
    return f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS nrm
      FROM embeddings
    ),
    q AS (
      SELECT vec_id AS query_id, v AS qv, nrm AS qn
      FROM base WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT {S.QUERY_CAP}
    ),
    rel AS (
      SELECT query_id, vec_id, rel FROM (
        SELECT query_id, vec_id,
               floor((list_dot_product(qv, v) / nullif(qn * nrm, 0.0))
                     * 10000 + 0.5001) / 10000 AS rel,
               row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY floor((list_dot_product(qv, v)
                                 / nullif(qn * nrm, 0.0)) * 10000 + 0.5001)
                            / 10000 DESC, vec_id) AS rn
        FROM q CROSS JOIN base WHERE query_id != vec_id
      ) WHERE rn <= {_N_CAND}
    ),
    cv AS (
      SELECT r.query_id, r.vec_id, r.rel, b.v, b.nrm
      FROM rel r JOIN base b ON r.vec_id = b.vec_id
    ),
    pairsim AS (
      SELECT a.query_id, a.vec_id AS a, b.vec_id AS b,
             floor((list_dot_product(a.v, b.v) / nullif(a.nrm * b.nrm, 0.0))
                   * 10000 + 0.5001) / 10000 AS sim
      FROM cv a JOIN cv b
        ON a.query_id = b.query_id AND a.vec_id != b.vec_id
    ),
    sel1 AS (
      SELECT query_id, vec_id, 1 AS mmr_rank, rel AS score FROM (
        SELECT query_id, vec_id, rel,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY rel DESC, vec_id) AS rn
        FROM rel
      ) WHERE rn = 1
    ),{unrolled}
    SELECT query_id, CAST(mmr_rank AS BIGINT) AS mmr_rank, vec_id,
           CAST(floor(score * 10000 + 0.5001) AS BIGINT) AS score_e4
    FROM {prev}
    ORDER BY query_id, mmr_rank
    """


@register(
    "emb_mmr_diversified_topk",
    _mmr_oracle(),
    "llm",
    "similarity",
)
def emb_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified top-5 retrieval per query vector — see module
    docstring.  Step 1 is the pure-relevance argmax; steps 2–5 each
    re-score the remaining candidates by λ·rel − (1−λ)·max-sim-to-
    selected and pick the per-query argmax."""
    emb = table(spark, sf_dir, "embeddings")
    # rel and pairsim are consumed by EVERY greedy round below, and
    # the growing `selected` is consumed three times per round (the
    # max-sim join, the anti-join, the union) — unpinned, each round's
    # plan embeds three copies of the previous round's, so plan size
    # and recompute grow ~3^K (measured: 160 sort-merge joins in the
    # K=5 physical plan).  The lazy pins below make each round's plan
    # O(1) over materialized inputs, the same lineage-cut rationale as
    # operators/dedup.connected_components.  Values are unchanged —
    # pins don't reorder any float arithmetic.
    rel = S.cosine_topk(
        spread(emb), F.col("vec_id") % 50 == 0, k=_N_CAND
    ).select(
        "query_id",
        "vec_id",
        # back to the gridded double (m / 10^4) — identical to the
        # oracle's floor(..)/10000, so the MMR affine combination
        # operates on bit-equal inputs in both engines
        (F.col("cosine_e4") / F.lit(10000.0)).alias("rel"),
    ).localCheckpoint(eager=False)
    base = spread(emb).select(
        "vec_id",
        S.as_double(F.col("embedding")).alias("v"),
        S.norm(S.as_double(F.col("embedding"))).alias("nrm"),
    )
    cv = rel.join(base, "vec_id").select(
        "query_id", "vec_id", "rel", "v", "nrm"
    )
    a = cv.select(
        "query_id",
        F.col("vec_id").alias("a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = cv.select(
        "query_id",
        F.col("vec_id").alias("b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    pairsim = (
        a.join(b, "query_id")
        .filter(F.col("a") != F.col("b"))
        .select(
            "query_id",
            "a",
            "b",
            fround(
                S.dot(F.col("va"), F.col("vb"))
                / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0)),
                4,
            ).alias("sim"),
        )
        .localCheckpoint(eager=False)
    )
    w1 = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.col("vec_id"))
    selected = (
        rel.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            "vec_id",
            F.lit(1).alias("mmr_rank"),
            F.col("rel").alias("score"),
        )
    )
    for k in range(2, _K + 1):
        ms = (
            pairsim.join(
                selected.select(
                    "query_id", F.col("vec_id").alias("b")
                ),
                ["query_id", "b"],
            )
            .groupBy("query_id", "a")
            .agg(F.max("sim").alias("maxsim"))
            .withColumnRenamed("a", "vec_id")
        )
        remaining = rel.join(
            selected.select("query_id", "vec_id"),
            ["query_id", "vec_id"],
            "left_anti",
        )
        score = fround(
            _LAM * F.col("rel") - _LAM1 * F.col("maxsim"), 4
        )
        wk = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.col("vec_id")
        )
        pick = (
            remaining.join(ms, ["query_id", "vec_id"])
            .select("query_id", "vec_id", "rel", score.alias("score"))
            .withColumn("rn", F.row_number().over(wk))
            .filter(F.col("rn") == 1)
            .select(
                "query_id",
                "vec_id",
                F.lit(k).alias("mmr_rank"),
                "score",
            )
        )
        selected = selected.unionByName(pick).localCheckpoint(eager=False)
    return selected.select(
        "query_id",
        F.col("mmr_rank").cast("long").alias("mmr_rank"),
        "vec_id",
        igrid(F.col("score"), 4).alias("score_e4"),
    ).orderBy("query_id", "mmr_rank")
