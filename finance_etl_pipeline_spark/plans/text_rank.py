"""Text-ranking operators over the ``documents`` table: TF-IDF top
terms per document and BM25 retrieval for a fixed query term set.

Beyond-reference additions (the reference at /root/reference has no
text processing at all — SURVEY.md §2.8 "Absent" list); these are the
ranking half of the LLM-pipeline text-analysis family (tx_token_stats /
tx_language_id / tx_quality_score / tx_fingerprint cover the scoring
half in plans/llm.py).

Cross-engine determinism notes:

- Tokenization is ``split(lower(text), '\\s+')`` in Spark and
  ``string_split_regex(lower(text), '\\s+')`` in DuckDB, with empty
  tokens filtered in both.
- ``ln`` may differ by 1 ulp between Java's ``Math.log`` and DuckDB's
  libm, so every score is pushed through the shared ``fround``
  contract before it is ranked or emitted; ranking ties are broken on
  the term / doc id, making row_number deterministic in both engines.
- tf, df, dl are exact integers; avgdl is an exact integer sum over
  an IEEE division — bit-identical cross-engine.  Both sides build the
  identical expression *tree* (same parenthesization), so the only
  noise source is ``ln``.

At 100 TB: everything is exploded-token group-bys (map-side combined).
TF-IDF computes df as a window over the tf table (co-partitioned by
term — no vocabulary table ever broadcasts; vocabulary grows with the
corpus under Heaps' law, so a vocab broadcast is unbounded).  BM25
restricts df to the broadcast query-term list before any join — no
shuffle carries raw text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.scalars import fround, igrid
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import spread, table

BM25_TERMS = ("vector", "spark", "merge")
K1 = 1.2
B = 0.75


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, tok) exploded token table, empty tokens dropped."""
    docs = spread(table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")


@register(
    "tx_tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id, tok
      FROM (SELECT doc_id,
                   unnest(string_split_regex(lower(text), '\\s+')) AS tok
            FROM documents)
      WHERE tok <> ''
    ),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok AS term, tf.tf, df.df,
             CAST(floor((tf.tf * ln(n.n_docs / df.df)) * 1000000 + 0.5001) AS BIGINT)
               AS tfidf_e6
      FROM tf JOIN df ON df.tok = tf.tok CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, tfidf_e6,
           CAST(row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf_e6 DESC, term) AS BIGINT) AS rk
    FROM scored
    QUALIFY rk <= 3
    ORDER BY doc_id, rk
    """,
    "llm",
    "text",
)
def tx_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document.  df never materializes as a
    separate joined table: tf has exactly one row per (doc, term), so
    ``count(*) OVER (PARTITION BY tok)`` on tf IS the document
    frequency — one shuffle on ``tok``, no join, no broadcast.  The
    vocabulary grows with the corpus (Heaps' law), so the previous
    full-vocab broadcast was unbounded at web scale (round-2 verdict
    item 3); the window form keeps the df computation co-partitioned
    with the rows that consume it.  Ranking happens on the *rounded*
    score so the 1-ulp ``ln`` difference between engines can never
    flip an order."""
    toks = _tokens(spark, sf_dir)
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    n = table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w_tok = Window.partitionBy("tok")
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(w_tok))
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.col("tok").alias("term"),
            "tf",
            "df",
            igrid(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf_e6"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf_e6"), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .orderBy("doc_id", "rk")
    )


@register(
    "tx_bm25_search",
    f"""
    WITH toks AS (
      SELECT doc_id, tok
      FROM (SELECT doc_id,
                   unnest(string_split_regex(lower(text), '\\s+')) AS tok
            FROM documents)
      WHERE tok <> ''
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
    stats AS (SELECT sum(dl) / count(*) AS avgdl, count(*) AS n_docs FROM dl),
    qterms AS (SELECT unnest(['vector', 'spark', 'merge']) AS tok),
    tf AS (
      SELECT t.doc_id, t.tok, count(*) AS tf
      FROM toks t SEMI JOIN qterms q ON q.tok = t.tok
      GROUP BY 1, 2
    ),
    df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
    contrib AS (
      SELECT tf.doc_id,
             ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
               * ((tf.tf * {K1 + 1}) / (tf.tf + {K1} * ({1 - B} + {B} * (dl.dl / s.avgdl))))
               AS c
      FROM tf
      JOIN df ON df.tok = tf.tok
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s
    ),
    scored AS (
      SELECT doc_id,
             CAST(floor(sum(c) * 10000 + 0.5001) AS BIGINT) AS bm25_e4
      FROM contrib GROUP BY doc_id
    )
    SELECT doc_id, bm25_e4,
           CAST(row_number() OVER (ORDER BY bm25_e4 DESC, doc_id) AS BIGINT) AS rk
    FROM scored
    QUALIFY rk <= 20
    ORDER BY rk
    """,
    "llm",
    "text",
)
def tx_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 documents for the fixed query (vector, spark,
    merge) with k1=1.2, b=0.75.  The token table is semi-joined against
    the broadcast query-term list FIRST, so tf/df/contrib only ever
    hold query-term rows — at 100 TB the per-doc state is |query|
    terms, not |vocabulary|.  Scores are rounded before the global
    top-20 rank (tiny: |matching docs| rows through one window)."""
    toks = _tokens(spark, sf_dir)
    qterms = spark.createDataFrame(
        [(t,) for t in BM25_TERMS], ["tok"]
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    tf = (
        toks.join(F.broadcast(qterms), "tok", "left_semi")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count_distinct("doc_id").alias("df"))
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * F.lit(K1 + 1)) / (
        F.col("tf")
        + F.lit(K1) * (F.lit(1 - B) + F.lit(B) * (F.col("dl") / F.col("avgdl")))
    )
    contrib = (
        tf.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", (idf * tf_part).alias("c"))
    )
    scored = contrib.groupBy("doc_id").agg(
        igrid(F.sum("c"), 4).alias("bm25_e4")
    )
    w = Window.partitionBy().orderBy(F.desc("bm25_e4"), "doc_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 20)
        .orderBy("rk")
    )


RRF_K = 60
HYBRID_CAND = 50
HYBRID_TOP = 20


@register(
    "tx_hybrid_search_rrf",
    f"""
    WITH toks AS (
      SELECT doc_id, tok
      FROM (SELECT doc_id,
                   unnest(string_split_regex(lower(text), '\\s+')) AS tok
            FROM documents)
      WHERE tok <> ''
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
    stats AS (SELECT sum(dl) / count(*) AS avgdl, count(*) AS n_docs FROM dl),
    qterms AS (SELECT unnest(['vector', 'spark', 'merge']) AS tok),
    tf AS (
      SELECT t.doc_id, t.tok, count(*) AS tf
      FROM toks t SEMI JOIN qterms q ON q.tok = t.tok
      GROUP BY 1, 2
    ),
    df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
    contrib AS (
      SELECT tf.doc_id,
             ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
               * ((tf.tf * {K1 + 1}) / (tf.tf + {K1} * ({1 - B} + {B} * (dl.dl / s.avgdl))))
               AS c
      FROM tf
      JOIN df ON df.tok = tf.tok
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s
    ),
    brank AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r_text
      FROM (SELECT doc_id,
                   floor((sum(c)) * 10000 + 0.5001) / 10000 AS bm25
            FROM contrib WHERE doc_id <> 0 GROUP BY doc_id)
      QUALIFY r_text <= {HYBRID_CAND}
    ),
    base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    ),
    qv AS (SELECT v AS q, nrm AS qn FROM base WHERE vec_id = 0),
    crank AS (
      SELECT vec_id,
             row_number() OVER (ORDER BY cosine DESC, vec_id) AS r_sem
      FROM (SELECT b.vec_id,
                   floor((list_dot_product(b.v, qv.q)
                          / nullif(b.nrm * qv.qn, 0.0)) * 10000 + 0.5001) / 10000
                     AS cosine
            FROM base b CROSS JOIN qv WHERE b.vec_id <> 0)
      QUALIFY r_sem <= {HYBRID_CAND}
    ),
    fused AS (
      SELECT coalesce(b.doc_id, c.vec_id) AS doc_id,
             CAST(coalesce(b.r_text, 0) AS BIGINT) AS r_text,
             CAST(coalesce(c.r_sem, 0) AS BIGINT) AS r_sem,
             CAST(floor((coalesce(1.0 / ({RRF_K} + b.r_text), 0.0)
                    + coalesce(1.0 / ({RRF_K} + c.r_sem), 0.0)) * 100000000 + 0.5001)
               AS BIGINT) AS rrf_e8
      FROM brank b FULL OUTER JOIN crank c ON c.vec_id = b.doc_id
    )
    SELECT doc_id, r_text, r_sem, rrf_e8,
           CAST(row_number() OVER (ORDER BY rrf_e8 DESC, doc_id) AS BIGINT) AS rk
    FROM fused
    QUALIFY rk <= {HYBRID_TOP}
    ORDER BY rk
    """,
    "llm",
    "text",
    "similarity",
)
def tx_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 keyword candidates + embedding-cosine
    candidates (query = vec 0's embedding, the testdata's stand-in for
    an encoded query) fused by reciprocal-rank fusion
    rrf = Σ 1/(60 + rank).  RRF operates on RANKS, not raw scores, so
    the fusion needs no score normalization and stays bit-deterministic
    (ranks come from rounded scores with id tiebreaks; 1/(60+r) is one
    IEEE divide).  At scale both arms are already bounded: BM25 via the
    broadcast query-term semi-join, cosine via any ANN path
    (ann_lsh_buckets / ann_ivf_topk / ann_int8_topk are drop-ins for
    the brute-force arm used here at test SF)."""
    from finance_etl_pipeline_spark.operators.similarity import (
        as_double,
        dot,
        norm,
    )

    # --- BM25 arm (same expressions as tx_bm25_search) ---------------
    toks = _tokens(spark, sf_dir)
    qterms = spark.createDataFrame([(t,) for t in BM25_TERMS], ["tok"])
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    tf = (
        toks.join(F.broadcast(qterms), "tok", "left_semi")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count_distinct("doc_id").alias("df"))
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * F.lit(K1 + 1)) / (
        F.col("tf")
        + F.lit(K1) * (F.lit(1 - B) + F.lit(B) * (F.col("dl") / F.col("avgdl")))
    )
    contrib = (
        tf.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", (idf * tf_part).alias("c"))
    )
    bm25 = (
        contrib.filter(F.col("doc_id") != 0)
        .groupBy("doc_id")
        .agg(fround(F.sum("c"), 4).alias("bm25"))
    )
    w_text = Window.partitionBy().orderBy(F.desc("bm25"), "doc_id")
    brank = (
        bm25.withColumn("r_text", F.row_number().over(w_text))
        .filter(F.col("r_text") <= HYBRID_CAND)
        .select("doc_id", "r_text")
    )

    # --- semantic arm (cosine vs vec 0) ------------------------------
    emb = spread(table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        as_double(F.col("embedding")).alias("v"),
        norm(as_double(F.col("embedding"))).alias("nrm"),
    )
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("v").alias("q"), F.col("nrm").alias("qn")
    )
    cos = fround(
        dot(F.col("v"), F.col("q"))
        / F.nullif(F.col("nrm") * F.col("qn"), F.lit(0.0)),
        4,
    )
    w_sem = Window.partitionBy().orderBy(F.desc("cosine"), "vec_id")
    crank = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", cos.alias("cosine"))
        .withColumn("r_sem", F.row_number().over(w_sem))
        .filter(F.col("r_sem") <= HYBRID_CAND)
        .select("vec_id", "r_sem")
    )

    # --- reciprocal-rank fusion --------------------------------------
    # ranks absent from an arm are emitted as 0 (not NULL): a nullable
    # int column becomes float64 in pandas, which is not hash-stable
    # against the oracle's BIGINT; the rrf term still treats absence
    # as contribution 0 via the pre-coalesce null.
    fused = brank.join(
        crank, brank.doc_id == crank.vec_id, "full_outer"
    ).select(
        F.coalesce(brank.doc_id, crank.vec_id).alias("doc_id"),
        F.coalesce(F.col("r_text"), F.lit(0)).cast("long").alias("r_text"),
        F.coalesce(F.col("r_sem"), F.lit(0)).cast("long").alias("r_sem"),
        igrid(
            F.coalesce(1.0 / (F.lit(RRF_K) + F.col("r_text")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("r_sem")), F.lit(0.0)),
            8,
        ).alias("rrf_e8"),
    )
    w_rk = Window.partitionBy().orderBy(F.desc("rrf_e8"), "doc_id")
    return (
        fused.withColumn("rk", F.row_number().over(w_rk).cast("long"))
        .filter(F.col("rk") <= HYBRID_TOP)
        .orderBy("rk")
    )
