"""Data-selection and eval operators for training-corpus curation:
DSIR-style importance weighting, hashed linear quality-classifier
inference, retrieval-quality (MRR@10) eval, and crawl-boilerplate
prefix dedup.

These extend the LLM-pipeline battery (plans/llm.py, plans/curation.py)
with the *selection* stage of a pre-training pipeline: after dedup and
quality gating, which surviving documents do we actually train on, and
how good is the retrieval index we built over them?  No reference-repo
counterpart (the reference has no text surface); the method shapes are
from the public literature — DSIR (Xie et al. 2023, hashed n-gram
importance resampling) and fastText-style linear text classifiers
(Joulin et al. 2016, hashed bag-of-words + linear layer).

Determinism contract: every feature is a content hash (the shared
md5→60-bit scheme of operators/dedup.py) reduced to a bounded bucket
space, classifier weights are integer-arithmetic-derived constants, and
every float metric is emitted on the igrid integer grid — so each
query is exactly reproducible in the DuckDB oracle.

Scale posture (100 TB): all four queries reduce to bounded-cardinality
aggregates.  The DSIR feature table is ≤ B=8192 rows (broadcast), the
classifier weight space is 64 buckets folded into a scalar expression,
MRR evaluates a fixed query sample (broadcast) against the corpus, and
prefix dedup shuffles one 8-byte hash per document.  Nothing is
proportional to n² and no shuffle carries more than |tokens| narrow
rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from finance_etl_pipeline_spark.functions.scalars import (
    igrid,
    sql_hash60,
    sql_igrid,
)
from finance_etl_pipeline_spark.operators import similarity as S
from finance_etl_pipeline_spark.operators.dedup import hash60_expr, tokens_expr
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import spread, table

_SQL_H60 = sql_hash60("{x}")

# DSIR hashed-feature space: buckets for the unigram importance model.
_DSIR_B = 8192
_DSIR_TARGET_LANG = "en"

# Linear classifier: 64 hashed buckets; weight(b) derives from integer
# arithmetic (Knuth multiplicative constant) so both engines compute
# the identical double: ((b * 2654435761) % 1001 - 500) / 1000.0.
_CLF_B = 64
_CLF_MULT = 2654435761
_CLF_BIAS = 0.05

_SQL_TOK = (
    r"SELECT doc_id, lang, source, "
    r"unnest(string_split_regex(lower(text), '\s+')) AS tok FROM documents"
)


@register(
    "s_dsir_importance",
    f"""
    WITH tokd AS ({_SQL_TOK}),
    feats AS (
      SELECT doc_id, lang, source,
             {_SQL_H60.format(x='tok')} % {_DSIR_B} AS b
      FROM tokd WHERE tok <> ''
    ),
    bcnt AS (
      SELECT b, count(*) AS cr,
             sum(CASE WHEN lang = '{_DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)
               AS ct
      FROM feats GROUP BY b
    ),
    ratio AS (
      SELECT b,
             ln((ct + 1.0) / (sum(ct) OVER () + {_DSIR_B}.0))
           - ln((cr + 1.0) / (sum(cr) OVER () + {_DSIR_B}.0)) AS lw
      FROM bcnt
    ),
    docb AS (
      SELECT doc_id, source, b, count(*) AS cnt
      FROM feats GROUP BY doc_id, source, b
    ),
    docw AS (
      SELECT d.doc_id, d.source, sum(d.cnt * lw) / sum(d.cnt) AS w
      FROM docb d JOIN ratio USING (b)
      GROUP BY d.doc_id, d.source
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN w > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_target_like,
           {sql_igrid('avg(w)', 6)} AS avg_logweight_e6
    FROM docw GROUP BY source ORDER BY source
    """,
    "llm",
    "sampling",
    "selection",
)
def s_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weighting (Xie et al. 2023): estimate
    target (lang='en') vs raw hashed-unigram distributions with
    add-one smoothing over 8192 buckets, score each document by its
    mean log importance ratio, and report per-source how many
    documents look target-like (w > 0) plus the mean log-weight.

    This is the data-*selection* primitive: resampling the raw corpus
    with probability ∝ exp(w) recovers the target distribution; the
    hash-ranked keep-set of ``s_mixture_resample`` composes with these
    weights directly.

    Scale: two passes over the token stream — a stats pass whose
    map-side combine collapses to ≤ 8192 bucket groups before the
    exchange, and a scoring pass shuffling per-(doc, bucket) counts;
    the ratio table (≤ 8192 rows) is broadcast.  Emitted on the igrid
    micro-unit grid, so the output schema is all-integer."""
    docs = spread(table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", "lang", "source",
        F.explode(tokens_expr()).alias("tok"),
    ).filter(F.col("tok") != "")
    feats = toks.select(
        "doc_id", "lang", "source",
        (hash60_expr(F.col("tok")) % _DSIR_B).alias("b"),
    )
    # Scan 1 (stats): ONE groupBy(b) computes raw and target counts
    # together (map-side combine collapses the token stream to ≤ B
    # groups per partition); the totals derive from the 8192-row
    # bucket table, not another corpus scan.  Scan 2 (scoring):
    # per-(doc, bucket) counts joined against the broadcast ratio
    # table.  Two passes over the token stream total — the naive
    # per-aggregate formulation took four.
    bcnt = feats.groupBy("b").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(
            F.when(F.col("lang") == _DSIR_TARGET_LANG, 1).otherwise(0)
        ).alias("ct"),
    )
    # totals via a global window over the 8192-row bucket table — a
    # separate scalar-aggregate branch would re-scan the corpus.
    wall = Window.partitionBy()
    ratio = bcnt.select(
        "b",
        (
            F.log(
                (F.col("ct") + 1.0)
                / (F.sum("ct").over(wall) + float(_DSIR_B))
            )
            - F.log(
                (F.col("cr") + 1.0)
                / (F.sum("cr").over(wall) + float(_DSIR_B))
            )
        ).alias("lw"),
    )
    docb = feats.groupBy("doc_id", "source", "b").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    docw = (
        docb.join(F.broadcast(ratio), "b")
        .groupBy("doc_id", "source")
        .agg((F.sum(F.col("cnt") * F.col("lw")) / F.sum("cnt")).alias("w"))
    )
    return (
        docw.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("w") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_target_like"),
            igrid(F.avg("w"), 6).alias("avg_logweight_e6"),
        )
        .orderBy("source")
    )


# Shared classifier-inference SQL: per-doc linear score over hashed
# buckets (used by tx_linear_classifier and tx_classifier_calibration).
_SQL_SCORED = f"""
    tokd AS ({_SQL_TOK}),
    feats AS (
      SELECT doc_id, lang, source,
             {_SQL_H60.format(x='tok')} % {_CLF_B} AS b
      FROM tokd WHERE tok <> ''
    ),
    scored AS (
      SELECT doc_id, lang, source,
             avg(((b * {_CLF_MULT}) % 1001 - 500) / 1000.0) + {_CLF_BIAS}
               AS score
      FROM feats GROUP BY doc_id, lang, source
    )
"""


def _clf_scored(docs: DataFrame) -> DataFrame:
    """Per-doc linear classifier score — the Spark twin of
    ``_SQL_SCORED`` (hashed buckets → mean weight → + bias)."""
    toks = docs.select(
        "doc_id", "lang", "source", F.explode(tokens_expr()).alias("tok")
    ).filter(F.col("tok") != "")
    b = hash60_expr(F.col("tok")) % _CLF_B
    w = ((b * _CLF_MULT) % 1001 - 500) / F.lit(1000.0)
    return (
        toks.select("doc_id", "lang", "source", w.alias("w"))
        .groupBy("doc_id", "lang", "source")
        .agg((F.avg("w") + _CLF_BIAS).alias("score"))
    )


@register(
    "tx_linear_classifier",
    f"""
    WITH {_SQL_SCORED}
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_positive,
           {sql_igrid('avg(1.0 / (1.0 + exp(-score)))', 6)} AS avg_prob_e6
    FROM scored GROUP BY source ORDER BY source
    """,
    "llm",
    "text",
    "selection",
)
def tx_linear_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style linear quality-classifier inference (Joulin et
    al. 2016): hash tokens into 64 buckets, average a fixed per-bucket
    weight vector, add a bias, squash with a sigmoid — the exact
    inference shape of the quality classifiers used to filter web
    crawls (weights here are deterministic integer-derived constants
    standing in for trained parameters; swapping in real weights is a
    literal-table change).

    Per source: document count, positive predictions (score > 0 ⇔
    sigmoid ≥ 0.5), and the mean predicted probability on the
    micro-unit grid.

    Scale: inference is one narrow map over tokens + a per-doc mean —
    no weight table to broadcast at all (the weight is a scalar
    expression of the bucket id), so the classifier runs at scan
    speed on any corpus size."""
    scored = _clf_scored(spread(table(spark, sf_dir, "documents")))
    prob = 1.0 / (1.0 + F.exp(-F.col("score")))
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("score") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_positive"),
            igrid(F.avg(prob), 6).alias("avg_prob_e6"),
        )
        .orderBy("source")
    )


@register(
    "emb_retrieval_mrr",
    f"""
    WITH base AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS nrm
      FROM embeddings
    ),
    q AS (
      SELECT vec_id AS query_id, label AS qlabel, v AS qv, nrm AS qn
      FROM base WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT {S.QUERY_CAP}
    ),
    pairs AS (
      SELECT query_id, qlabel, vec_id, label,
             floor((list_dot_product(qv, v) / nullif(qn * nrm, 0.0))
                   * 10000 + 0.5001) / 10000 AS cosine
      FROM q CROSS JOIN base WHERE query_id != vec_id
    ),
    ranked AS (
      SELECT query_id, qlabel, label,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, vec_id) AS rank
      FROM pairs QUALIFY rank <= 10
    ),
    perq AS (
      SELECT query_id, qlabel,
             min(CASE WHEN label = qlabel THEN rank END) AS first_rel
      FROM ranked GROUP BY query_id, qlabel
    )
    SELECT CAST(qlabel AS BIGINT) AS query_label,
           CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(CASE WHEN first_rel IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit_at10,
           {sql_igrid(
               'avg(CASE WHEN first_rel IS NOT NULL '
               'THEN 1.0 / first_rel ELSE 0.0 END)', 6)} AS mrr_e6
    FROM perq GROUP BY qlabel ORDER BY query_label
    """,
    "llm",
    "similarity",
    "eval",
)
def emb_retrieval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality eval: MRR@10 and hit@10 of exact cosine
    retrieval, using the stored label as the relevance oracle (a
    retrieved neighbor is relevant iff it shares the query's label) —
    the standard eval loop run over an embedding index before
    committing to it for RAG or semantic dedup.

    Builds on the same quantize-before-rank contract as
    ``ann_cosine_topk`` (cosine frounded at 4 dp, ties by vec_id) so
    the rank — and therefore MRR — is deterministic cross-engine.

    Scale: the query sample (vec_id % 50 = 0) and its top-10 result
    set are tiny and broadcast; the corpus is scanned once by the
    brute-force baseline (swap in ``ann_ivf_topk``/``ann_pq_adc_topk``
    candidates for the 100 TB path — the eval join is unchanged)."""
    emb = table(spark, sf_dir, "embeddings")
    labels = spread(emb).select(
        "vec_id", F.col("label").cast("long").alias("label")
    )
    top = S.cosine_topk(emb, F.col("vec_id") % 50 == 0, k=10)
    # the SAME capped query set cosine_topk used — qlab must never be
    # the corpus-wide label table (that broadcast grows with SF)
    qlab = S.query_set(labels, F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
    )
    # top is |queries|×10 rows — broadcast it onto the label table,
    # never the other way round (labels are corpus-proportional).
    j = labels.join(
        F.broadcast(top.join(F.broadcast(qlab), "query_id")), "vec_id"
    )
    perq = j.groupBy("query_id", "qlabel").agg(
        F.min(
            F.when(F.col("label") == F.col("qlabel"), F.col("rank"))
        ).alias("first_rel")
    )
    rr = F.when(
        F.col("first_rel").isNotNull(), 1.0 / F.col("first_rel")
    ).otherwise(0.0)
    return (
        perq.groupBy(F.col("qlabel").alias("query_label"))
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.sum(F.when(F.col("first_rel").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_hit_at10"),
            igrid(F.avg(rr), 6).alias("mrr_e6"),
        )
        .orderBy("query_label")
    )


@register(
    "dd_prefix_dup",
    f"""
    WITH tokd AS (
      SELECT doc_id, source,
             string_split_regex(lower(text), '\\s+') AS t
      FROM documents
    ),
    pref AS (
      SELECT doc_id, source,
             {_SQL_H60.format(x="array_to_string(t[1:10], ' ')")} AS h
      FROM tokd
    ),
    grp AS (SELECT h FROM pref GROUP BY h HAVING count(*) >= 2)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN g.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_prefix,
           {sql_igrid(
               'CAST(sum(CASE WHEN g.h IS NOT NULL THEN 1 ELSE 0 END) '
               'AS DOUBLE) / count(*)', 6)} AS shared_ppm
    FROM pref LEFT JOIN grp g USING (h)
    GROUP BY source ORDER BY source
    """,
    "llm",
    "dedup",
)
def dd_prefix_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading-prefix duplicate detector: hash each document's first
    10 tokens and count documents sharing a prefix — the cheap screen
    for crawl boilerplate (navigation headers, license banners,
    templated intros) that full-document near-dup misses because the
    body diverges after the shared head.

    Complements ``dd_chunk_dup_rate`` (repeated chunks anywhere) with
    position-anchored semantics at a fraction of the cost: ONE 8-byte
    hash per document total, versus one per chunk.

    Scale: narrow map to (doc, hash60) then a count per hash — the
    shuffle is |docs| rows of 8 bytes; group sizes are dup-group
    sizes, never n."""
    docs = spread(table(spark, sf_dir, "documents"))
    prefix = F.concat_ws(" ", F.slice(tokens_expr(), 1, 10))
    pref = docs.select(
        "doc_id", "source", hash60_expr(prefix).alias("h")
    )
    grp = (
        pref.groupBy("h")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    flagged = pref.join(grp.withColumn("dup", F.lit(1)), "h", "left")
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce(F.col("dup"), F.lit(0)))
            .cast("long")
            .alias("n_shared_prefix"),
            igrid(
                F.sum(F.coalesce(F.col("dup"), F.lit(0))).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("shared_ppm"),
        )
        .orderBy("source")
    )


@register(
    "tx_classifier_calibration",
    f"""
    WITH {_SQL_SCORED},
    probs AS (
      SELECT doc_id,
             1.0 / (1.0 + exp(-score)) AS prob,
             CASE WHEN lang = '{_DSIR_TARGET_LANG}' THEN 1 ELSE 0 END
               AS is_pos
      FROM scored
    ),
    binned AS (
      SELECT least(CAST(floor(prob * 10) AS BIGINT), 9) AS bin, prob, is_pos
      FROM probs
    )
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           {sql_igrid('avg(prob)', 6)} AS mean_prob_e6,
           {sql_igrid('avg(CAST(is_pos AS DOUBLE))', 6)} AS pos_rate_e6
    FROM binned GROUP BY bin ORDER BY bin
    """,
    "llm",
    "text",
    "eval",
)
def tx_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier reliability diagram: bucket the linear classifier's
    predicted probability into deciles and compare each bin's mean
    prediction with its observed positive rate (ground truth: the
    declared lang equals the target language) — the calibration audit
    run before using classifier scores as sampling weights, where a
    miscalibrated model silently skews the corpus mixture.

    Scale: reuses the scan-speed scoring pass of
    ``tx_linear_classifier``; the diagram itself is a 10-row
    aggregate.  All outputs on the integer micro-unit grid."""
    scored = _clf_scored(spread(table(spark, sf_dir, "documents")))
    prob = 1.0 / (1.0 + F.exp(-F.col("score")))
    probs = scored.select(
        prob.alias("prob"),
        F.when(F.col("lang") == _DSIR_TARGET_LANG, 1)
        .otherwise(0)
        .alias("is_pos"),
    )
    binned = probs.select(
        F.least(F.floor(F.col("prob") * 10).cast("long"), F.lit(9).cast("long"))
        .alias("bin"),
        "prob",
        "is_pos",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            igrid(F.avg("prob"), 6).alias("mean_prob_e6"),
            igrid(F.avg(F.col("is_pos").cast("double")), 6).alias(
                "pos_rate_e6"
            ),
        )
        .orderBy("bin")
    )


@register(
    "tx_classifier_auc",
    f"""
    WITH {_SQL_SCORED},
    g AS (
      SELECT doc_id,
             CAST(floor(score * 1000000000 + 0.5001) AS BIGINT) AS s,
             CASE WHEN lang = '{_DSIR_TARGET_LANG}' THEN 1 ELSE 0 END
               AS is_pos
      FROM scored
    ),
    r AS (
      SELECT is_pos, row_number() OVER (ORDER BY s, doc_id) AS rk FROM g
    ),
    agg AS (
      SELECT CAST(sum(CASE WHEN is_pos = 1 THEN rk ELSE 0 END) AS BIGINT)
               AS rsum,
             CAST(sum(is_pos) AS BIGINT) AS p,
             CAST(sum(1 - is_pos) AS BIGINT) AS n
      FROM r
    )
    SELECT p AS n_pos, n AS n_neg,
           {sql_igrid('(rsum - p * (p + 1) / 2.0) / (CAST(p AS DOUBLE) * n)', 6)}
             AS auc_e6
    FROM agg
    """,
    "llm",
    "text",
    "eval",
)
def tx_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of the linear quality classifier via the Mann–Whitney
    rank-sum identity AUC = (Σ rank⁺ − P(P+1)/2) / (P·N) — the
    threshold-free companion to ``tx_classifier_calibration``'s
    reliability diagram (ground truth: declared lang equals the DSIR
    target).  Scores are gridded to e9 BEFORE ranking and ties break
    on doc_id, so the rank assignment — and therefore the AUC — is a
    pure function of exact integers in both engines.

    Scale: scoring is the scan-speed classifier pass; the global rank
    is a single-partition window over |docs| (score, id) pairs — at
    extreme scale it swaps for the standard two-pass histogram AUC
    (bin scores, cumulative negatives per bin), same downstream
    algebra."""
    scored = _clf_scored(spread(table(spark, sf_dir, "documents")))
    from pyspark.sql.window import Window

    g = scored.select(
        "doc_id",
        igrid(F.col("score"), 9).alias("s"),
        F.when(F.col("lang") == _DSIR_TARGET_LANG, 1).otherwise(0).alias(
            "is_pos"
        ),
    )
    r = g.select(
        "is_pos",
        F.row_number().over(Window.orderBy("s", "doc_id")).alias("rk"),
    )
    agg = r.agg(
        F.sum(F.when(F.col("is_pos") == 1, F.col("rk")).otherwise(0))
        .cast("long")
        .alias("rsum"),
        F.sum("is_pos").cast("long").alias("p"),
        F.sum(1 - F.col("is_pos")).cast("long").alias("n"),
    )
    return agg.select(
        F.col("p").alias("n_pos"),
        F.col("n").alias("n_neg"),
        igrid(
            (F.col("rsum") - F.col("p") * (F.col("p") + 1) / 2.0)
            / (F.col("p").cast("double") * F.col("n")),
            6,
        ).alias("auc_e6"),
    )


# nDCG@10 discount table in micro-units: round(1/log2(r+1) * 1e6) for
# rank r = 1..10, and its prefix sums (the ideal-DCG lookup).  Fixed
# integer literals shared verbatim with the oracle SQL, so the metric
# is pure BIGINT arithmetic until the single final ratio — no libm
# log() call whose last ulp could differ between the JVM and DuckDB.
_NDCG_DISC = (
    1000000, 630930, 500000, 430677, 386853,
    356207, 333333, 315465, 301030, 289065,
)
_NDCG_PREF = (
    1000000, 1630930, 2130930, 2561607, 2948460,
    3304667, 3638000, 3953465, 4254495, 4543560,
)
_SQL_DISC_CASE = "CASE rank " + " ".join(
    f"WHEN {r + 1} THEN {v}" for r, v in enumerate(_NDCG_DISC)
) + " ELSE 0 END"
_SQL_PREF_LIST = "[" + ", ".join(str(v) for v in _NDCG_PREF) + "]"


@register(
    "emb_retrieval_ndcg",
    f"""
    WITH base AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS nrm
      FROM embeddings
    ),
    q AS (
      SELECT vec_id AS query_id, label AS qlabel, v AS qv, nrm AS qn
      FROM base WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT {S.QUERY_CAP}
    ),
    pairs AS (
      SELECT query_id, qlabel, vec_id, label,
             floor((list_dot_product(qv, v) / nullif(qn * nrm, 0.0))
                   * 10000 + 0.5001) / 10000 AS cosine
      FROM q CROSS JOIN base WHERE query_id != vec_id
    ),
    ranked AS (
      SELECT query_id, qlabel, label,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, vec_id) AS rank
      FROM pairs QUALIFY rank <= 10
    ),
    lbl AS (SELECT label, count(*) AS n_label FROM base GROUP BY label),
    perq AS (
      SELECT query_id, qlabel,
             CAST(sum(CASE WHEN label = qlabel
                           THEN {_SQL_DISC_CASE} ELSE 0 END) AS BIGINT)
               AS dcg_e6,
             CAST(sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rel_at10
      FROM ranked GROUP BY query_id, qlabel
    ),
    scored AS (
      SELECT p.query_id, p.qlabel, p.n_rel_at10, p.dcg_e6,
             CASE WHEN l.n_label - 1 <= 0 THEN NULL
                  ELSE ({_SQL_PREF_LIST})[
                         CAST(least(l.n_label - 1, 10) AS INT)]
             END AS idcg_e6
      FROM perq p JOIN lbl l ON p.qlabel = l.label
    )
    SELECT query_id,
           CAST(qlabel AS BIGINT) AS query_label,
           n_rel_at10, dcg_e6,
           CAST(idcg_e6 AS BIGINT) AS idcg_e6,
           {sql_igrid('dcg_e6 * 1.0 / nullif(idcg_e6, 0)', 6)} AS ndcg_e6
    FROM scored ORDER BY query_id
    """,
    "llm",
    "similarity",
    "eval",
)
def emb_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality eval #2: per-query nDCG@10 of exact cosine
    retrieval with label-match relevance — the position-weighted
    companion to ``emb_retrieval_mrr`` (MRR only scores the FIRST
    relevant hit; nDCG credits every relevant hit, discounted by
    rank).  Ideal DCG uses the true per-label corpus frequency
    (n_label − 1 relevant candidates, capped at 10), so a query whose
    label is rare is not penalized for having fewer than 10 possible
    relevant neighbors.

    Determinism: the rank contract is ``cosine_topk``'s (cosine
    frounded at 4 dp, ties by vec_id); the log2 discounts are fixed
    micro-unit integer literals shared with the oracle, so DCG/IDCG
    are exact BIGINTs and the only float op is the final ratio.

    Scale: same posture as MRR — the query set is bounded by
    ``query_set(QUERY_CAP)``, its top-10 table (≤ CAP×10 rows) and the
    label-frequency table (|label domain| rows) broadcast; the corpus
    is scanned once by the brute-force baseline (swap IVF/PQ candidates
    in for the 100 TB path — the eval join is unchanged)."""
    emb = table(spark, sf_dir, "embeddings")
    labels = spread(emb).select(
        "vec_id", F.col("label").cast("long").alias("label")
    )
    top = S.cosine_topk(emb, F.col("vec_id") % 50 == 0, k=10)
    qlab = S.query_set(labels, F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
    )
    # |label domain| rows (an aggregate over the corpus) — broadcast.
    lbl = labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_label")
    )
    j = labels.join(
        F.broadcast(top.join(F.broadcast(qlab), "query_id")), "vec_id"
    )
    disc = F.element_at(
        F.array(*[F.lit(v) for v in _NDCG_DISC]), F.col("rank").cast("int")
    )
    perq = j.groupBy("query_id", "qlabel").agg(
        F.sum(
            F.when(F.col("label") == F.col("qlabel"), disc).otherwise(0)
        )
        .cast("long")
        .alias("dcg_e6"),
        F.sum(F.when(F.col("label") == F.col("qlabel"), 1).otherwise(0))
        .cast("long")
        .alias("n_rel_at10"),
    )
    pref = F.array(*[F.lit(v) for v in _NDCG_PREF])
    idcg = F.when(
        F.col("n_label") - 1 > 0,
        F.element_at(
            pref, F.least(F.col("n_label") - 1, F.lit(10)).cast("int")
        ),
    ).cast("long")
    return (
        perq.join(
            F.broadcast(lbl), perq["qlabel"] == lbl["label"]
        )
        .select(
            "query_id",
            F.col("qlabel").alias("query_label"),
            "n_rel_at10",
            "dcg_e6",
            idcg.alias("idcg_e6"),
            igrid(
                F.col("dcg_e6")
                / F.nullif(idcg.cast("double"), F.lit(0.0)),
                6,
            ).alias("ndcg_e6"),
        )
        .orderBy("query_id")
    )


def _logreg_oracle() -> str:
    """Unrolled GD oracle: one gradient CTE + one weight CTE per
    iteration, weights on the e6 integer grid between iterations —
    the same quantize-between-iterations scheme as the kmeans oracle."""
    from finance_etl_pipeline_spark.operators import logreg as LR
    from finance_etl_pipeline_spark.operators.text import STOPWORDS

    stop_list = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"
    d = LR.N_FEATURES
    xs = [f"x{j}" for j in range(d)]

    def margin(wcte: str | None) -> str:
        if wcte is None:
            return "0.0"
        dot = " + ".join(f"{wcte}.w{j} * {xs[j]}" for j in range(d))
        return f"({dot}) / 1000000.0"

    parts = [
        rf"""tokd AS (
      SELECT lang, text, string_split_regex(lower(text), '\s+') AS t
      FROM documents
    ),
    feats AS (
      SELECT CASE WHEN lang = '{LR.TARGET_LANG}' THEN 1.0 ELSE 0.0 END AS y,
             1.0 AS x0,
             least(CAST(len(text) AS DOUBLE) / 500.0, 1.0) AS x1,
             coalesce(CAST(len(list_filter(t, x ->
                        list_contains({stop_list}, x))) AS DOUBLE)
                      / nullif(CAST(len(t) AS DOUBLE), 0.0), 0.0) AS x2,
             coalesce(least((CAST(list_aggregate(list_transform(t,
                        x -> len(x)), 'sum') AS DOUBLE)
                      / nullif(CAST(len(t) AS DOUBLE), 0.0)) / 8.0, 1.0),
                      0.0) AS x3
      FROM tokd
    )"""
    ]
    prev = None
    for it in range(1, LR.ITERATIONS + 1):
        m = margin(prev)
        src = "feats" if prev is None else f"feats CROSS JOIN {prev}"
        grads = ", ".join(
            f"avg((1.0 / (1.0 + exp(-({m}))) - y) * {xs[j]}) AS g{j}"
            for j in range(d)
        )
        parts.append(f"g{it} AS (SELECT {grads} FROM {src})")
        w_prev = (
            "0.0" if prev is None else f"{prev}.w{{j}} / 1000000.0"
        )
        ws = ", ".join(
            "CAST(floor(("
            + w_prev.format(j=j)
            + f" - {LR.LR} * g{it}.g{j}) * 1000000 + 0.5001) AS BIGINT)"
            + f" AS w{j}"
            for j in range(d)
        )
        w_src = f"g{it}" if prev is None else f"g{it} CROSS JOIN {prev}"
        parts.append(f"w{it} AS (SELECT {ws} FROM {w_src})")
        prev = f"w{it}"
    final_m = margin(prev)
    joined = ",\n    ".join(parts)
    return f"""
    WITH {joined},
    final AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CAST(y AS BIGINT)) AS BIGINT) AS n_pos,
             CAST(sum(CASE WHEN (({final_m}) > 0.0) = (y = 1.0)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
      FROM feats CROSS JOIN {prev}
    )
    SELECT n_docs, n_pos, n_correct,
           {sql_igrid('n_correct * 1.0 / n_docs', 6)} AS train_acc_ppm,
           w0 AS w_bias_e6, w1 AS w_len_e6,
           w2 AS w_stop_e6, w3 AS w_shape_e6
    FROM final CROSS JOIN {prev}
    """


@register(
    "tx_quality_classifier_train",
    _logreg_oracle(),
    "llm",
    "ml",
    "text",
    "bench",
)
def tx_quality_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the quality classifier whose INFERENCE shape is
    ``tx_linear_classifier``: full-batch logistic-regression gradient
    descent on the quality_score features (length, stopword density,
    token shape + bias), target = the doc's language flag — the
    standard seed-labeled gate-training loop (wiki-vs-crawl) of a
    curation pipeline.  Emits the learned weights (e6 micro-units),
    corpus/label counts, and training accuracy.

    Determinism: weights are gridded to e6 integers between the
    ITERATIONS gradient passes (operators/logreg.py — the kmeans
    quantize-between-iterations pattern), so the oracle's unrolled
    CTE chain reproduces them exactly.

    Scale: each iteration is ONE map-side-combined aggregate (d
    doubles per partition move); driver state is d doubles; the
    feature projection is a narrow scan.  At 100 TB: identical plan —
    GD over 4 features is bandwidth-bound on the scan, and the
    cached feature frame amortizes tokenization across iterations."""
    from finance_etl_pipeline_spark.operators import logreg as LR

    docs = spread(table(spark, sf_dir, "documents"))
    # eager localCheckpoint, not persist/unpersist: the returned
    # DataFrame is LAZY, so a finally-scoped unpersist fired before
    # the caller ever executed the final aggregate — the timed action
    # then re-tokenized the whole corpus once more from parquet.  The
    # checkpoint materializes the 5-double feature frame exactly once;
    # train()'s ITERATIONS passes and the final accuracy aggregate all
    # read it, and the ContextCleaner reclaims the blocks when the
    # plan is collected (the package-wide iterative pattern; on a
    # cluster prefer persist(DISK_ONLY) for fault tolerance).
    feats = LR.features(docs).localCheckpoint(eager=True)
    w_e6 = LR.train(feats)
    m = LR.margin_expr(w_e6)
    agg = feats.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("y").cast("long")).cast("long").alias("n_pos"),
        F.sum(
            F.when(
                (m > 0.0) == (F.col("y") == 1.0), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_correct"),
    )
    return agg.select(
        "n_docs",
        "n_pos",
        "n_correct",
        igrid(
            F.col("n_correct") / F.col("n_docs").cast("double"), 6
        ).alias("train_acc_ppm"),
        F.lit(w_e6[0]).alias("w_bias_e6"),
        F.lit(w_e6[1]).alias("w_len_e6"),
        F.lit(w_e6[2]).alias("w_stop_e6"),
        F.lit(w_e6[3]).alias("w_shape_e6"),
    )
