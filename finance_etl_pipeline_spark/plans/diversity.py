"""Corpus-diversity profiling battery: n-gram diversity, mixture
composition entropy, and Zipf-law fit.

These are the "is this corpus healthy?" screens a pre-training data
pipeline runs after curation (plans/curation.py) and before mixing:
low n-gram diversity flags templated/boilerplate sources, mixture
entropy quantifies composition balance across langs/sources, and a
token-frequency Zipf fit far from the natural-language slope (~ -1)
flags synthetic or degenerate text.  No reference-repo counterpart
(the reference has no text surface at all) — these extend the
BASELINE.json north_star LLM-pipeline set.

Scale notes per query in the docstrings; the common theme is that
every one reduces the corpus to a tiny grain (sources × langs, a
1000-row rank table) before any window/driver-side math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from finance_etl_pipeline_spark.functions.scalars import fround, sql_round
from finance_etl_pipeline_spark.operators.dedup import tokens_expr
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import spread, table

_SQL_TOKD = (
    r"SELECT doc_id, source, string_split_regex(lower(text), '\s+') AS t "
    r"FROM documents"
)


@register(
    "tx_ngram_diversity",
    f"""
    WITH tokd AS ({_SQL_TOKD}),
    starts AS (
      SELECT source, t,
             unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i
      FROM tokd
    ),
    grams AS (
      SELECT source, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
      FROM starts
    )
    SELECT source,
           count(*) AS total_grams,
           count(DISTINCT g) AS distinct_grams,
           {sql_round('CAST(count(DISTINCT g) AS DOUBLE) / count(*)', 6)}
             AS diversity
    FROM grams GROUP BY source ORDER BY source
    """,
    "llm",
    "diversity",
)
def tx_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source trigram type-token ratio (distinct/total trigrams).

    The standard templated-content screen: a source whose documents
    share boilerplate skeletons repeats the same trigrams and scores
    low; diverse prose scores high.

    Spark shape: tokenize → non-distinct trigram transform → explode →
    two-level aggregate (groupBy(source, gram) count, then
    groupBy(source)).  Both shuffles are map-side combined and keyed
    on (source, gram) — high cardinality, no skew; the second
    aggregate's input is the per-source vocabulary, not the corpus.
    At 100 TB the exact distinct count swaps to
    approx_count_distinct per source (one HLL sketch per partition)
    without changing the query shape."""
    docs = spread(table(spark, sf_dir, "documents"))
    toks = tokens_expr()
    idx = F.sequence(F.lit(1), F.size(toks) - 2)
    grams = F.when(
        F.size(toks) >= 3,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i),
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_gram = (
        docs.select("source", F.explode(grams).alias("g"))
        .groupBy("source", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        per_gram.groupBy("source")
        .agg(
            F.sum("cnt").alias("total_grams"),
            F.count(F.lit(1)).alias("distinct_grams"),
            fround(
                F.count(F.lit(1)).cast("double") / F.sum("cnt"), 6
            ).alias("diversity"),
        )
        .orderBy("source")
    )


@register(
    "prof_corpus_mixture",
    f"""
    WITH base AS (
      SELECT lang, source, count(*) AS n_docs, sum(n_chars) AS sum_chars
      FROM documents GROUP BY lang, source
    ),
    shares AS (
      SELECT lang, source, n_docs, sum_chars,
        CAST(n_docs AS DOUBLE) / sum(n_docs) OVER () AS p_corpus,
        CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (PARTITION BY lang)
          AS p_lang
      FROM base
    )
    SELECT lang, source, n_docs, sum_chars,
      {sql_round('p_corpus', 6)} AS share_of_corpus,
      {sql_round('p_lang', 6)} AS share_of_lang,
      {sql_round('sum(-p_lang * log2(p_lang)) OVER (PARTITION BY lang)', 6)}
        AS lang_source_entropy_bits
    FROM shares ORDER BY lang, source
    """,
    "llm",
    "diversity",
    "profile",
)
def prof_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mixture composition report: per (lang, source) cell the
    doc count, char volume, share of corpus, share within the lang,
    and the Shannon entropy (bits) of the lang's source distribution.

    Mixture balance is the knob temperature-resampling
    (``s_mixture_resample``) turns; this is the gauge read before and
    after.

    Spark shape: one map-side-combined groupBy reduces the corpus to
    the lang×source grain (tiny at any data scale); all window math
    runs over that reduced table, so the unpartitioned window is a
    few-row exchange, not a corpus-wide sort."""
    docs = table(spark, sf_dir, "documents")
    base = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )
    w_all = Window.partitionBy()
    w_lang = Window.partitionBy("lang")
    p_lang = F.col("n_docs").cast("double") / F.sum("n_docs").over(w_lang)
    return (
        base.select(
            "lang",
            "source",
            "n_docs",
            "sum_chars",
            fround(
                F.col("n_docs").cast("double") / F.sum("n_docs").over(w_all),
                6,
            ).alias("share_of_corpus"),
            fround(p_lang, 6).alias("share_of_lang"),
            fround(
                F.sum(-p_lang * F.log2(p_lang)).over(w_lang), 6
            ).alias("lang_source_entropy_bits"),
        )
        .orderBy("lang", "source")
    )


@register(
    "tx_zipf_slope",
    f"""
    WITH tokd AS ({_SQL_TOKD}),
    toks AS (SELECT unnest(t) AS tok FROM tokd),
    freq AS (SELECT tok, count(*) AS f FROM toks GROUP BY tok),
    ranked AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS r FROM freq
    ),
    top AS (SELECT * FROM ranked WHERE r <= 1000)
    SELECT count(*) AS n_tokens_fit,
           {sql_round('regr_slope(ln(f), ln(r))', 4)} AS zipf_slope,
           {sql_round('regr_r2(ln(f), ln(r))', 4)} AS zipf_r2
    FROM top
    """,
    "llm",
    "diversity",
)
def tx_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit over the top-1000 token frequencies: OLS slope and
    R² of log(freq) ~ log(rank).  Natural-language corpora sit near
    slope -1 with high R²; synthetic/templated text bends the curve.

    Spark shape: token counts (map-side combined, vocabulary-sized
    shuffle) → top-1000 by (freq desc, token) via orderBy().limit()
    — TakeOrderedAndProject, per-partition heaps, never a global
    sort — then row_number and the regression aggregate run on the
    1000-row table.  The rank tie-break on token keeps both engines'
    rank assignment (and hence log(rank)) deterministic."""
    docs = spread(table(spark, sf_dir, "documents"))
    freq = (
        docs.select(F.explode(tokens_expr()).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    top = freq.orderBy(F.col("f").desc(), F.col("tok")).limit(1000)
    ranked = top.withColumn(
        "r",
        F.row_number().over(Window.orderBy(F.col("f").desc(), F.col("tok"))),
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_tokens_fit"),
        fround(F.regr_slope(F.log("f"), F.log("r")), 4).alias("zipf_slope"),
        fround(F.regr_r2(F.log("f"), F.log("r")), 4).alias("zipf_r2"),
    )
