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

from finance_etl_pipeline_spark.functions.scalars import (
    fround,
    igrid,
    sql_igrid,
    sql_round,
)
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
           {sql_igrid('CAST(count(DISTINCT g) AS DOUBLE) / count(*)', 6)}
             AS diversity_e6
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
            igrid(
                F.count(F.lit(1)).cast("double") / F.sum("cnt"), 6
            ).alias("diversity_e6"),
        )
        .orderBy("source")
    )


@register(
    "prof_corpus_mixture",
    f"""
    WITH base AS (
      SELECT lang, source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
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
      {sql_igrid('p_corpus', 6)} AS share_of_corpus_e6,
      {sql_igrid('p_lang', 6)} AS share_of_lang_e6,
      {sql_igrid('sum(-p_lang * log2(p_lang)) OVER (PARTITION BY lang)', 6)}
        AS lang_source_entropy_mbits
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
            igrid(
                F.col("n_docs").cast("double") / F.sum("n_docs").over(w_all),
                6,
            ).alias("share_of_corpus_e6"),
            igrid(p_lang, 6).alias("share_of_lang_e6"),
            igrid(
                F.sum(-p_lang * F.log2(p_lang)).over(w_lang), 6
            ).alias("lang_source_entropy_mbits"),
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
           {sql_igrid('regr_slope(ln(f), ln(r))', 4)} AS zipf_slope_e4,
           {sql_igrid('regr_r2(ln(f), ln(r))', 4)} AS zipf_r2_e4
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
        igrid(F.regr_slope(F.log("f"), F.log("r")), 4).alias("zipf_slope_e4"),
        igrid(F.regr_r2(F.log("f"), F.log("r")), 4).alias("zipf_r2_e4"),
    )


_PMI_MIN_COUNT = 5
_PMI_TOP = 20


@register(
    "tx_pmi_collocations",
    f"""
    WITH tokd AS ({_SQL_TOKD}),
    toks AS (SELECT unnest(t) AS w FROM tokd),
    uni AS (SELECT w, count(*) AS n FROM toks GROUP BY w),
    tot AS (SELECT sum(n) AS nn FROM uni),
    big AS (
      SELECT t[i] AS w1, t[i+1] AS w2
      FROM (SELECT t, unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i
            FROM tokd)
    ),
    bc AS (
      SELECT w1, w2, count(*) AS nab FROM big GROUP BY w1, w2
      HAVING count(*) >= {_PMI_MIN_COUNT}
    ),
    bt AS (SELECT sum(nab) AS bb FROM (SELECT count(*) AS nab FROM big GROUP BY w1, w2)),
    scored AS (
      SELECT bc.w1, bc.w2, bc.nab,
             {sql_igrid(
               'ln((CAST(bc.nab AS DOUBLE) / bb) '
               '/ ((CAST(u1.n AS DOUBLE) / nn) * (CAST(u2.n AS DOUBLE) / nn)))',
               6)} AS pmi_e6
      FROM bc
      JOIN uni u1 ON bc.w1 = u1.w
      JOIN uni u2 ON bc.w2 = u2.w
      CROSS JOIN tot CROSS JOIN bt
    ),
    ranked AS (
      SELECT w1, w2, nab, pmi_e6,
             row_number() OVER (ORDER BY pmi_e6 DESC, w1, w2) AS rk
      FROM scored
    )
    SELECT w1, w2, nab, pmi_e6 FROM ranked WHERE rk <= {_PMI_TOP}
    ORDER BY w1, w2
    """,
    "llm",
    "diversity",
    "text",
)
def tx_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by pointwise mutual information:
    adjacent token pairs whose joint probability most exceeds the
    product of their marginals (min pair count 5 to
    suppress noise floors) — the classic phrase-mining statistic for
    vocabulary construction and tokenizer sanity checks.

    Determinism: PMI is frounded at 6 dp before ranking and the rank
    is a total order (pmi desc, then pair), so the top-20 SET is
    bit-stable.

    Scale: unigram and bigram counts are map-side-combined groupBys
    (vocabulary-bounded); marginal joins key on the token — at real
    vocab the unigram side broadcasts; the two 1-row totals are
    broadcast nested loops.  Nothing scales with corpus size past the
    narrow token/bigram maps."""
    docs = spread(table(spark, sf_dir, "documents"))
    toks = tokens_expr()
    uni = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = uni.agg(F.sum("n").alias("nn"))
    idx = F.sequence(F.lit(1), F.size(toks) - 1)
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            idx,
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    big = docs.select(F.explode(pairs).alias("p")).select("p.w1", "p.w2")
    bc_all = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("nab"))
    bt = bc_all.agg(F.sum("nab").alias("bb"))
    bc = bc_all.filter(F.col("nab") >= _PMI_MIN_COUNT)
    u1 = uni.select(F.col("w").alias("w1"), F.col("n").alias("n1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("n").alias("n2"))
    scored = (
        bc.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(bt))
        .select(
            "w1",
            "w2",
            "nab",
            igrid(
                F.log(
                    (F.col("nab").cast("double") / F.col("bb"))
                    / (
                        (F.col("n1").cast("double") / F.col("nn"))
                        * (F.col("n2").cast("double") / F.col("nn"))
                    )
                ),
                6,
            ).alias("pmi_e6"),
        )
    )
    rk = F.row_number().over(
        Window.orderBy(F.desc("pmi_e6"), "w1", "w2")
    )
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") <= _PMI_TOP)
        .select("w1", "w2", "nab", "pmi_e6")
        .orderBy("w1", "w2")
    )


@register(
    "tx_ngram_novelty_curve",
    f"""
    WITH d AS (
      SELECT doc_id, ntile(10) OVER (ORDER BY doc_id) AS decile
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT t.doc_id,
             t.t[i] || ' ' || t.t[i+1] || ' ' || t.t[i+2] AS g
      FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
            FROM documents) t,
           unnest(generate_series(1, greatest(len(t.t) - 2, 0))) s(i)
    ),
    gd AS (
      SELECT g, d.decile FROM grams JOIN d ON d.doc_id = grams.doc_id
    ),
    firsts AS (SELECT g, min(decile) AS first_decile FROM gd GROUP BY g),
    per AS (
      SELECT decile, count(DISTINCT g) AS n_grams FROM gd GROUP BY decile
    ),
    news AS (
      SELECT first_decile AS decile, count(*) AS n_new
      FROM firsts GROUP BY first_decile
    )
    SELECT per.decile AS decile, n_grams, coalesce(n_new, 0) AS n_new,
           {sql_igrid('coalesce(n_new, 0) / CAST(n_grams AS DOUBLE)', 4)}
             AS novelty_e4
    FROM per LEFT JOIN news ON news.decile = per.decile
    ORDER BY per.decile
    """,
    "llm",
    "diversity",
    "profile",
)
def tx_ngram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty saturation curve: slice the corpus into 10 deciles (in
    doc_id order — the arrival-order proxy) and report, per decile,
    how many of its distinct word 3-grams appear for the FIRST time
    there.  A flattening curve says additional crawl volume is
    repeating what you already have — the diminishing-returns gauge
    behind "do we need more of this source?".

    Spark shape: gram extraction is the usual narrow map+explode;
    ONE aggregate keyed on the gram reduces the corpus-sized rows to
    a per-gram decile SET (≤ 10 ints), and both readouts derive from
    that pinned table: n_grams per decile = grams whose set contains
    it (explode + count), n_new = grams whose set-minimum is it —
    identical to the old pair of independent aggregates
    (min-per-gram + count_distinct-per-decile), which evaluated the
    corpus-sized gram join TWICE through two separate exchanges (r12;
    guide §1.2/§2.4).  The curve is a 10-row join.  The global ntile
    is a range-partitioned sort over doc ids only; on a cluster the
    pin is persist(DISK_ONLY) — same caveat as the shingle index."""
    from finance_etl_pipeline_spark.operators.dedup import (
        shingles_expr,
        tokens_expr,
    )

    docs = spread(table(spark, sf_dir, "documents"))
    d = docs.select(
        "doc_id",
        F.ntile(10).over(Window.orderBy("doc_id")).alias("decile"),
    )
    grams = docs.select(
        "doc_id", F.explode(shingles_expr(tokens_expr(), n=3)).alias("g")
    )
    gd = grams.join(d, "doc_id").select("g", "decile")
    gsets = (
        gd.groupBy("g")
        .agg(F.collect_set("decile").alias("ds"))
        .localCheckpoint(eager=True)
    )
    per = (
        gsets.select(F.explode("ds").alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("n_grams"))
    )
    news = gsets.select(F.array_min("ds").alias("decile")).groupBy(
        "decile"
    ).agg(F.count(F.lit(1)).alias("n_new"))
    return (
        per.join(news, "decile", "left")
        .select(
            "decile",
            "n_grams",
            F.coalesce("n_new", F.lit(0).cast("long")).alias("n_new"),
            igrid(
                F.coalesce("n_new", F.lit(0).cast("long"))
                / F.col("n_grams").cast("double"),
                4,
            ).alias("novelty_e4"),
        )
        .orderBy("decile")
    )


_VOCAB_K = 1000  # fixed tokenizer-style vocabulary size


@register(
    "tx_vocab_coverage",
    f"""
    WITH tokd AS ({_SQL_TOKD}),
    toks AS (SELECT source, unnest(t) AS tok FROM tokd),
    freq AS (SELECT tok, count(*) AS f FROM toks GROUP BY tok),
    vocab AS (
      SELECT tok FROM (
        SELECT tok, row_number() OVER (ORDER BY f DESC, tok) AS r FROM freq
      ) WHERE r <= {_VOCAB_K}
    )
    SELECT source,
           count(*) AS n_tokens,
           CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           {{oov}} AS oov_rate_e6
    FROM toks LEFT JOIN vocab v USING (tok)
    GROUP BY source ORDER BY source
    """.format(
        oov=sql_igrid(
            "sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)"
            " / CAST(count(*) AS DOUBLE)",
            6,
        )
    ),
    "llm",
    "diversity",
    "tokenizer",
)
def tx_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage / OOV rate per source: freeze the corpus's
    top-1000 tokens as a fixed vocabulary (ties broken
    lexicographically, as a tokenizer build would) and report each
    source's out-of-vocabulary token share — the coverage audit run
    before committing a tokenizer to a new data mix (a high-OOV
    source inflates fertility and UNK rates downstream).

    Scale: the frequency table is vocabulary-sized (map-side combined
    groupBy); the top-K cut is a TakeOrdered; the vocab is broadcast
    back onto the token stream, so the scan side never shuffles —
    per-source totals are the only (tiny) aggregate."""
    docs = spread(table(spark, sf_dir, "documents"))
    toks = docs.select(
        "source", F.explode(tokens_expr()).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    vocab = (
        freq.orderBy(F.desc("f"), "tok")
        .limit(_VOCAB_K)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    tagged = toks.join(F.broadcast(vocab), "tok", "left")
    oov = F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
    return (
        tagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            oov.alias("n_oov"),
            igrid(oov / F.count(F.lit(1)).cast("double"), 6).alias(
                "oov_rate_e6"
            ),
        )
        .orderBy("source")
    )


@register(
    "tx_token_entropy",
    f"""
    WITH tokd AS ({_SQL_TOKD}),
    toks AS (SELECT doc_id, unnest(t) AS tok FROM tokd),
    cnts AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok),
    tot AS (SELECT doc_id, sum(c) AS n FROM cnts GROUP BY doc_id)
    SELECT cnts.doc_id AS doc_id,
           CAST(max(n) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           {sql_igrid(
               '-sum((c / CAST(n AS DOUBLE)) * ln(c / CAST(n AS DOUBLE))) / ln(2)',
               6,
           )} AS entropy_bits_e6
    FROM cnts JOIN tot ON cnts.doc_id = tot.doc_id
    GROUP BY cnts.doc_id
    ORDER BY doc_id
    """,
    "llm",
    "diversity",
    "text",
)
def tx_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram Shannon entropy (bits): the
    information-density screen that separates natural prose
    (high entropy) from templated or looping text (low entropy) —
    the continuous complement to the Gopher top-2-gram repetition
    rule and the corpus-level Zipf fit.

    Scale: per-(doc, token) counts are a map-side-combined groupBy on
    a high-cardinality key; the entropy reduction is per doc_id — the
    natural distribution key, no skew."""
    docs = spread(table(spark, sf_dir, "documents"))
    cnts = (
        docs.select("doc_id", F.explode(tokens_expr()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = cnts.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n").cast("double")
    return (
        cnts.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.max("n").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            igrid(-F.sum(p * F.log(p)) / F.log(F.lit(2.0)), 6).alias(
                "entropy_bits_e6"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "tx_js_divergence_sources",
    f"""
    WITH tokd AS ({_SQL_TOKD}),
    toks AS (SELECT source, unnest(t) AS tok FROM tokd),
    cnt AS (SELECT source, tok, count(*) AS c FROM toks GROUP BY source, tok),
    tot AS (SELECT source, sum(c) AS n FROM cnt GROUP BY source),
    p AS (
      SELECT cnt.source, tok, c / CAST(n AS DOUBLE) AS p
      FROM cnt JOIN tot ON cnt.source = tot.source
    ),
    spairs AS (
      SELECT a.source AS source_a, b.source AS source_b
      FROM (SELECT DISTINCT source FROM cnt) a
      JOIN (SELECT DISTINCT source FROM cnt) b ON a.source < b.source
    ),
    la AS (
      SELECT sp.source_a, sp.source_b, p.tok, p.p AS pa
      FROM spairs sp JOIN p ON p.source = sp.source_a
    ),
    lb AS (
      SELECT sp.source_a, sp.source_b, p.tok, p.p AS pb
      FROM spairs sp JOIN p ON p.source = sp.source_b
    ),
    merged AS (
      SELECT coalesce(la.source_a, lb.source_a) AS source_a,
             coalesce(la.source_b, lb.source_b) AS source_b,
             coalesce(la.pa, 0.0) AS pa,
             coalesce(lb.pb, 0.0) AS pb
      FROM la FULL OUTER JOIN lb
        ON la.source_a = lb.source_a AND la.source_b = lb.source_b
       AND la.tok = lb.tok
    )
    SELECT source_a, source_b,
           {sql_igrid(
               '''sum(
                    CASE WHEN pa > 0
                         THEN 0.5 * pa * ln(pa / ((pa + pb) / 2)) ELSE 0 END
                  + CASE WHEN pb > 0
                         THEN 0.5 * pb * ln(pb / ((pa + pb) / 2)) ELSE 0 END
                  ) / ln(2)''', 6)} AS jsd_bits_e6
    FROM merged
    GROUP BY source_a, source_b
    ORDER BY source_a, source_b
    """,
    "llm",
    "diversity",
    "mixture",
)
def tx_js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen–Shannon divergence (bits) between the sources'
    unigram distributions — the bounded, symmetric corpus-similarity
    measure behind mixture design: near-0 pairs are redundant sources
    (dedup across them matters more than balancing), higher pairs
    contribute genuinely different text.  Tokens present in only one
    side of a pair contribute their full one-sided terms (pair-scoped
    FULL OUTER on the token key), so disjoint vocabularies reach the
    ln2-bit maximum.

    Determinism: per-term values are identical cross-engine
    (exact-integer ratios through identical log arithmetic) and the
    e6 grid absorbs partial-sum ordering ulps.

    Scale: vocabulary-bounded — per-source distributions are
    |sources|×|vocab| rows, the pair expansion multiplies by
    |sources| (broadcast pair table), and the output is |sources|²
    rows."""
    docs = spread(table(spark, sf_dir, "documents"))
    cnt = (
        docs.select("source", F.explode(tokens_expr()).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = cnt.groupBy("source").agg(F.sum("c").alias("n"))
    p = cnt.join(tot, "source").select(
        "source", "tok", (F.col("c") / F.col("n").cast("double")).alias("p")
    )
    srcs = cnt.select("source").distinct()
    spairs = (
        srcs.select(F.col("source").alias("source_a"))
        .join(
            srcs.select(F.col("source").alias("source_b")),
            F.col("source_a") < F.col("source_b"),
        )
    )
    la = spairs.join(
        p, p.source == F.col("source_a")
    ).select("source_a", "source_b", "tok", F.col("p").alias("pa"))
    lb = spairs.join(
        p, p.source == F.col("source_b")
    ).select("source_a", "source_b", "tok", F.col("p").alias("pb"))
    merged = (
        la.withColumnRenamed("source_a", "a1")
        .withColumnRenamed("source_b", "b1")
        .withColumnRenamed("tok", "t1")
        .join(
            lb,
            (F.col("a1") == lb.source_a)
            & (F.col("b1") == lb.source_b)
            & (F.col("t1") == lb.tok),
            "full_outer",
        )
        .select(
            F.coalesce("a1", "source_a").alias("source_a"),
            F.coalesce("b1", "source_b").alias("source_b"),
            F.coalesce("pa", F.lit(0.0)).alias("pa"),
            F.coalesce("pb", F.lit(0.0)).alias("pb"),
        )
    )
    m = (F.col("pa") + F.col("pb")) / 2
    term = F.when(
        F.col("pa") > 0, 0.5 * F.col("pa") * F.log(F.col("pa") / m)
    ).otherwise(0.0) + F.when(
        F.col("pb") > 0, 0.5 * F.col("pb") * F.log(F.col("pb") / m)
    ).otherwise(0.0)
    return (
        merged.groupBy("source_a", "source_b")
        .agg(igrid(F.sum(term) / F.log(F.lit(2.0)), 6).alias("jsd_bits_e6"))
        .orderBy("source_a", "source_b")
    )
