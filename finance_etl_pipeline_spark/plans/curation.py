"""Corpus-curation query battery: chunking, chunk-level dedup,
Gopher-style quality flags, heavy hitters, drift monitoring, and
temperature-scaled mixture resampling.

These extend the LLM-pipeline surface (BASELINE.json north_star)
beyond plans/llm.py's dedup/ANN/text-stats set with the ops that sit
between raw documents and tokenized training shards.  Every query is
oracle-paired; shared constants (chunk geometry, rule thresholds) are
interpolated into the SQL so the two sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from finance_etl_pipeline_spark.functions.scalars import (
    fround,
    igrid,
    sql_hash60,
    sql_igrid,
    sql_round,
)
from finance_etl_pipeline_spark.operators import curation as C
from finance_etl_pipeline_spark.operators.dedup import tokens_expr
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import spread, table

_SQL_TOKD = r"SELECT doc_id, string_split_regex(lower(text), '\s+') AS t FROM documents"

_CHUNK = C.CHUNK_TOKENS
_STRIDE = C.CHUNK_STRIDE

# slice of t covering chunk k (1-based start 1 + k*stride, length CHUNK)
_SQL_SLICE = (
    f"list_slice(t, 1 + chunk_idx * {_STRIDE}, chunk_idx * {_STRIDE} + {_CHUNK})"
)

_SQL_CHUNKS = f"""
  tokd AS ({_SQL_TOKD}),
  starts AS (
    SELECT doc_id, t,
           unnest(generate_series(0, (greatest(len(t), 1) - 1) // {_STRIDE})) AS chunk_idx
    FROM tokd
  ),
  chunks AS (
    SELECT doc_id, chunk_idx,
           len({_SQL_SLICE}) AS n_tokens,
           array_to_string({_SQL_SLICE}, ' ') AS chunk_text
    FROM starts
  )
"""


@register(
    "tx_doc_chunks",
    f"""
    WITH {_SQL_CHUNKS}
    SELECT * FROM chunks ORDER BY doc_id, chunk_idx
    """,
    "llm",
    "curation",
)
def tx_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split each document into 32-token
    windows on a 24-token stride (8-token overlap).  The packing step
    before tokenization in a pre-training pipeline; a pure narrow
    map+explode — zero shuffle at any scale."""
    docs = table(spark, sf_dir, "documents")
    return C.chunk_table(docs).orderBy("doc_id", "chunk_idx")


@register(
    "dd_chunk_dup_rate",
    f"""
    WITH {_SQL_CHUNKS},
    hashed AS (
      SELECT doc_id, count(*) OVER (PARTITION BY md5(chunk_text)) AS dup_cnt
      FROM chunks
    )
    SELECT doc_id,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN dup_cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
           {sql_igrid('sum(CASE WHEN dup_cnt > 1 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)', 4)} AS dup_rate_e4
    FROM hashed GROUP BY doc_id ORDER BY doc_id
    """,
    "llm",
    "curation",
    "dedup",
)
def dd_chunk_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact-dup rate per document: the fraction of a
    doc's chunks whose md5 also appears elsewhere in the corpus —
    sub-document boilerplate detection (headers, licence blocks)
    that whole-doc dedup misses.

    Spark shape: per-hash counts via groupBy (map-side combined),
    broadcast-free join back on the hash, then a per-doc aggregate.
    Both shuffles are on high-cardinality keys — no skew, no n²."""
    ch = C.chunk_table(table(spark, sf_dir, "documents"))
    hashed = ch.select("doc_id", F.md5("chunk_text").alias("h"))
    per_hash = hashed.groupBy("h").agg(F.count(F.lit(1)).alias("dup_cnt"))
    dup = F.sum(F.when(F.col("dup_cnt") > 1, 1).otherwise(0))
    return (
        hashed.join(per_hash, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            dup.alias("dup_chunks"),
            igrid(dup / F.count(F.lit(1)).cast("double"), 4).alias("dup_rate_e4"),
        )
        .orderBy("doc_id")
    )


# Gopher-style rule thresholds (Rae et al. 2021 §A1.1, adapted to the
# synthetic corpus: word-soup docs have no lines/symbols, so the three
# rules that bind are count, word length, and repetition).
_WC_MIN, _WC_MAX = 10, 100_000
_MWL_MIN, _MWL_MAX = 2.0, 12.0
_TOP2_MAX = 0.2


@register(
    "tx_gopher_flags",
    f"""
    WITH tokd AS ({_SQL_TOKD}),
    base AS (
      SELECT doc_id, len(t) AS word_cnt,
             {sql_igrid('list_sum(list_transform(t, x -> len(x))) / CAST(len(t) AS DOUBLE)', 4)} AS mean_word_len_e4
      FROM tokd
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i+1])) AS g
      FROM tokd WHERE len(t) >= 2
    ),
    per_gram AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g),
    rep AS (
      SELECT doc_id, {sql_igrid('max(c) / CAST(sum(c) AS DOUBLE)', 4)} AS top2_share_e4
      FROM per_gram GROUP BY doc_id
    )
    SELECT base.doc_id AS doc_id, word_cnt, mean_word_len_e4,
           coalesce(top2_share_e4, 0) AS top2_share_e4,
           CAST(word_cnt BETWEEN {_WC_MIN} AND {_WC_MAX}
                AND mean_word_len_e4 BETWEEN {int(_MWL_MIN * 10_000)} AND {int(_MWL_MAX * 10_000)}
                AND coalesce(top2_share_e4, 0) <= {int(_TOP2_MAX * 10_000)} AS INTEGER) AS passes
    FROM base LEFT JOIN rep ON base.doc_id = rep.doc_id
    ORDER BY base.doc_id
    """,
    "llm",
    "curation",
    "quality",
)
def tx_gopher_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality gate: word-count bounds, mean
    word length bounds, and top-2-gram repetition share, combined
    into a single pass/fail flag.  Rules are evaluated on the
    integer-grid metrics (×10⁴, BIGINT) so both the gate decision and
    the emitted values are exactly identical cross-engine.

    Spark shape: the per-doc scalar metrics are one narrow pass; only
    the repetition signal aggregates (by (doc, gram), map-side
    combined)."""
    docs = spread(table(spark, sf_dir, "documents"))
    with_t = docs.select("doc_id", tokens_expr().alias("t"))
    mwl = F.expr(
        "aggregate(transform(t, x -> length(x)), cast(0 as bigint), (a, x) -> a + x)"
    ).cast("double") / F.size("t")
    base = with_t.select(
        "doc_id",
        F.size("t").alias("word_cnt"),
        igrid(mwl, 4).alias("mean_word_len_e4"),
    )
    rep = C.bigram_top_share(docs).select(
        "doc_id", igrid(F.col("top2_share"), 4).alias("top2_share_e4")
    )
    j = base.join(rep, "doc_id", "left").select(
        "doc_id",
        "word_cnt",
        "mean_word_len_e4",
        F.coalesce("top2_share_e4", F.lit(0).cast("long")).alias("top2_share_e4"),
    )
    passes = (
        F.col("word_cnt").between(_WC_MIN, _WC_MAX)
        & F.col("mean_word_len_e4").between(
            int(_MWL_MIN * 10_000), int(_MWL_MAX * 10_000)
        )
        & (F.col("top2_share_e4") <= int(_TOP2_MAX * 10_000))
    )
    return j.withColumn("passes", passes.cast("int")).orderBy("doc_id")


@register(
    "hh_top_tokens",
    f"""
    WITH toks AS (
      SELECT unnest(t) AS token FROM ({_SQL_TOKD})
    ),
    counts AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
    tot AS (SELECT sum(cnt) AS total FROM counts)
    SELECT token, cnt, {sql_igrid('cnt / CAST(total AS DOUBLE)', 6)} AS share_e6
    FROM counts CROSS JOIN tot
    ORDER BY cnt DESC, token LIMIT 20
    """,
    "llm",
    "curation",
    "agg",
)
def hh_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters: exact top-20 tokens by frequency with
    corpus share.  The exact baseline the Misra-Gries sketch
    (operators/sketch.py) is tested against; at 100 TB the exact
    variant is still one map-side-combined groupBy over tokens —
    the vocabulary, not the corpus, is what shuffles."""
    docs = spread(table(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(tokens_expr()).alias("token"))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "token",
            "cnt",
            igrid(F.col("cnt") / F.col("total").cast("double"), 6).alias("share_e6"),
        )
        .orderBy(F.desc("cnt"), "token")
        .limit(20)
    )


_N_BINS = 10
_BIN_W = 50.0
_KS_BANDS = 16  # KS prefix bands: quantiles of the distinct-value table


@register(
    "drift_psi_events",
    f"""
    WITH binned AS (
      SELECT least(CAST(floor(value / {_BIN_W}) AS INTEGER), {_N_BINS - 1}) AS bin,
             event_id % 2 AS grp
      FROM events
    ),
    cells AS (
      SELECT bin,
             CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM binned GROUP BY bin
    ),
    tot AS (SELECT sum(ca) AS ta, sum(cb) AS tb FROM cells)
    SELECT bin, ca, cb,
           {sql_igrid(f'''((ca + 1) / CAST(ta + {_N_BINS} AS DOUBLE)
              - (cb + 1) / CAST(tb + {_N_BINS} AS DOUBLE))
            * ln(((ca + 1) / CAST(ta + {_N_BINS} AS DOUBLE))
               / ((cb + 1) / CAST(tb + {_N_BINS} AS DOUBLE)))''', 6)} AS psi_term_e6
    FROM cells CROSS JOIN tot
    ORDER BY bin
    """,
    "llm",
    "curation",
    "events",
)
def drift_psi_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift monitor: bin `value` into 10
    fixed-width buckets, split the population by a deterministic
    hash (event_id parity = the A/B cohorts), and emit each bin's
    Laplace-smoothed PSI term.  Per-bin terms (not a single total)
    keep the output independent of float summation order.

    Spark shape: one groupBy(bin) with conditional sums (map-side
    combined to <= 10 rows per partition), totals broadcast back."""
    e = table(spark, sf_dir, "events")
    binned = e.select(
        F.least(
            F.floor(F.col("value") / _BIN_W).cast("int"), F.lit(_N_BINS - 1)
        ).alias("bin"),
        (F.col("event_id") % 2).alias("grp"),
    )
    cells = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("cb"),
    )
    tot = cells.agg(F.sum("ca").alias("ta"), F.sum("cb").alias("tb"))
    pa = (F.col("ca") + 1) / (F.col("ta") + _N_BINS).cast("double")
    pb = (F.col("cb") + 1) / (F.col("tb") + _N_BINS).cast("double")
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "ca",
            "cb",
            igrid((pa - pb) * F.log(pa / pb), 6).alias("psi_term_e6"),
        )
        .orderBy("bin")
    )


@register(
    "drift_ks_value",
    f"""
    WITH cells AS (
      SELECT value,
             CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM events WHERE value IS NOT NULL GROUP BY value
    ),
    tot AS (SELECT sum(ca) AS ta, sum(cb) AS tb FROM cells),
    cum AS (
      SELECT sum(ca) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS cum_a,
             sum(cb) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS cum_b
      FROM cells
    )
    SELECT CAST(ta AS BIGINT) AS n_a, CAST(tb AS BIGINT) AS n_b,
           CAST(max(abs(cum_a * tb - cum_b * ta)) AS BIGINT) AS d_num,
           {sql_igrid('max(abs(cum_a * tb - cum_b * ta)) / (CAST(ta AS DOUBLE) * tb)', 6)} AS ks_e6
    FROM cum CROSS JOIN tot
    GROUP BY ta, tb
    """,
    "llm",
    "curation",
    "events",
)
def drift_ks_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov drift statistic on the
    `value` distribution between the two deterministic cohorts
    (event_id parity): KS = max over distinct values of
    |ECDF_a - ECDF_b|.  PSI (drift_psi_events) sees only 10 coarse
    bins; KS is the distribution-free test that catches shape drift
    PSI's binning can hide, and the classic pre-training check that a
    re-scored or re-sampled corpus still matches the reference
    distribution.

    Everything up to the final grid is INTEGER arithmetic: the
    statistic is maximized as |cum_a*N_b - cum_b*N_a| (exact BIGINT),
    so cross-engine parity cannot hinge on float summation order.

    Spark shape — exact KS needs a global ECDF, but NOT a global
    single-partition sort: distinct values aggregate first (map-side
    combine, one row per distinct value), band boundaries come from
    exact percentiles OF THE DISTINCT VALUES (one more aggregate over
    the cells table — the prof_range_partition_plan pattern), per-band
    subtotals form the prefix offsets (a window over _KS_BANDS rows),
    and the running sums run inside each band only.  Quantile-derived
    bands make the within-band window ≈ |distinct|/_KS_BANDS rows on
    ANY value domain — a fixed-width grid would degrade to one
    unbounded band on a domain the grid wasn't sized for.  Banding is
    placement only: bucket = 1 + #(boundaries below value) is
    monotone in value, so prefix + within-band sums ARE the global
    cumulative sums and the emitted statistic is band-invariant.

    Exactness bound: the integer numerator |cum·N_b − cum·N_a| stays
    below 2⁶³ while each cohort holds < ~3·10⁹ rows (cum ≤ N_a, so
    the product is ≤ N_a·N_b); beyond that, switch the numerator to
    DOUBLE — the e6 grid only needs ~15 significant digits and the
    SQL oracle has the same overflow horizon, so the exact-integer
    form buys nothing there."""
    e = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cells = e.select((F.col("event_id") % 2).alias("grp"), "value").groupBy(
        "value"
    ).agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("cb"),
    )
    # one array-percentile buffer for all band edges (the
    # tx_ppl_buckets pattern) instead of _KS_BANDS−1 scalar aggregates
    _arr = F.percentile(
        "value", F.array(*[F.lit(j / _KS_BANDS) for j in range(1, _KS_BANDS)])
    )
    b = cells.agg(
        *[
            F.element_at(_arr, j).alias(f"kb{j}")
            for j in range(1, _KS_BANDS)
        ]
    )
    bucket = F.lit(1)
    for j in range(1, _KS_BANDS):
        bucket = bucket + F.when(
            F.col("value") > F.col(f"kb{j}"), 1
        ).otherwise(0)
    cells = (
        cells.crossJoin(F.broadcast(b))
        .withColumn("bkt", bucket.cast("long"))
        .drop(*[f"kb{j}" for j in range(1, _KS_BANDS)])
    )
    band_tot = cells.groupBy("bkt").agg(
        F.sum("ca").alias("bca"), F.sum("cb").alias("bcb")
    )
    wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    prefix = band_tot.select(
        "bkt",
        F.coalesce(F.sum("bca").over(wb), F.lit(0)).alias("pa"),
        F.coalesce(F.sum("bcb").over(wb), F.lit(0)).alias("pb"),
    )
    wv = Window.partitionBy("bkt").orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = cells.join(F.broadcast(prefix), "bkt").select(
        (F.sum("ca").over(wv) + F.col("pa")).alias("cum_a"),
        (F.sum("cb").over(wv) + F.col("pb")).alias("cum_b"),
    )
    tot = cells.agg(
        F.sum("ca").alias("ta"), F.sum("cb").alias("tb")
    )
    d = F.abs(
        F.col("cum_a") * F.col("tb") - F.col("cum_b") * F.col("ta")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.max("ta").cast("long").alias("n_a"),
            F.max("tb").cast("long").alias("n_b"),
            F.max(d).cast("long").alias("d_num"),
            igrid(
                F.max(d) / (F.max("ta").cast("double") * F.max("tb")), 6
            ).alias("ks_e6"),
        )
        # empty input: the global agg makes one all-NULL row while the
        # oracle's GROUP BY ta, tb makes zero — align to zero rows
        .where(F.col("n_a").isNotNull())
    )


_ALPHA_KEEP = 200  # total docs the resampled mixture targets


@register(
    "s_mixture_resample",
    f"""
    WITH per_src AS (
      SELECT source, sum(n_chars) AS tot_chars FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, tot_chars, sqrt(CAST(tot_chars AS DOUBLE)) AS wt FROM per_src
    ),
    tgt AS (
      SELECT source, tot_chars,
             greatest(1, CAST(floor(wt / (SELECT sum(wt) FROM w) * {_ALPHA_KEEP} + 0.0001) AS BIGINT)) AS target_docs
      FROM w
    ),
    ranked AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    )
    SELECT r.doc_id, r.source, r.rk
    FROM ranked r JOIN tgt ON r.source = tgt.source
    WHERE r.rk <= tgt.target_docs
    ORDER BY r.source, r.rk
    """,
    "llm",
    "curation",
    "sampling",
)
def s_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixture (alpha = 0.5): each source's
    share of the kept corpus ∝ sqrt(its total chars) — the standard
    upweight-the-tail trick for multilingual / multi-domain training
    mixes.  The kept set per source is the top-`target` documents in
    content-hash order, so the sample is reproducible across engines,
    partitionings, and re-runs (auditable lineage).

    The +0.0001 pad before floor() absorbs summation-order ULP noise
    in the share so the target count is stable.  Spark shape: the
    per-source targets are a tiny broadcast; ranking is one shuffle
    partitioned by source."""
    docs = table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(F.sum("n_chars").alias("tot_chars"))
    w = per_src.select(
        "source", "tot_chars", F.sqrt(F.col("tot_chars").cast("double")).alias("wt")
    )
    tot = w.agg(F.sum("wt").alias("sw"))
    tgt = w.crossJoin(F.broadcast(tot)).select(
        "source",
        F.greatest(
            F.lit(1).cast("bigint"),
            F.floor(F.col("wt") / F.col("sw") * _ALPHA_KEEP + 0.0001),
        ).alias("target_docs"),
    )
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
    )
    ranked = docs.select("doc_id", "source", rk.alias("rk"))
    return (
        ranked.join(F.broadcast(tgt), "source")
        .filter(F.col("rk") <= F.col("target_docs"))
        .select("doc_id", "source", "rk")
        .orderBy("source", "rk")
    )


@register(
    "tx_collapse_repeats",
    f"""
    WITH tokd AS ({_SQL_TOKD}),
    kept AS (
      SELECT doc_id, t,
             list_transform(
               list_filter(generate_series(1, len(t)), i -> i = 1 OR t[i] <> t[i-1]),
               i -> t[i]) AS k
      FROM tokd
    )
    SELECT doc_id, len(t) AS n_tokens, len(k) AS n_kept,
           substr(array_to_string(k, ' '), 1, 60) AS cleaned_prefix
    FROM kept ORDER BY doc_id
    """,
    "llm",
    "curation",
    "quality",
)
def tx_collapse_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-repeat collapse ("the the the" → "the"): the
    cheapest Gopher-style repetition cleanup, as a pure positional
    array-lambda — narrow map, no shuffle, stays in codegen."""
    docs = table(spark, sf_dir, "documents")
    return C.collapse_repeats(docs).orderBy("doc_id")


@register(
    "prof_doclen_histogram",
    f"""
    WITH b AS (
      SELECT CAST(floor(n_chars / 50.0) AS INTEGER) AS bucket FROM documents
    ),
    cells AS (SELECT bucket, count(*) AS cnt FROM b GROUP BY bucket),
    tot AS (SELECT sum(cnt) AS total FROM cells)
    SELECT bucket, cnt, {sql_igrid('cnt / CAST(total AS DOUBLE)', 6)} AS share_e6
    FROM cells CROSS JOIN tot ORDER BY bucket
    """,
    "llm",
    "curation",
    "agg",
)
def prof_doclen_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length profile: fixed-width (50-char) histogram with
    corpus share per bucket — the standard pre-filter profiling view
    (truncation candidates, length outliers).  One map-side-combined
    groupBy; the bucket count, not the corpus, is what shuffles."""
    docs = table(spark, sf_dir, "documents")
    cells = (
        docs.select(F.floor(F.col("n_chars") / 50.0).cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = cells.agg(F.sum("cnt").alias("total"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "cnt",
            igrid(F.col("cnt") / F.col("total").cast("double"), 6).alias("share_e6"),
        )
        .orderBy("bucket")
    )


_EVAL_SRC = "src0"  # held-out split used as the "eval benchmark" set
_DECON_N = 5  # n-gram length for contamination matching

# distinct word 5-grams of every document, tagged with its source —
# shared by the exact and the bloom-filter decontamination oracles
_SQL_GRAMS = f"""
    tokd AS ({_SQL_TOKD}),
    grams AS (
      SELECT d.doc_id, d.source, g.g
      FROM (SELECT t.doc_id, doc.source, t.t
            FROM tokd t JOIN documents doc ON t.doc_id = doc.doc_id) d,
      LATERAL (
        SELECT unnest(list_distinct(list_transform(
          generate_series(1, greatest(len(d.t) - {_DECON_N - 1}, 0)),
          i -> d.t[i] || ' ' || d.t[i+1] || ' ' || d.t[i+2] || ' ' || d.t[i+3] || ' ' || d.t[i+4]
        ))) AS g
      ) g
    )"""


@register(
    "tx_decontaminate",
    f"""
    WITH {_SQL_GRAMS},
    eval_grams AS (SELECT doc_id, g FROM grams WHERE source = '{_EVAL_SRC}'),
    train_grams AS (SELECT DISTINCT g FROM grams WHERE source <> '{_EVAL_SRC}'),
    hits AS (
      SELECT e.doc_id,
             count(*) AS n_grams,
             CAST(sum(CASE WHEN t.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
      FROM eval_grams e LEFT JOIN train_grams t ON e.g = t.g
      GROUP BY e.doc_id
    )
    SELECT doc_id, n_grams, n_hit,
           {sql_igrid('n_hit / CAST(n_grams AS DOUBLE)', 4)} AS contamination_e4,
           CAST({sql_igrid('n_hit / CAST(n_grams AS DOUBLE)', 4)} >= 5000 AS INTEGER) AS flagged
    FROM hits ORDER BY doc_id
    """,
    "llm",
    "curation",
    "dedup",
)
def tx_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: for every document of the held-out
    eval split (source = src0), the fraction of its distinct word
    5-grams that appear anywhere in the train split — the standard
    train/test overlap audit run before training on a scraped corpus.

    Spark shape: distinct train grams and eval grams shuffle once on
    the gram key (both map-side combined); the overlap is a left join
    on that same key, so all three exchanges co-partition.  At 100 TB
    the train side is the big one — production pipelines swap the
    exact distinct for a bloom filter (might_contain) built in one
    pass; the exact join here is the oracle-checkable reference
    semantics."""
    from finance_etl_pipeline_spark.operators.dedup import (
        shingles_expr,
        tokens_expr,
    )

    docs = spread(table(spark, sf_dir, "documents"))
    grams = docs.select(
        "doc_id",
        "source",
        F.explode(shingles_expr(tokens_expr(), n=_DECON_N)).alias("g"),
    )
    eval_grams = grams.filter(F.col("source") == _EVAL_SRC).select("doc_id", "g")
    train_grams = (
        grams.filter(F.col("source") != _EVAL_SRC).select("g").distinct()
    )
    marked = eval_grams.join(
        train_grams.withColumn("__hit", F.lit(1)), "g", "left"
    )
    contamination = igrid(
        F.sum(F.coalesce("__hit", F.lit(0)))
        / F.count(F.lit(1)).cast("double"),
        4,
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_hit"),
            contamination.alias("contamination_e4"),
            (contamination >= 5000).cast("int").alias("flagged"),
        )
        .orderBy("doc_id")
    )


_BLOOM_M = 1 << 22  # bloom positions: ~6 bits/element headroom at sf0.1
#   (sizing rule at real scale: M ≈ 10–15 bits per expected train gram;
#   the oracle interpolates the constant, so resizing stays cross-engine)
_BLOOM_K = 3  # hash functions per gram
# Kirsch–Mitzenmacher double hashing: ONE md5 per gram, the K
# positions derived arithmetically as (h1 + i·h2) mod M with h1 the
# low 22 bits and h2 an odd stride from the next 21 — same bloom
# guarantees (Kirsch & Mitzenmacher 2006), 3× fewer md5 evaluations
# (measured: the md5 over 5-gram strings dominated the stage).
_SQL_POS = (
    f"((h % {_BLOOM_M}) + i * (2 * ((h >> 22) % {_BLOOM_M // 2}) + 1))"
    f" % {_BLOOM_M}"
)


@register(
    "tx_decontaminate_bloom",
    f"""
    WITH {_SQL_GRAMS},
    hashed AS (
      SELECT doc_id, source, g, {sql_hash60('g')} AS h FROM grams
    ),
    posed AS (
      SELECT doc_id, source, g, {_SQL_POS} AS pos
      FROM hashed, range(0, {_BLOOM_K}) t(i)
    ),
    train_pos AS (
      SELECT DISTINCT pos FROM posed WHERE source <> '{_EVAL_SRC}'
    ),
    per_gram AS (
      SELECT e.doc_id, e.g,
             CAST(sum(CASE WHEN t.pos IS NOT NULL THEN 1 ELSE 0 END) = {_BLOOM_K}
                  AS INTEGER) AS hit
      FROM (SELECT doc_id, g, pos FROM posed WHERE source = '{_EVAL_SRC}') e
      LEFT JOIN train_pos t ON e.pos = t.pos
      GROUP BY e.doc_id, e.g
    ),
    agg AS (
      SELECT doc_id, count(*) AS n_grams,
             CAST(sum(hit) AS BIGINT) AS n_hit
      FROM per_gram GROUP BY doc_id
    )
    SELECT doc_id, n_grams, n_hit,
           {sql_igrid('n_hit / CAST(n_grams AS DOUBLE)', 4)} AS contamination_e4,
           CAST({sql_igrid('n_hit / CAST(n_grams AS DOUBLE)', 4)} >= 5000 AS INTEGER) AS flagged
    FROM agg ORDER BY doc_id
    """,
    "llm",
    "curation",
    "dedup",
    "bench",
)
def tx_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination — the 100 TB path the exact
    variant's docstring promises.  The train side is reduced to an
    ACTUAL BIT ARRAY of M = 2^22 bits (each gram sets K=3 md5-derived
    positions mod M), materialized as ≤ M/64 = 2^16 (word, bits)
    rows via a map-side-combining ``bit_or`` aggregate — train-side
    state is O(M) = 512 KiB regardless of corpus size, where
    ``tx_decontaminate``'s exact DISTINCT holds every train gram
    (billions at 100 TB).  Eval grams probe by a BROADCAST join of
    their K position words against the bitmap — the probe side never
    shuffles for membership, and the broadcast is bounded by the
    CONSTANT M/64, not by any input cardinality.  (A position-set
    DISTINCT + shuffle join — the previous formulation — shuffles
    up to min(K·|train grams|, M) rows instead; the bitmap form
    replaces that with 2^16 words and is strictly smaller from
    sf0.1 upward.)

    Bloom semantics are real: no false negatives (every truly
    contaminated gram hits — pytest asserts n_hit ≥ the exact query's
    per-doc counts), and false positives at rate ≈ (1−e^{-Kn/M})^K —
    acceptable for decontamination, which over-removes by design.
    Deterministic md5 position hashes make even the FP pattern
    bit-identical cross-engine, so this approximate operator still
    carries an exact DuckDB oracle (stated as the equivalent
    position-SET membership — bit k of word w is set iff position
    64·w+k is in the set, so hit counts are identical by
    construction)."""
    from finance_etl_pipeline_spark.operators.dedup import (
        hash60_expr,
        shingles_expr,
        tokens_expr,
    )

    docs = spread(table(spark, sf_dir, "documents"))
    grams = docs.select(
        "doc_id",
        "source",
        F.explode(shingles_expr(tokens_expr(), n=_DECON_N)).alias("g"),
    )
    hashed = grams.withColumn("h", hash60_expr(F.col("g")))
    h1 = F.col("h") % _BLOOM_M
    stride = F.shiftright("h", 22) % (_BLOOM_M // 2) * 2 + 1
    positions = F.array(
        *[(h1 + i * stride) % _BLOOM_M for i in range(_BLOOM_K)]
    )
    posed = hashed.select(
        "doc_id", "source", "g", F.explode(positions).alias("pos")
    )
    # the source filters push down to the parquet scan on both
    # branches, so train and eval rows are each exploded exactly once
    bitmap = (
        posed.filter(F.col("source") != _EVAL_SRC)
        .select(
            F.shiftright("pos", 6).alias("w"),
            F.expr(
                "shiftleft(cast(1 as bigint), cast(pos % 64 as int))"
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
    )
    eval_pos = posed.filter(F.col("source") == _EVAL_SRC).select(
        "doc_id", "g", "pos", F.shiftright("pos", 6).alias("w")
    )
    # bit k of a missing word is 0 (NULL bits); shiftright's sign
    # extension only touches bits above position 0 after the shift,
    # so `& 1` reads the probed bit exactly
    hit_bit = F.expr(
        "cast(shiftright(coalesce(bits, cast(0 as bigint)),"
        " cast(pos % 64 as int)) & 1 as int)"
    )
    per_gram = (
        eval_pos.join(F.broadcast(bitmap), "w", "left")
        .groupBy("doc_id", "g")
        .agg((F.sum(hit_bit) == _BLOOM_K).cast("int").alias("hit"))
    )
    contamination = igrid(
        F.sum("hit") / F.count(F.lit(1)).cast("double"), 4
    )
    return (
        per_gram.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("hit").cast("long").alias("n_hit"),
            contamination.alias("contamination_e4"),
            (contamination >= 5000).cast("int").alias("flagged"),
        )
        .orderBy("doc_id")
    )


_PACK_BUDGET = 128  # tokens per packed training sequence


@register(
    "tx_pack_sequences",
    f"""
    WITH {_SQL_CHUNKS},
    numbered AS (
      SELECT c.doc_id, c.chunk_idx, c.n_tokens, d.source,
             sum(c.n_tokens) OVER (
               PARTITION BY d.source ORDER BY c.doc_id, c.chunk_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - c.n_tokens AS tokens_before
      FROM chunks c JOIN documents d ON c.doc_id = d.doc_id
    )
    SELECT source, CAST(tokens_before // {_PACK_BUDGET} AS BIGINT) AS seq_id,
           count(*) AS n_chunks, CAST(sum(n_tokens) AS BIGINT) AS tokens
    FROM numbered
    GROUP BY source, seq_id
    ORDER BY source, seq_id
    """,
    "llm",
    "curation",
)
def tx_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign chunks (in stable corpus order, per
    source) to fixed token-budget training sequences by cumulative
    token count — the batching step between chunking and tokenized
    shards.  Deterministic because the order key (doc_id, chunk_idx)
    is unique; the budget boundary may split a chunk's tokens across
    sequences exactly like streaming packers do.

    Spark shape: one window cumsum partitioned by source, then a tiny
    (source × seq) aggregate.  At scale the window partitions by
    source shard — the same key the mixture resampler uses, so the
    two stages co-partition."""
    docs = table(spark, sf_dir, "documents")
    ch = C.chunk_table(docs)
    numbered = ch.join(docs.select("doc_id", "source"), "doc_id").withColumn(
        "tokens_before",
        F.sum("n_tokens").over(
            Window.partitionBy("source")
            .orderBy("doc_id", "chunk_idx")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - F.col("n_tokens"),
    )
    return (
        numbered.groupBy(
            "source",
            F.floor(F.col("tokens_before") / _PACK_BUDGET).alias("seq_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("tokens"),
        )
        .orderBy("source", "seq_id")
    )


@register(
    "s_stride_interleave",
    f"""
    WITH per_src AS (
      SELECT source, sum(n_chars) AS tot_chars FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, sqrt(CAST(tot_chars AS DOUBLE)) AS wt FROM per_src
    ),
    ranked AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    ),
    keyed AS (
      SELECT r.doc_id, r.source,
             {sql_round(
               '(r.rn - 0.5) / (w.wt / (SELECT sum(wt) FROM w))', 4
             )} AS skey
      FROM ranked r JOIN w ON r.source = w.source
    ),
    dec AS (
      SELECT source, ntile(10) OVER (ORDER BY skey, doc_id) AS decile
      FROM keyed
    )
    SELECT decile, source, count(*) AS n_docs
    FROM dec GROUP BY 1, 2 ORDER BY decile, source
    """,
    "llm",
    "curation",
    "sampling",
)
def s_stride_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stride-interleaved training-stream schedule: each
    source emits documents at stride 1/weight (weight ∝ sqrt of its
    char volume — the same alpha=0.5 temperature as the resampler), so
    EVERY prefix of the schedule approximates the target mixture — the
    property batch-wise training needs that a sorted-by-source corpus
    lacks.  Emitted as the (decile × source) composition so the
    near-uniform mixture across schedule deciles is the checked
    artifact.

    Determinism: per-source ranks are content-hash ordered; the
    schedule key (rn − ½)/w is frounded at 4 dp (key magnitudes ~10⁴,
    double ulp ~10⁻¹²: a safety margin of 10⁸) and ties break by
    doc_id, so the total order — and hence every ntile boundary — is
    bit-stable across engines.

    Scale: ranking shuffles once on source; the key is a narrow map;
    the global ntile is a single range-partitioned sort, the same cost
    as any global ordering, and the final aggregate is
    deciles × sources rows."""
    docs = table(spark, sf_dir, "documents")
    w = (
        docs.groupBy("source")
        .agg(F.sum("n_chars").alias("tot_chars"))
        .select(
            "source", F.sqrt(F.col("tot_chars").cast("double")).alias("wt")
        )
    )
    sw = w.agg(F.sum("wt").alias("sw"))
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
    )
    ranked = docs.select("doc_id", "source", rn.alias("rn"))
    keyed = (
        ranked.join(F.broadcast(w), "source")
        .crossJoin(F.broadcast(sw))
        .select(
            "doc_id",
            "source",
            fround(
                (F.col("rn") - 0.5) / (F.col("wt") / F.col("sw")), 4
            ).alias("skey"),
        )
    )
    dec = keyed.select(
        "source",
        F.ntile(10).over(Window.orderBy("skey", "doc_id")).alias("decile"),
    )
    return (
        dec.groupBy("decile", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("decile", "source")
    )


_QPSI_BINS = 10  # deciles of the reference cohort


@register(
    "drift_psi_quantile",
    f"""
    WITH split AS (
      SELECT value, event_id % 2 AS grp FROM events
    ),
    bl AS (
      -- list-param quantile: DuckDB requires constant quantile args
      SELECT quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS ls
      FROM split WHERE grp = 0
    ),
    breaks AS (
      SELECT i, {sql_round('ls[CAST(i AS INTEGER)]', 4)} AS brk
      FROM bl, range(1, {_QPSI_BINS}) t(i)
    ),
    binned AS (
      SELECT s.grp,
             CAST(coalesce(
               (SELECT min(b.i) - 1 FROM breaks b WHERE s.value < b.brk),
               {_QPSI_BINS - 1}) AS INTEGER) AS bin
      FROM split s
    ),
    cells AS (
      SELECT bin,
             CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM binned GROUP BY bin
    ),
    tot AS (SELECT sum(ca) AS ta, sum(cb) AS tb FROM cells)
    SELECT bin, ca, cb,
           {sql_igrid(f'''((ca + 1) / CAST(ta + {_QPSI_BINS} AS DOUBLE)
              - (cb + 1) / CAST(tb + {_QPSI_BINS} AS DOUBLE))
            * ln(((ca + 1) / CAST(ta + {_QPSI_BINS} AS DOUBLE))
               / ((cb + 1) / CAST(tb + {_QPSI_BINS} AS DOUBLE)))''', 6)} AS psi_term_e6
    FROM cells CROSS JOIN tot
    ORDER BY bin
    """,
    "llm",
    "curation",
    "events",
)
def drift_psi_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI drift on QUANTILE bins: breakpoints are the reference
    cohort's deciles, so every reference bin holds ~10% of its mass —
    the production PSI formulation (fixed-width bins, as in
    ``drift_psi_events``, go degenerate when the value range shifts
    or is heavy-tailed).  Bin rule: value < decile_i → bin i-1, else
    top bin; breakpoints are frounded at 4 dp before binning so the
    assignment is engine-exact.

    Spark shape: ONE percentile aggregate over the reference cohort
    (breakpoints broadcast as 9 rows via a literal-free cross join),
    binning is a narrow map (width_bucket-style CASE), and the cell
    aggregate is map-side combined to ≤ 10 rows per partition —
    identical cost to the fixed-width monitor at any scale."""
    e = table(spark, sf_dir, "events")
    split = e.select("value", (F.col("event_id") % 2).alias("grp"))
    probs = [i / _QPSI_BINS for i in range(1, _QPSI_BINS)]
    # ONE array-percentile aggregate: nine scalar percentile() calls
    # would each buffer the full reference cohort independently
    parr = F.expr(
        "percentile(value, array(" + ", ".join(str(p) for p in probs) + "))"
    )
    breaks = (
        split.filter(F.col("grp") == 0)
        .agg(parr.alias("ps"))
        .select(
            *[
                fround(F.element_at("ps", i), 4).alias(f"b{i}")
                for i in range(1, _QPSI_BINS)
            ]
        )
    )
    # bin = count of breakpoints <= value  (equiv. of the SQL min-i rule)
    bin_expr = sum(
        [
            F.when(F.col("value") >= F.col(f"b{i}"), 1).otherwise(0)
            for i in range(1, _QPSI_BINS)
        ],
        F.lit(0),
    ).cast("int")
    binned = split.crossJoin(F.broadcast(breaks)).select(
        "grp", bin_expr.alias("bin")
    )
    cells = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    tot = cells.agg(F.sum("ca").alias("ta"), F.sum("cb").alias("tb"))
    pa = (F.col("ca") + 1) / (F.col("ta") + _QPSI_BINS).cast("double")
    pb = (F.col("cb") + 1) / (F.col("tb") + _QPSI_BINS).cast("double")
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "ca",
            "cb",
            igrid((pa - pb) * F.log(pa / pb), 6).alias("psi_term_e6"),
        )
        .orderBy("bin")
    )


_PAD_BUCKET = 32  # tokens per length-bucket step


@register(
    "tx_padding_efficiency",
    f"""
    WITH tokd AS (
      SELECT doc_id, len(string_split_regex(lower(text), '\\s+')) AS n_toks
      FROM documents
    ),
    stats AS (SELECT max(n_toks) AS max_toks FROM tokd),
    bucketed AS (
      SELECT n_toks,
             CAST(ceil(n_toks / {_PAD_BUCKET}.0) * {_PAD_BUCKET} AS BIGINT)
               AS bucket_len,
             max_toks
      FROM tokd CROSS JOIN stats
    )
    SELECT bucket_len,
           count(*) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS real_tokens,
           CAST(sum(bucket_len - n_toks) AS BIGINT) AS pad_tokens,
           {sql_igrid('sum(bucket_len - n_toks) / CAST(sum(bucket_len) AS DOUBLE)', 6)}
             AS pad_share_e6,
           CAST(sum(max_toks - n_toks) AS BIGINT) AS naive_pad_tokens
    FROM bucketed
    GROUP BY bucket_len ORDER BY bucket_len
    """,
    "llm",
    "curation",
    "batching",
)
def tx_padding_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching efficiency: documents grouped into
    32-token length buckets, with the padding each bucket pays
    (bucket_len − n_toks per doc) next to the padding NAIVE global
    batching would pay (pad to the corpus max) — the report that
    justifies bucketed batch construction for training/serving (the
    complementary strategy to tx_pack_sequences' concatenation
    packing; bucketing preserves document boundaries, packing does
    not).

    Scale: one narrow token-count map, a broadcast 1-row max, and a
    |buckets|-row aggregate."""
    docs = spread(table(spark, sf_dir, "documents"))
    tokd = docs.select(
        "doc_id",
        F.size(F.split(F.lower("text"), r"\s+")).alias("n_toks"),
    )
    stats = tokd.agg(F.max("n_toks").alias("max_toks"))
    bucket_len = (
        F.ceil(F.col("n_toks") / float(_PAD_BUCKET)) * _PAD_BUCKET
    ).cast("long")
    bucketed = tokd.crossJoin(F.broadcast(stats)).select(
        "n_toks", bucket_len.alias("bucket_len"), "max_toks"
    )
    pad = F.sum(F.col("bucket_len") - F.col("n_toks"))
    return (
        bucketed.groupBy("bucket_len")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("long").alias("real_tokens"),
            pad.cast("long").alias("pad_tokens"),
            igrid(
                pad / F.sum("bucket_len").cast("double"), 6
            ).alias("pad_share_e6"),
            F.sum(F.col("max_toks") - F.col("n_toks"))
            .cast("long")
            .alias("naive_pad_tokens"),
        )
        .orderBy("bucket_len")
    )
