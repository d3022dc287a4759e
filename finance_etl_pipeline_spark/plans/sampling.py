"""Deterministic sampling and split operators — LLM-pipeline staples
(corpus subsampling, stratified class balancing, train/val/test
assignment) that the reference has no equivalent of.

Random sampling (``df.sample``, ``TABLESAMPLE``) is engine-seeded and
not reproducible across engines or even across partitionings of the
same data, so every operator here derives its randomness from a
*content hash* (the shared md5→60-bit scheme of operators/dedup.py):
the same row always lands in the same sample/split regardless of
engine, partition layout, or cluster size — the property that makes
training-data lineage auditable.  That also makes every operator
oracle-checkable.

At 100 TB each operator is a stateless narrow map (hash + filter) —
no shuffle at all until the (tiny) per-stratum count aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.scalars import igrid, sql_hash60, sql_igrid
from finance_etl_pipeline_spark.operators.dedup import hash60_expr
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import spread, table

_SQL_H60 = sql_hash60("{x}")
_H_EVENT = _SQL_H60.format(x="CAST(event_id AS VARCHAR)")
_H_DOC = _SQL_H60.format(x="CAST(doc_id AS VARCHAR)")


@register(
    "s_hash_sample",
    f"""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE {_H_EVENT} % 100 < 10
    ORDER BY event_id
    """,
    "sampling",
)
def s_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample: hash(event_id) mod 100 < 10.
    Content-addressed, so re-runs, engine swaps, and repartitions all
    select the identical row set (unlike seeded df.sample, whose
    output depends on partition layout)."""
    e = table(spark, sf_dir, "events")
    h = hash60_expr(F.col("event_id").cast("string"))
    return (
        e.filter(h % 100 < 10)
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    )


@register(
    "s_stratified_sample",
    f"""
    WITH sampled AS (
      SELECT event_type
      FROM events
      WHERE {_H_EVENT} % 100 <
            CASE event_type WHEN 'purchase' THEN 50
                            WHEN 'click' THEN 5
                            ELSE 10 END
    )
    SELECT event_type, count(*) AS n_sampled
    FROM sampled GROUP BY event_type ORDER BY event_type
    """,
    "sampling",
    "agg",
)
def s_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified hash sampling: per-class rates (purchase 50%, click
    5%, else 10%) — the class-rebalancing primitive.  The rate map is
    a CASE expression, so the whole sample is still one narrow pass;
    emitted as per-stratum counts."""
    e = table(spark, sf_dir, "events")
    h = hash60_expr(F.col("event_id").cast("string"))
    rate = (
        F.when(F.col("event_type") == "purchase", 50)
        .when(F.col("event_type") == "click", 5)
        .otherwise(10)
    )
    return (
        e.filter((h % 100) < rate)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .orderBy("event_type")
    )


@register(
    "s_train_test_split",
    f"""
    WITH labeled AS (
      SELECT doc_id,
             CASE WHEN {_H_DOC} % 100 < 80 THEN 'train'
                  WHEN {_H_DOC} % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split, count(*) AS n_docs,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM labeled GROUP BY split ORDER BY split
    """,
    "sampling",
    "agg",
)
def s_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by content hash — stable
    under corpus growth (a doc's split never changes when other docs
    are added/removed, unlike percentile- or row_number-based splits)."""
    d = table(spark, sf_dir, "documents")
    h = hash60_expr(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(h < 80, "train").when(h < 90, "val").otherwise("test")
    )
    return (
        d.select("doc_id", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("split")
    )


@register(
    "s_weighted_sample",
    f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             CAST(floor(pow(({_H_DOC} % 1000000 + 1) / 1000000.0,
                       1.0 / n_chars) * 1e10 + 0.5001) AS BIGINT) AS k_e10
      FROM documents
    )
    SELECT doc_id, n_chars, k_e10
    FROM keyed
    ORDER BY k_e10 DESC, doc_id
    LIMIT 50
    """,
    "sampling",
)
def s_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): each row gets key u^(1/w) with u a
    content-hash uniform and w = n_chars; the top-k keys ARE a
    weighted sample.  Content-addressed randomness keeps the sample
    reproducible across engines/partitionings (cf. s_hash_sample);
    the key is rounded at 10 dp (doc_id tie-break) so cross-engine
    pow() ULPs cannot reorder the cut.  One narrow map + a TakeOrdered
    top-k — no shuffle of the corpus at any scale."""
    from finance_etl_pipeline_spark.functions.scalars import igrid

    docs = table(spark, sf_dir, "documents")
    u = (hash60_expr(F.col("doc_id").cast("string")) % 1000000 + 1) / 1000000.0
    k = igrid(F.pow(u, 1.0 / F.col("n_chars")), 10)
    return (
        docs.select("doc_id", "n_chars", k.alias("k_e10"))
        .orderBy(F.desc("k_e10"), "doc_id")
        .limit(50)
    )


_N_SHARDS = 16


@register(
    "s_shard_assignment",
    f"""
    WITH assigned AS (
      SELECT doc_id, source, n_chars,
             CAST({_SQL_H60.format(x="CAST(doc_id AS VARCHAR)")} % {_N_SHARDS}
                  AS INTEGER) AS shard
      FROM documents
    )
    SELECT shard,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           min(doc_id) AS min_doc
    FROM assigned GROUP BY shard ORDER BY shard
    """,
    "sampling",
    "llm",
    "agg",
)
def s_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output-shard assignment for tokenized training shards: each
    document lands in one of 16 shards by content hash, and the query
    reports per-shard balance (docs, char volume, source diversity).
    Hash sharding is what the write path partitions by
    (``write.partitionBy(shard)``), so this balance report is the
    pre-flight check that no output file will be a straggler.

    Determinism: the same md5-derived hash every split/sample op uses;
    a doc's shard never changes as the corpus grows.  One map-side-
    combined groupBy over 16 groups — nothing scales with the corpus
    but the narrow scan."""
    d = table(spark, sf_dir, "documents")
    shard = (hash60_expr(F.col("doc_id").cast("string")) % _N_SHARDS).cast(
        "int"
    )
    return (
        d.select("doc_id", "source", "n_chars", shard.alias("shard"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.min("doc_id").alias("min_doc"),
        )
        .orderBy("shard")
    )


_MIX_ALPHA = 0.7  # temperature exponent for source re-weighting


@register(
    "s_temperature_mixture",
    f"""
    WITH tokd AS (
      SELECT source, len(string_split_regex(lower(text), '\\s+')) AS n_toks
      FROM documents
    ),
    per_src AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(n_toks) AS BIGINT) AS n_tokens
      FROM tokd GROUP BY source
    ),
    tot AS (
      SELECT sum(pow(n_tokens, {_MIX_ALPHA})) AS z,
             sum(n_tokens) AS all_tokens
      FROM per_src
    )
    SELECT source, n_docs, n_tokens,
           {{w}} AS weight_e6,
           {{boost}} AS sampling_boost_e4
    FROM per_src CROSS JOIN tot
    ORDER BY source
    """.format(
        w=sql_igrid(f"pow(n_tokens, {_MIX_ALPHA}) / z", 6),
        boost=sql_igrid(
            f"pow(n_tokens, {_MIX_ALPHA}) / z"
            " / (CAST(n_tokens AS DOUBLE) / all_tokens)",
            4,
        ),
    ),
    "llm",
    "sampling",
    "mixture",
)
def s_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixture weights (multilingual-LM
    style): sampling weight ∝ tokens^0.7, normalized — the standard
    up-weighting of small sources / down-weighting of dominant ones
    before building a training mix.  ``sampling_boost`` is the
    weight relative to the natural (proportional) rate: > 1 means the
    source is over-sampled, the number that sets per-source repeat
    factors in the shuffle plan (s_mixture_resample executes such a
    plan; this query derives its inputs from a temperature policy).

    Scale: one narrow token-count map, a |sources|-row aggregate, and
    a broadcast 1-row normalizer.  pow() on exact integer token
    counts is a single IEEE operation — identical cross-engine."""
    docs = spread(table(spark, sf_dir, "documents"))
    per_src = (
        docs.select(
            "source", F.size(F.split(F.lower("text"), r"\s+")).alias("n_toks")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
    )
    tot = per_src.agg(
        F.sum(F.pow("n_tokens", F.lit(_MIX_ALPHA))).alias("z"),
        F.sum("n_tokens").alias("all_tokens"),
    )
    w = F.pow("n_tokens", F.lit(_MIX_ALPHA)) / F.col("z")
    natural = F.col("n_tokens").cast("double") / F.col("all_tokens")
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            igrid(w, 6).alias("weight_e6"),
            igrid(w / natural, 4).alias("sampling_boost_e4"),
        )
        .orderBy("source")
    )


from finance_etl_pipeline_spark.operators.text import STOPWORDS as _STOPWORDS

_SQL_STOPWORDS = "[" + ", ".join(f"'{w}'" for w in _STOPWORDS) + "]"

_KFOLDS = 5


@register(
    "s_kfold_assignment",
    f"""
    WITH folded AS (
      SELECT doc_id, source, n_chars,
             CAST({{h}} % {_KFOLDS} AS INTEGER) AS fold
      FROM documents
    )
    SELECT fold,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM folded GROUP BY fold ORDER BY fold
    """.format(h=sql_hash60("CAST(doc_id AS VARCHAR) || '#fold'")),
    "sampling",
    "ml",
)
def s_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation assignment (k=5) by
    content hash, with per-fold balance stats — the split that stays
    STABLE as the corpus grows (a new document never moves an old one
    between folds, unlike row_number % k under changing order), and
    identical on any engine or partitioning.  The '#fold' salt
    decorrelates this hash from the shard / train-test hashes so the
    splits are independent.

    Scale: one narrow hash map + a k-row aggregate."""
    d = table(spark, sf_dir, "documents")
    fold = (
        hash60_expr(F.concat(F.col("doc_id").cast("string"), F.lit("#fold")))
        % _KFOLDS
    ).cast("int")
    return (
        d.select("doc_id", "source", "n_chars", fold.alias("fold"))
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("fold")
    )


@register(
    "s_curriculum_order",
    f"""
    WITH t AS (SELECT doc_id, source,
                      string_split_regex(lower(text), '\\s+') AS toks,
                      length(text) AS n_chars
               FROM documents),
    m AS (
      SELECT doc_id, source,
             least(CAST(n_chars AS DOUBLE) / 500.0, 1.0) AS length_score,
             CAST(len(list_filter(toks, x -> list_contains({['the', 'a', 'of', 'and', 'in']}, x))) AS DOUBLE)
               / nullif(CAST(len(toks) AS DOUBLE), 0.0) AS stop_ratio,
             least((CAST(list_aggregate(list_transform(toks, x -> len(x)), 'sum') AS DOUBLE)
                    / nullif(CAST(len(toks) AS DOUBLE), 0.0)) / 8.0, 1.0) AS shape_score
      FROM t
    ),
    scored AS (
      SELECT doc_id, source,
             CAST(floor((0.4 * length_score + 0.3 * stop_ratio + 0.3 * shape_score)
                        * 10000 + 0.5001) AS BIGINT) AS q_e4
      FROM m
    ),
    ordered AS (
      SELECT doc_id, source, q_e4,
             row_number() OVER (ORDER BY q_e4 DESC, doc_id) AS position,
             ntile(10) OVER (ORDER BY q_e4 DESC, doc_id) AS phase
      FROM scored
    )
    SELECT phase,
           count(*) AS n_docs,
           CAST(min(position) AS BIGINT) AS first_position,
           CAST(min(q_e4) AS BIGINT) AS min_q_e4,
           CAST(max(q_e4) AS BIGINT) AS max_q_e4,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM ordered GROUP BY phase ORDER BY phase
    """.format(stop="['the', 'a', 'of', 'and', 'in']"),
    "sampling",
    "llm",
    "curation",
)
def s_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-curriculum schedule: documents ordered highest-quality
    first (the composite quality score of ``tx_quality_score``, on
    its integer grid, ties by id) and cut into 10 training phases —
    the cleanest-data-first curriculum used when a model's early
    steps are most sensitive to noise.  Per phase: size, schedule
    offset, quality range, and source diversity (a phase drawing
    from one source signals quality-vs-mixture tension).

    Scale: scoring is the scan-speed narrow map; the global ordering
    is |docs| rows through one window (percentile_approx phase edges
    at extreme scale — same swap as the ppl buckets)."""
    from finance_etl_pipeline_spark.operators.text import quality_score

    docs = spread(table(spark, sf_dir, "documents"))
    scored = quality_score(docs).select(
        "doc_id", F.col("quality_score_e4").alias("q_e4")
    ).join(docs.select("doc_id", "source"), "doc_id")
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("q_e4"), "doc_id")
    ordered = scored.select(
        "doc_id",
        "source",
        "q_e4",
        F.row_number().over(w).alias("position"),
        F.ntile(10).over(w).alias("phase"),
    )
    return (
        ordered.groupBy("phase")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("position").cast("long").alias("first_position"),
            F.min("q_e4").cast("long").alias("min_q_e4"),
            F.max("q_e4").cast("long").alias("max_q_e4"),
            F.countDistinct("source").cast("long").alias("n_sources"),
        )
        .orderBy("phase")
    )


_BUDGET_X = 4  # token budget as a multiple of the corpus size
_MAX_EPOCHS = 4  # diminishing-returns cap (Muennighoff et al. 2023)


@register(
    "s_epoch_plan",
    f"""
    WITH tokd AS (
      SELECT source, len(string_split_regex(lower(text), '\\s+')) AS n_toks
      FROM documents
    ),
    per_src AS (
      SELECT source, count(*) AS n_docs,
             CAST(sum(n_toks) AS BIGINT) AS n_tokens
      FROM tokd GROUP BY source
    ),
    tot AS (
      SELECT sum(pow(n_tokens, {_MIX_ALPHA})) AS z,
             sum(n_tokens) AS all_tokens
      FROM per_src
    ),
    plan AS (
      SELECT source, n_docs, n_tokens,
             {{tt}} AS target_tokens
      FROM per_src CROSS JOIN tot
    )
    SELECT source, n_docs, n_tokens, target_tokens,
           {{ep}} AS epochs_e4,
           {{cep}} AS capped_epochs_e4,
           CAST(greatest(target_tokens - {_MAX_EPOCHS} * n_tokens, 0) AS BIGINT)
             AS excess_tokens
    FROM plan
    ORDER BY source
    """.format(
        tt=sql_igrid(
            f"{_BUDGET_X} * all_tokens * pow(n_tokens, {_MIX_ALPHA}) / z", 0
        ),
        ep=sql_igrid("CAST(target_tokens AS DOUBLE) / n_tokens", 4),
        cep=sql_igrid(
            f"least(CAST(target_tokens AS DOUBLE) / n_tokens, {_MAX_EPOCHS})", 4
        ),
    ),
    "llm",
    "sampling",
    "mixture",
)
def s_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained epoch plan (Muennighoff et al. 2023, "Scaling
    Data-Constrained Language Models"): given a token budget of 4× the
    corpus and temperature-smoothed source weights (same τ=0.7 policy
    as s_temperature_mixture), how many PASSES over each source does
    the mix imply, where does it exceed the ~4-epoch
    diminishing-returns threshold, and how many target tokens per
    source are unfillable under the cap (excess_tokens — the demand a
    mixing run would have to redistribute to under-budget sources).
    This is the planning step between weight policy
    (s_temperature_mixture) and physical resampling
    (s_mixture_resample).

    Scale: one narrow token-count map, a |sources|-row aggregate, a
    1-row normalizer — driver-scale output regardless of corpus size.
    target_tokens is gridded to an exact BIGINT before the epochs
    division, so both engines divide identical integers (single IEEE
    divide; pow on exact integer counts, the s_temperature_mixture
    precedent)."""
    docs = spread(table(spark, sf_dir, "documents"))
    per_src = (
        docs.select(
            "source", F.size(F.split(F.lower("text"), r"\s+")).alias("n_toks")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
    )
    tot = per_src.agg(
        F.sum(F.pow("n_tokens", F.lit(_MIX_ALPHA))).alias("z"),
        F.sum("n_tokens").alias("all_tokens"),
    )
    w = F.pow("n_tokens", F.lit(_MIX_ALPHA)) / F.col("z")
    plan = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        igrid(F.lit(_BUDGET_X) * F.col("all_tokens") * w, 0).alias(
            "target_tokens"
        ),
    )
    epochs = F.col("target_tokens").cast("double") / F.col("n_tokens")
    return plan.select(
        "source",
        "n_docs",
        "n_tokens",
        "target_tokens",
        igrid(epochs, 4).alias("epochs_e4"),
        igrid(F.least(epochs, F.lit(float(_MAX_EPOCHS))), 4).alias(
            "capped_epochs_e4"
        ),
        F.greatest(
            F.col("target_tokens") - _MAX_EPOCHS * F.col("n_tokens"), F.lit(0)
        )
        .cast("long")
        .alias("excess_tokens"),
    ).orderBy("source")


def _leakage_safe_split_sql() -> str:
    from finance_etl_pipeline_spark.plans import REGISTRY

    clusters = REGISTRY["dd_dedup_clusters"].oracle
    h_group = _SQL_H60.format(x="CAST(group_id AS VARCHAR)")
    return f"""
    WITH c AS (SELECT doc_id, cluster_id FROM ({clusters})),
    g AS (
      SELECT d.doc_id,
             coalesce(c.cluster_id, d.doc_id) AS group_id,
             CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_clustered
      FROM documents d LEFT JOIN c ON d.doc_id = c.doc_id
    ),
    lab AS (
      SELECT doc_id, group_id, is_clustered,
             CASE WHEN {h_group} % 100 < 80 THEN 'train'
                  WHEN {h_group} % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM g
    )
    SELECT split,
           count(*) AS n_docs,
           count(DISTINCT group_id) AS n_groups,
           CAST(sum(is_clustered) AS BIGINT) AS n_clustered_docs
    FROM lab GROUP BY split ORDER BY split
    """


@register(
    "s_leakage_safe_split",
    _leakage_safe_split_sql(),
    "sampling",
    "llm",
    "dedup",
)
def s_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware train/val/test split: the split hash is taken
    over the DEDUP GROUP (connected-component cluster_id for
    clustered docs, own doc_id for singletons), so two near-duplicate
    documents can never land on opposite sides — the leakage mode a
    plain per-doc split (s_train_test_split) cannot prevent, and the
    reason eval numbers inflate when test data near-dups the training
    set.  By construction every group maps to exactly one split; the
    emitted per-split group/doc counts are the audit.

    Scale: the cluster pass is the production LSH pipeline
    (dd_dedup_clusters — duplication-density-bounded); the split
    itself is a left join on doc_id (co-partitioned, dup-bounded
    right side) plus a narrow hash map.  Content-addressed like every
    sampler here: adding new docs never moves an existing group."""
    from finance_etl_pipeline_spark.plans import REGISTRY

    labels = (
        REGISTRY["dd_dedup_clusters"]
        .fn(spark, sf_dir)
        .select("doc_id", "cluster_id")
    )
    docs = table(spark, sf_dir, "documents").select("doc_id")
    g = docs.join(labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").alias("group_id"),
        F.col("cluster_id").isNotNull().cast("int").alias("is_clustered"),
    )
    h = hash60_expr(F.col("group_id").cast("string")) % 100
    split = (
        F.when(h < 80, "train").when(h < 90, "val").otherwise("test")
    )
    return (
        g.select(split.alias("split"), "group_id", "is_clustered")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("group_id").alias("n_groups"),
            F.sum("is_clustered").cast("long").alias("n_clustered_docs"),
        )
        .orderBy("split")
    )


_N_BAL_SHARDS = 8
_N_BANDS = 8


def _shard_band_sql() -> str:
    bounds = ", ".join(
        f"floor(quantile_cont(n_chars, {j}.0/{_N_BANDS}) * 10000 + 0.5001) / 10000 AS b{j}"
        for j in range(1, _N_BANDS)
    )
    case = " ".join(
        f"+ CASE WHEN d.n_chars > b.b{j} THEN 1 ELSE 0 END"
        for j in range(1, _N_BANDS)
    )
    return f"""
    WITH b AS (SELECT {bounds} FROM documents),
    banded AS (
      SELECT d.doc_id, d.n_chars, 1 {case} AS band
      FROM documents d CROSS JOIN b
    ),
    assigned AS (
      SELECT doc_id, n_chars, band,
             (row_number() OVER (
                PARTITION BY band ORDER BY n_chars DESC, doc_id
              ) - 1) % {_N_BAL_SHARDS} AS shard
      FROM banded
    )
    SELECT shard,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM assigned
    GROUP BY shard
    ORDER BY shard
    """


@register(
    "s_size_balanced_shards",
    _shard_band_sql(),
    "sampling",
    "partitioning",
)
def s_size_balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-balanced shard assignment: round-robin docs into 8 shards
    by descending size WITHIN each of 8 size bands — the banded
    approximation of greedy longest-first bin packing that stays
    distributed: a truly global size rank would funnel the corpus
    through one window partition; banding on exact-percentile
    boundaries (the prof_range_partition_plan pattern) caps every
    window partition at corpus/8 and still lands each shard within
    one band-width of perfect char balance.  Use it to write
    equal-weight training shards instead of hash shards
    (s_shard_assignment) whose sizes drift with document-length
    variance.  Boundaries are e4-rounded so interpolation ULPs can't
    move a doc across bands."""
    d = table(spark, sf_dir, "documents")
    # one array-percentile buffer for all band edges
    _arr = F.expr(
        "percentile(n_chars, array("
        + ", ".join(
            f"cast({j}.0/{_N_BANDS} as double)" for j in range(1, _N_BANDS)
        )
        + "))"
    )
    b = d.agg(
        *[
            (
                F.floor(F.element_at(_arr, j) * 10000 + 0.5001) / 10000
            ).alias(f"b{j}")
            for j in range(1, _N_BANDS)
        ]
    )
    band = F.lit(1)
    for j in range(1, _N_BANDS):
        band = band + F.when(F.col("n_chars") > F.col(f"b{j}"), 1).otherwise(0)
    from pyspark.sql.window import Window

    w = Window.partitionBy("band").orderBy(F.desc("n_chars"), "doc_id")
    return (
        d.crossJoin(F.broadcast(b))
        .select("doc_id", "n_chars", band.alias("band"))
        .select(
            "n_chars",
            ((F.row_number().over(w) - 1) % _N_BAL_SHARDS).alias("shard"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
        .orderBy("shard")
    )


# Per-source document cap: keep the _SRC_CAP hash-smallest docs of
# each source (C4/RefinedWeb-style per-domain quota).  _CAP_BANDS
# order-preserving hash bands (top 8 bits of the 60-bit hash) bound
# the exact-rank window: only rows whose band prefix-count is still
# below the cap ever enter it.
_SRC_CAP = 40
_CAP_BANDS_SHIFT = 52


@register(
    "s_per_source_cap",
    f"""
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY {_H_DOC}, doc_id) AS rk
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN rk <= {_SRC_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN rk > {_SRC_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped,
           CAST(sum(CASE WHEN rk <= {_SRC_CAP} THEN doc_id ELSE 0 END)
                AS BIGINT) AS kept_doc_id_sum,
           CAST(sum(CASE WHEN rk <= {_SRC_CAP} THEN n_chars ELSE 0 END)
                AS BIGINT) AS kept_chars
    FROM ranked GROUP BY source ORDER BY source
    """,
    "llm",
    "sampling",
    "agg",
)
def s_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (the C4/RefinedWeb per-domain quota):
    keep at most _SRC_CAP docs per source, selected as the hash-
    smallest doc_ids — content-addressed, so the kept set is stable
    under re-runs, engine swaps, and corpus appends (a doc already
    kept can only be displaced by a new doc with a smaller hash, never
    by reordering).  Emits the per-source keep/drop accounting plus a
    kept-set checksum (sum of kept doc_ids) that pins the exact
    selection, not just its size.

    Scale: the naive form is a row_number window partitioned by
    source — an unbounded per-source sort at 100 TB (one hot domain
    can be billions of rows).  This plan instead bands the hash space
    order-preservingly (top 8 bits → 256 bands), aggregates per-band
    counts (map-side combined, |sources|×256 rows), prefix-sums them,
    and lets only rows whose band starts below the cap into the exact
    window: those are ≤ cap + |source|/256 rows per source by
    construction (prefix-closed, so ranks within the survivor set
    equal true ranks).  The same banded-prefix trick as
    ``drift_ks_value`` / ``prof_range_partition_plan``."""
    d = spread(table(spark, sf_dir, "documents"))
    from pyspark.sql.window import Window

    h = hash60_expr(F.col("doc_id").cast("string"))
    docs = d.select(
        "source",
        "doc_id",
        "n_chars",
        h.alias("h"),
        F.shiftright(h, _CAP_BANDS_SHIFT).alias("band"),
    )
    per_band = docs.groupBy("source", "band").agg(
        F.count(F.lit(1)).alias("n")
    )
    wb = (
        Window.partitionBy("source")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bands = per_band.select(
        "source",
        "band",
        F.coalesce(F.sum("n").over(wb), F.lit(0)).alias("cum_before"),
        "n",
    )
    # band offset table: ≤ |sources| × 256 rows — broadcast.
    j = docs.join(
        F.broadcast(bands.select("source", "band", "cum_before")),
        ["source", "band"],
    )
    # prefix-closed survivor set: every row of a band that starts at
    # or past the cap has true rank > cap and never enters the window.
    pre = j.filter(F.col("cum_before") < _SRC_CAP)
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    kept = pre.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= _SRC_CAP
    )
    tot = per_band.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs")
    )
    k = kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("doc_id").cast("long").alias("kept_doc_id_sum"),
        F.sum("n_chars").cast("long").alias("kept_chars"),
    )
    return (
        tot.join(k, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_docs") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
            F.coalesce("kept_doc_id_sum", F.lit(0))
            .cast("long")
            .alias("kept_doc_id_sum"),
            F.coalesce("kept_chars", F.lit(0))
            .cast("long")
            .alias("kept_chars"),
        )
        .orderBy("source")
    )
