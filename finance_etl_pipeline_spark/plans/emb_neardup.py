"""Embedding-cosine near-duplicate pairs — the last dedup modality
(exact / MinHash / SimHash / n-gram Jaccard are text-side; this one
catches semantic dups that survive rewording).

The synthetic corpus is near-random (max off-diagonal cosine ≈ 0.51),
so the threshold is calibrated to 0.45 to keep the result set
non-trivial; production near-dup thresholds sit at 0.95+ on real
embedding spaces.  At this SF the pair join is brute force; at scale
the candidate set comes from ann_lsh_buckets / ann_ivf_topk cells
first (same pattern as the MinHash candidate restriction)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from finance_etl_pipeline_spark.functions.scalars import fround, igrid, sql_igrid, sql_round
from finance_etl_pipeline_spark.operators.similarity import as_double, dot, norm
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import spread, table

THRESHOLD = 0.45
KNN_K = 5


@register(
    "dd_embedding_neardup",
    f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    )
    SELECT * FROM (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             CAST(floor((list_dot_product(a.v, b.v) / nullif(a.nrm * b.nrm, 0.0)) * 10000 + 0.5001) AS BIGINT) AS cosine_e4
      FROM base a JOIN base b ON a.vec_id < b.vec_id
    ) WHERE cosine_e4 >= {int(THRESHOLD * 10000)}
    ORDER BY vec_a, vec_b
    """,
    "llm",
    "dedup",
    "similarity",
)
def dd_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All embedding pairs with cosine ≥ threshold (vec_a < vec_b)."""
    emb = table(spark, sf_dir, "embeddings")
    base = spread(emb).select(
        "vec_id",
        as_double(F.col("embedding")).alias("v"),
        norm(as_double(F.col("embedding"))).alias("nrm"),
    )
    a = base.select(
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cosine = igrid(
        dot(F.col("va"), F.col("vb")) / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0)),
        4,
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cosine.alias("cosine_e4"))
        .filter(F.col("cosine_e4") >= int(THRESHOLD * 10000))
        .orderBy("vec_a", "vec_b")
    )


@register(
    "emb_threshold_calibration",
    f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    ),
    cos AS (
      SELECT floor((list_dot_product(a.v, b.v)
                    / nullif(a.nrm * b.nrm, 0.0)) * 10000 + 0.5001) / 10000 AS cosine
      FROM base a JOIN base b ON a.vec_id < b.vec_id
    ),
    binned AS (
      -- zero-norm vectors make cosine NULL; drop them — Spark and SQL
      -- disagree on NULL placement under ORDER BY, and a NULL bin
      -- would silently distort every cumulative count
      SELECT CAST(floor(cosine * 20) AS INTEGER) AS bin, count(*) AS n_pairs
      FROM cos WHERE cosine IS NOT NULL GROUP BY 1
    )
    SELECT bin,
           CAST(bin * 500 AS BIGINT) AS edge_lo_e4,
           n_pairs,
           CAST(sum(n_pairs) OVER (ORDER BY bin DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_pairs_from_top
    FROM binned ORDER BY bin
    """,
    "llm",
    "similarity",
    "profile",
)
def emb_threshold_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup threshold calibration curve: histogram of pairwise
    cosines in 0.05-wide bins with the cumulative pair count above
    each bin — the gauge read before choosing the dedup threshold
    (how many pairs does 0.95 vs 0.90 remove?).

    Spark shape: the n² pair cosine is the same ground-truth join as
    ``dd_embedding_neardup``; the calibration tail is a ~40-row
    aggregate + window.  At corpus scale the pair source swaps to the
    LSH/IVF candidate machinery and the curve becomes candidates-only
    (the region above any plausible threshold — exactly the part the
    decision needs)."""
    emb = table(spark, sf_dir, "embeddings")
    base = spread(emb).select(
        "vec_id",
        as_double(F.col("embedding")).alias("v"),
        norm(as_double(F.col("embedding"))).alias("nrm"),
    )
    a = base.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cosine = fround(
        dot(F.col("va"), F.col("vb"))
        / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0)),
        4,
    )
    binned = (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(F.floor(cosine * 20).cast("int").alias("bin"))
        .filter(F.col("bin").isNotNull())
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    w = (
        Window.orderBy(F.desc("bin"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return binned.select(
        "bin",
        (F.col("bin") * 500).cast("long").alias("edge_lo_e4"),
        "n_pairs",
        F.sum("n_pairs").over(w).cast("long").alias("cum_pairs_from_top"),
    ).orderBy("bin")


@register(
    "emb_knn_label_accuracy",
    f"""
    WITH base AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS anchor, a.label AS actual,
             b.vec_id AS nb_id, b.label AS nb_label,
             {sql_round(
               'list_dot_product(a.v, b.v) / nullif(a.nrm * b.nrm, 0.0)', 6
             )} AS cosine
      FROM base a JOIN base b ON a.vec_id <> b.vec_id
    ),
    knn AS (
      SELECT anchor, actual, nb_label,
             row_number() OVER (PARTITION BY anchor
                                ORDER BY cosine DESC, nb_id) AS rk
      FROM pairs
    ),
    votes AS (
      SELECT anchor, actual, nb_label, count(*) AS cnt
      FROM knn WHERE rk <= {KNN_K}
      GROUP BY anchor, actual, nb_label
    ),
    pick AS (
      SELECT anchor, actual, nb_label AS pred,
             row_number() OVER (PARTITION BY anchor
                                ORDER BY cnt DESC, nb_label) AS vrk
      FROM votes
    )
    SELECT actual AS label, count(*) AS n,
           CAST(sum(CASE WHEN pred = actual THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           {sql_igrid(
             'sum(CASE WHEN pred = actual THEN 1 ELSE 0 END)'
             ' / CAST(count(*) AS DOUBLE)', 4
           )} AS accuracy_e4
    FROM pick WHERE vrk = 1 GROUP BY actual ORDER BY actual
    """,
    "llm",
    "ann",
    "eval",
)
def emb_knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label-agreement eval (k=5, cosine, self excluded): for each
    vector take its 5 nearest neighbors, majority-vote their labels,
    and report per-label accuracy — the standard embedding-quality
    probe (does the space cluster by label?), complementing the
    centroid classifier (``emb_centroid_classify``) which only tests
    linear separability around class means.

    Determinism: cosine frounded at 6 dp before ranking, neighbor rank
    ties break by vec_id, vote ties by label — both row_numbers are
    bit-stable across engines.

    Spark shape: brute-force n² pair join at test SF as correctness
    ground truth (same posture as ``dd_embedding_neardup``); at corpus
    scale the pair generation swaps to the LSH/IVF/PQ candidate sets
    (``ann_lsh_buckets`` / ``ann_ivf_topk`` / ``ann_pq_adc_topk``) —
    the rank + vote + accuracy tail is unchanged.  Both shuffles
    (rank partition, vote partition) key on anchor vec_id: high
    cardinality, uniform, skew-free."""
    emb = table(spark, sf_dir, "embeddings")
    base = spread(emb).select(
        "vec_id",
        "label",
        as_double(F.col("embedding")).alias("v"),
        norm(as_double(F.col("embedding"))).alias("nrm"),
    )
    a = base.select(
        F.col("vec_id").alias("anchor"),
        F.col("label").alias("actual"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = base.select(
        F.col("vec_id").alias("nb_id"),
        F.col("label").alias("nb_label"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cosine = fround(
        dot(F.col("va"), F.col("vb"))
        / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0)),
        6,
    )
    pairs = a.join(b, F.col("anchor") != F.col("nb_id")).select(
        "anchor", "actual", "nb_id", "nb_label", cosine.alias("cosine")
    )
    rk = F.row_number().over(
        Window.partitionBy("anchor").orderBy(F.desc("cosine"), "nb_id")
    )
    votes = (
        pairs.withColumn("rk", rk)
        .filter(F.col("rk") <= KNN_K)
        .groupBy("anchor", "actual", "nb_label")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vrk = F.row_number().over(
        Window.partitionBy("anchor").orderBy(F.desc("cnt"), "nb_label")
    )
    pick = (
        votes.withColumn("vrk", vrk)
        .filter(F.col("vrk") == 1)
        .select("anchor", "actual", F.col("nb_label").alias("pred"))
    )
    correct = F.sum(F.when(F.col("pred") == F.col("actual"), 1).otherwise(0))
    return (
        pick.groupBy(F.col("actual").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            correct.alias("n_correct"),
            igrid(
                correct / F.count(F.lit(1)).cast("double"), 4
            ).alias("accuracy_e4"),
        )
        .orderBy("label")
    )


@register(
    "emb_hard_negatives",
    f"""
    WITH base AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS anchor, a.label AS actual,
             b.vec_id AS other, b.label AS other_label,
             {sql_igrid(
               'list_dot_product(a.v, b.v) / nullif(a.nrm * b.nrm, 0.0)', 4
             )} AS cos_e4
      FROM base a JOIN base b ON a.vec_id <> b.vec_id
    ),
    pos AS (
      SELECT anchor, other AS pos_id, cos_e4 AS pos_cos_e4,
             row_number() OVER (PARTITION BY anchor
                                ORDER BY cos_e4 DESC, other) AS rk
      FROM pairs WHERE other_label = actual
    ),
    neg AS (
      SELECT anchor, other AS neg_id, cos_e4 AS neg_cos_e4,
             row_number() OVER (PARTITION BY anchor
                                ORDER BY cos_e4 DESC, other) AS rk
      FROM pairs WHERE other_label <> actual
    )
    SELECT p.anchor AS anchor, p.pos_id, p.pos_cos_e4,
           n.neg_id, n.neg_cos_e4,
           p.pos_cos_e4 - n.neg_cos_e4 AS margin_e4
    FROM pos p JOIN neg n ON p.anchor = n.anchor
    WHERE p.rk = 1 AND n.rk = 1
    ORDER BY anchor
    """,
    "llm",
    "similarity",
    "eval",
)
def emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive triplet mining: per anchor, the most-similar
    SAME-label vector (the natural positive) and the most-similar
    DIFFERENT-label vector (the hard negative), plus the margin
    between them — the batch-construction step for training/fine-
    tuning an embedding model with triplet or InfoNCE loss, and a
    diagnostic in its own right (negative margins = anchors whose
    nearest neighbor crosses the label boundary).

    Determinism: cosines land on the e4 integer grid BEFORE ranking,
    ties break by vec_id — both row_numbers are bit-stable.

    Spark shape: ground-truth n² pair join at test SF (same posture as
    ``emb_knn_label_accuracy``); at corpus scale the pair source swaps
    to the ANN candidate sets and the aggregate tail — one
    anchor-keyed hash aggregate over high-cardinality uniform keys —
    is unchanged."""
    emb = table(spark, sf_dir, "embeddings")
    base = spread(emb).select(
        "vec_id",
        "label",
        as_double(F.col("embedding")).alias("v"),
        norm(as_double(F.col("embedding"))).alias("nrm"),
    )
    return _hard_triplets(base)


def _hard_triplets(base: DataFrame) -> DataFrame:
    """Triplet mining over a ``(vec_id, label, v, nrm)`` frame —
    split out so the packed-argmax rewrite below can be pinned
    bit-equal to the window formulation it replaced on crafted edge
    corpora (tests/test_optimization_r12.py)."""
    a = base.select(
        F.col("vec_id").alias("anchor"),
        F.col("label").alias("actual"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = base.select(
        F.col("vec_id").alias("other"),
        F.col("label").alias("other_label"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cos_e4 = igrid(
        dot(F.col("va"), F.col("vb"))
        / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0)),
        4,
    )
    pairs = a.join(b, F.col("anchor") != F.col("other")).select(
        "anchor", "actual", "other", "other_label", cos_e4.alias("cos_e4")
    )
    # ONE hash aggregate instead of two windowed rank towers over the
    # same n² pair source — which evaluated the pair join (and every
    # dot product) TWICE, once per branch — plus a join-back.  The
    # argmax is encoded as a primitive-long max so the aggregate
    # hash-combines map-side (max over a struct, and max_by, both
    # plan as SortAggregate, which re-sorts the n² pair rows — A/B
    # measured 7.7 s vs 1.9 s at sf0.1):
    #
    #   pack = (cos_e4 + 20000) * 2^43 + (2^43 - 1 - other)
    #
    # max(pack) = highest cosine, then smallest `other` — exactly the
    # window's (desc(cos_e4), other) rk=1 row.  Exact by range:
    # cos_e4 = igrid(cosine, 4) ∈ [-10001, 10001] so the high part is
    # positive and ≤ 30001 < 2^15, and vec_id is a non-negative
    # sequence id ≪ 2^43 by the data model (the regression test pins
    # the bound); decode uses shiftright/bitwiseAND, integer-exact.
    # NULL cosines (zero-norm vectors) are ranked by the window's
    # desc-NULLS-LAST: they can win only when EVERY candidate on
    # their side is NULL, so they ride a separate min(other) that the
    # decode falls back to when no real cosine exists.  Rows whose
    # label test is NULL feed neither side, like the ==/!= filters
    # they replace; anchors missing either side drop with the inner
    # join they replace.  Bit-equal to the window formulation
    # (tests/test_optimization_r12.py::test_hard_negatives_*).
    _B = 1 << 43
    same = F.col("other_label") == F.col("actual")
    has_cos = F.col("cos_e4").isNotNull()
    pack = (F.col("cos_e4") + F.lit(20000)) * F.lit(_B) + (
        F.lit(_B - 1) - F.col("other")
    )

    def side(cond, tag):
        return [
            F.max(F.when(cond & has_cos, pack)).alias(f"{tag}m"),
            F.min(F.when(cond & ~has_cos, F.col("other"))).alias(
                f"{tag}0"
            ),
        ]

    agg = pairs.groupBy("anchor").agg(
        *side(same, "p"), *side(~same, "n")
    )

    def decode(tag, pref):
        m = F.col(f"{tag}m")
        oid = F.when(
            m.isNotNull(), F.lit(_B - 1) - m.bitwiseAND(F.lit(_B - 1))
        ).otherwise(F.col(f"{tag}0"))
        cos = F.shiftright(m, 43) - F.lit(20000)
        return oid.alias(f"{pref}_id"), cos.alias(f"{pref}_cos_e4")

    pos_id, pos_cos = decode("p", "pos")
    neg_id, neg_cos = decode("n", "neg")
    return (
        agg.filter(
            (F.col("pm").isNotNull() | F.col("p0").isNotNull())
            & (F.col("nm").isNotNull() | F.col("n0").isNotNull())
        )
        .select("anchor", pos_id, pos_cos, neg_id, neg_cos)
        .withColumn(
            "margin_e4", F.col("pos_cos_e4") - F.col("neg_cos_e4")
        )
        .orderBy("anchor")
    )


@register(
    "emb_norm_profile",
    f"""
    WITH base AS (
      SELECT label,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS nrm
      FROM embeddings
    )
    SELECT CAST(label AS INTEGER) AS label,
           count(*) AS n_vecs,
           CAST(sum(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero,
           {sql_igrid('min(nrm)', 6)} AS min_norm_e6,
           {sql_igrid('quantile_cont(nrm, 0.5)', 6)} AS p50_norm_e6,
           {sql_igrid('quantile_cont(nrm, 0.95)', 6)} AS p95_norm_e6,
           {sql_igrid('max(nrm)', 6)} AS max_norm_e6
    FROM base GROUP BY label ORDER BY label
    """,
    "llm",
    "similarity",
    "profile",
)
def emb_norm_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-norm health profile per label: vector counts,
    zero-norm degenerates (which silently null out every cosine they
    touch), and the norm distribution (min/median/p95/max) — the
    first screen run on a new embedding table before trusting ANN or
    dedup over it (collapsed or exploding norms signal a broken
    encoder or unnormalized mixture of checkpoints).

    Scale: one narrow dot-product map and a |labels|-row aggregate;
    exact percentiles swap for approx at extreme label cardinality."""
    emb = spread(table(spark, sf_dir, "embeddings"))
    nrm = norm(as_double(F.col("embedding")))
    base = emb.select(F.col("label").cast("int").alias("label"), nrm.alias("nrm"))
    return (
        base.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.when(F.col("nrm") == 0, 1).otherwise(0)).alias("n_zero"),
            igrid(F.min("nrm"), 6).alias("min_norm_e6"),
            igrid(
                F.element_at(F.expr("percentile(nrm, array(0.5, 0.95))"), 1),
                6,
            ).alias("p50_norm_e6"),
            igrid(
                F.element_at(F.expr("percentile(nrm, array(0.5, 0.95))"), 2),
                6,
            ).alias("p95_norm_e6"),
            igrid(F.max("nrm"), 6).alias("max_norm_e6"),
        )
        .orderBy("label")
    )


@register(
    "emb_class_separation",
    f"""
    WITH base AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v,
             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               AS nrm
      FROM embeddings
    ),
    pairs AS (
      SELECT a.label AS label_a, b.label AS label_b,
             CAST(floor((list_dot_product(a.v, b.v)
                         / nullif(a.nrm * b.nrm, 0.0)) * 10000 + 0.5001)
               AS BIGINT) AS cos_e4
      FROM base a JOIN base b ON a.vec_id < b.vec_id
    ),
    per_label AS (
      SELECT label_a AS label,
             sum(CASE WHEN label_a = label_b THEN cos_e4 ELSE 0 END) AS intra_sum,
             sum(CASE WHEN label_a = label_b THEN 1 ELSE 0 END) AS intra_n,
             sum(CASE WHEN label_a <> label_b THEN cos_e4 ELSE 0 END) AS inter_sum,
             sum(CASE WHEN label_a <> label_b THEN 1 ELSE 0 END) AS inter_n
      FROM (
        SELECT label_a, label_b, cos_e4 FROM pairs
        UNION ALL
        SELECT label_b, label_a, cos_e4 FROM pairs WHERE label_a <> label_b
      )
      GROUP BY label_a
    )
    SELECT CAST(label AS INTEGER) AS label,
           CAST(intra_n AS BIGINT) AS n_intra_pairs,
           CAST(inter_n AS BIGINT) AS n_inter_pairs,
           {sql_igrid('intra_sum / CAST(nullif(intra_n, 0) AS DOUBLE) / 10000', 6)}
             AS mean_intra_cos_e6,
           {sql_igrid('inter_sum / CAST(nullif(inter_n, 0) AS DOUBLE) / 10000', 6)}
             AS mean_inter_cos_e6,
           {sql_igrid(
               '''intra_sum / CAST(nullif(intra_n, 0) AS DOUBLE) / 10000
                  - inter_sum / CAST(nullif(inter_n, 0) AS DOUBLE) / 10000''',
               6)} AS separation_e6
    FROM per_label ORDER BY label
    """,
    "llm",
    "similarity",
    "eval",
)
def emb_class_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space class separability (silhouette-lite): per
    label, the mean pairwise cosine WITHIN the class vs the mean
    cosine TO other classes and their difference — positive
    separation means the space clusters by label, the go/no-go
    number before using these embeddings for classification or
    semantic dedup (complements emb_knn_label_accuracy's rank-based
    view with a magnitude-based one).

    Per-pair cosines are e4-gridded BEFORE the sums, so every mean
    divides exact integers.

    Spark shape: brute-force pairs at test SF as correctness ground
    truth (same posture as dd_embedding_neardup); at corpus scale the
    intra/inter means come from class centroids + per-class moments —
    one pass, no pairs."""
    emb = spread(table(spark, sf_dir, "embeddings"))
    base = emb.select(
        "vec_id",
        F.col("label").cast("int").alias("label"),
        as_double(F.col("embedding")).alias("v"),
        norm(as_double(F.col("embedding"))).alias("nrm"),
    )
    a = base.select(
        F.col("vec_id").alias("ida"),
        F.col("label").alias("label_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = base.select(
        F.col("vec_id").alias("idb"),
        F.col("label").alias("label_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cos_e4 = igrid(
        dot(F.col("va"), F.col("vb"))
        / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0)),
        4,
    )
    pairs = (
        a.join(b, F.col("ida") < F.col("idb"))
        .select("label_a", "label_b", cos_e4.alias("cos_e4"))
    )
    both = pairs.unionByName(
        pairs.filter(F.col("label_a") != F.col("label_b")).select(
            F.col("label_b").alias("label_a"),
            F.col("label_a").alias("label_b"),
            "cos_e4",
        )
    )
    intra = F.sum(
        F.when(F.col("label_a") == F.col("label_b"), F.col("cos_e4")).otherwise(0)
    )
    intra_n = F.sum(
        F.when(F.col("label_a") == F.col("label_b"), 1).otherwise(0)
    )
    inter = F.sum(
        F.when(F.col("label_a") != F.col("label_b"), F.col("cos_e4")).otherwise(0)
    )
    inter_n = F.sum(
        F.when(F.col("label_a") != F.col("label_b"), 1).otherwise(0)
    )
    mean_intra = intra / F.nullif(intra_n, F.lit(0)).cast("double") / 10000
    mean_inter = inter / F.nullif(inter_n, F.lit(0)).cast("double") / 10000
    return (
        both.groupBy(F.col("label_a").alias("label"))
        .agg(
            intra_n.cast("long").alias("n_intra_pairs"),
            inter_n.cast("long").alias("n_inter_pairs"),
            igrid(mean_intra, 6).alias("mean_intra_cos_e6"),
            igrid(mean_inter, 6).alias("mean_inter_cos_e6"),
            igrid(mean_intra - mean_inter, 6).alias("separation_e6"),
        )
        .orderBy("label")
    )
