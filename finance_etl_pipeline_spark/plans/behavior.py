"""Behavioral / evaluation analytics: ordered conversion funnels,
weekly retention cohorts, classifier confusion matrices, and
nearest-centroid embedding classification.

The product-analytics shapes (funnel, retention) exercise dependent
sequential aggregation — "first B AFTER the user's first A" — which
is the pattern that separates real funnel semantics from naive
per-type mins.  The evaluation shapes (confusion matrix,
nearest-centroid accuracy) are the label-quality checks an LLM-data
pipeline runs on its own heuristic classifiers.

Float determinism: every cross-engine float (centroid coordinates,
dot products) is locked with the shared fround contract BEFORE any
comparison or argmax, so ranking decisions are bit-identical in
Spark and DuckDB regardless of summation order.
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
from finance_etl_pipeline_spark.operators import text as T
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import table


@register(
    "e_funnel_conversion",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT 1 AS stage, 'view' AS name, count(*) AS users FROM v
    UNION ALL
    SELECT 2 AS stage, 'view>click' AS name, count(*) AS users FROM c
    UNION ALL
    SELECT 3 AS stage, 'view>click>purchase' AS name, count(*) AS users FROM p
    ORDER BY stage
    """,
    "events",
    "behavior",
)
def e_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: each stage
    counts users whose first qualifying event happens strictly AFTER
    their previous stage's first event (true sequential semantics,
    not three independent mins).

    Spark shape: three user-keyed aggregations, each joined to the
    previous stage's (user, ts) — all shuffles on user_id, so a
    cluster co-partitions them; each stage's input shrinks
    monotonically."""
    e = table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )

    def stage(df: DataFrame, n: int, name: str) -> DataFrame:
        return df.agg(
            F.lit(n).alias("stage"),
            F.lit(name).alias("name"),
            F.count(F.lit(1)).alias("users"),
        )

    return (
        stage(v, 1, "view")
        .unionAll(stage(c, 2, "view>click"))
        .unionAll(stage(p, 3, "view>click>purchase"))
        .orderBy("stage")
    )


@register(
    "e_retention_cohorts",
    """
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             date_diff('day', f.cohort_week, CAST(e.ts AS DATE)) // 7 AS week_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_week, week_offset, count(*) AS active_users
    FROM activity GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
    "events",
    "behavior",
)
def e_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users cohorted by the ISO week of
    their first event, counted once per (cohort, week-offset) they
    were active in.  The standard growth-accounting view.

    Spark shape: first-event aggregation and the activity distinct
    both shuffle on user_id (co-partitioned); the final aggregate is
    tiny (cohorts × offsets)."""
    e = table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("cohort_week")) / 7
            ).alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


def _sql_list(words: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


@register(
    "tx_langid_confusion",
    f"""
    WITH t AS (
      SELECT doc_id, lang, string_split_regex(lower(text), '\\s+') AS t FROM documents
    ),
    hits AS (
      SELECT doc_id, lang,
             len(list_filter(t, x -> list_contains({_sql_list(T.LEXICONS['A'])}, x))) AS ha,
             len(list_filter(t, x -> list_contains({_sql_list(T.LEXICONS['B'])}, x))) AS hb,
             len(list_filter(t, x -> list_contains({_sql_list(T.LEXICONS['C'])}, x))) AS hc
      FROM t
    )
    SELECT lang,
           CASE WHEN ha >= hb AND ha >= hc THEN 'A'
                WHEN hb >= hc THEN 'B'
                ELSE 'C' END AS predicted_lexicon,
           count(*) AS n
    FROM hits GROUP BY lang, predicted_lexicon
    ORDER BY lang, predicted_lexicon
    """,
    "llm",
    "behavior",
    "text",
)
def tx_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the lexicon-hit language classifier
    (tx_language_id) against the corpus's labeled `lang` column — the
    eval loop every heuristic labeler in a data pipeline needs.
    One narrow classify pass + a tiny (lang × prediction) aggregate."""
    docs = table(spark, sf_dir, "documents")
    pred = T.language_id(docs).select("doc_id", "predicted_lexicon")
    return (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "predicted_lexicon")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "predicted_lexicon")
    )


_DIM = 64


@register(
    "emb_centroid_classify",
    f"""
    WITH cells AS (
      SELECT label, i, {sql_round('avg(embedding[i])', 6)} AS c
      FROM embeddings, generate_series(1, {_DIM}) t(i)
      GROUP BY label, i
    ),
    flat AS (
      SELECT vec_id, label AS actual, i, embedding[i] AS x
      FROM embeddings, generate_series(1, {_DIM}) t(i)
    ),
    dots AS (
      SELECT f.vec_id, f.actual, cells.label AS cand,
             {sql_round('sum(f.x * cells.c)', 6)} AS dot
      FROM flat f JOIN cells ON f.i = cells.i
      GROUP BY f.vec_id, f.actual, cells.label
    ),
    best AS (
      SELECT vec_id, actual, cand,
             row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cand) AS rk
      FROM dots
    )
    SELECT actual AS label, count(*) AS n,
           CAST(sum(CASE WHEN cand = actual THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           {sql_igrid('sum(CASE WHEN cand = actual THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)', 4)} AS accuracy_e4
    FROM best WHERE rk = 1
    GROUP BY actual ORDER BY actual
    """,
    "llm",
    "behavior",
    "ann",
)
def emb_centroid_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid (Rocchio) classification over the embedding
    corpus: per-label mean vectors, dot-product assignment, per-label
    accuracy — the quality gate for embedding-space labels.

    Determinism: centroid coordinates AND per-pair dots are frounded
    at 6 dp before the argmax (ties break by label), so assignment is
    bit-stable across engines and float summation orders.

    Spark shape: centroids long-form via posexplode + groupBy(label,
    dim) (640 rows, broadcast); assignment is an explode-join-
    reaggregate on codegen'd scalar math — no HOF lambdas in the hot
    path (see SCALE.md on interpreted HOF cost), shuffles keyed by
    (vec, candidate) then vec."""
    emb = table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "vec_id",
        F.col("label").alias("actual"),
        F.posexplode("embedding").alias("i0", "x"),
    ).select("vec_id", "actual", (F.col("i0") + 1).alias("i"), "x")
    cells = (
        flat.groupBy(F.col("actual").alias("label"), "i")
        .agg(fround(F.avg("x"), 6).alias("c"))
    )
    dots = (
        flat.join(F.broadcast(cells), "i")
        .groupBy("vec_id", "actual", F.col("label").alias("cand"))
        .agg(fround(F.sum(F.col("x") * F.col("c")), 6).alias("dot"))
    )
    rk = F.row_number().over(
        Window.partitionBy("vec_id").orderBy(F.desc("dot"), "cand")
    )
    best = dots.withColumn("rk", rk).filter(F.col("rk") == 1)
    correct = F.sum(F.when(F.col("cand") == F.col("actual"), 1).otherwise(0))
    return (
        best.groupBy(F.col("actual").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            correct.alias("n_correct"),
            igrid(correct / F.count(F.lit(1)).cast("double"), 4).alias("accuracy_e4"),
        )
        .orderBy("label")
    )


@register(
    "e_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, count(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    ORDER BY prev_type, next_type
    """,
    "events",
    "behavior",
    "window",
)
def e_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over each user's event
    sequence (ordered by time, event_id tie-break) — the sequence-
    mining primitive behind next-action prediction and anomalous-path
    detection.  One lag window partitioned by user (the natural event
    distribution key) and a tiny (type × type) aggregate."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("prev_type", "next_type")
    )


@register(
    "e_funnel_windowed",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
        AND e.ts <= v.t_view + INTERVAL 7 DAY
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        AND e.ts <= c.t_click + INTERVAL 7 DAY
      GROUP BY e.user_id
    )
    SELECT 1 AS stage, 'view' AS name, count(*) AS users FROM v
    UNION ALL
    SELECT 2 AS stage, 'view>click(7d)' AS name, count(*) AS users FROM c
    UNION ALL
    SELECT 3 AS stage, 'view>click>purchase(7d)' AS name, count(*) AS users FROM p
    ORDER BY stage
    """,
    "events",
    "behavior",
)
def e_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-window funnel: each step must happen within 7 days
    of the previous step's first event — the attribution-realistic
    variant of e_funnel_conversion (an unbounded funnel overstates
    conversion by crediting purchases months later).  Same
    user_id-co-partitioned shuffle shape."""
    e = table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + F.expr("INTERVAL 7 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + F.expr("INTERVAL 7 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )

    def stage(df: DataFrame, n: int, name: str) -> DataFrame:
        return df.agg(
            F.lit(n).alias("stage"),
            F.lit(name).alias("name"),
            F.count(F.lit(1)).alias("users"),
        )

    return (
        stage(v, 1, "view")
        .unionAll(stage(c, 2, "view>click(7d)"))
        .unionAll(stage(p, 3, "view>click>purchase(7d)"))
        .orderBy("stage")
    )


_MRL_DIMS = (16, 32, 64)  # full dim last — its recall row is the 1.0 sanity anchor


def _trunc_recall_sql() -> str:
    """Per-truncation top-5 blocks sharing the ann_cosine_topk rank
    contract; recall joins each truncated set against the full-dim
    (64) set."""
    from finance_etl_pipeline_spark.operators import similarity as S

    blocks = []
    for d in _MRL_DIMS:
        blocks.append(
            f"""
      SELECT {d} AS dim, query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine_e4 DESC, vec_id) AS rank
        FROM (
          SELECT q.query_id, b.vec_id,
                 CAST(floor((list_dot_product(q.qv[1:{d}], b.v[1:{d}])
                      / nullif(sqrt(list_dot_product(q.qv[1:{d}], q.qv[1:{d}]))
                             * sqrt(list_dot_product(b.v[1:{d}], b.v[1:{d}])),
                        0.0)) * 10000 + 0.5001) AS BIGINT) AS cosine_e4
          FROM q CROSS JOIN base b WHERE q.query_id != b.vec_id
        )
      ) WHERE rank <= 5"""
        )
    union = "\n      UNION ALL".join(blocks)
    return f"""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    q AS (
      SELECT vec_id AS query_id, v AS qv FROM base
      WHERE vec_id % 50 = 0 ORDER BY vec_id LIMIT {S.QUERY_CAP}
    ),
    tr AS ({union}
    ),
    ex AS (SELECT query_id, vec_id FROM tr WHERE dim = {_MRL_DIMS[-1]}),
    qd AS (SELECT DISTINCT dim, query_id FROM tr),
    hits AS (
      SELECT t.dim, t.query_id, count(*) AS h
      FROM tr t JOIN ex ON t.query_id = ex.query_id
                       AND t.vec_id = ex.vec_id
      GROUP BY t.dim, t.query_id
    ),
    perq AS (
      SELECT qd.dim, qd.query_id, coalesce(hits.h, 0) AS h
      FROM qd LEFT JOIN hits ON qd.dim = hits.dim
                            AND qd.query_id = hits.query_id
    )
    SELECT CAST(dim AS BIGINT) AS dim,
           CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(h) AS BIGINT) AS sum_hits,
           {sql_igrid('sum(h) * 1.0 / (5 * count(*))', 6)} AS recall_e6
    FROM perq GROUP BY dim ORDER BY dim
    """


@register(
    "emb_dim_truncation_recall",
    _trunc_recall_sql(),
    "llm",
    "similarity",
    "eval",
)
def emb_dim_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension-truncation eval: recall@5 of cosine
    retrieval when scoring on only the first 16 / 32 / 64 embedding
    components, against the full-dimension top-5 as ground truth —
    the measurement behind shipping truncated vectors (MRL, Kusupati
    et al. 2022) to cut index bandwidth 2–4× (the full-dim row is the
    recall = 1.0 sanity anchor by construction).  Complements the
    precision-quantization evals (``ann_int8_topk``, ``ann_pca_topk``)
    with the dimension-cut axis.

    Determinism: each truncation uses the shared rank contract
    (cosine gridded e4, ties by vec_id); norms are recomputed over the
    slice in both engines.

    Scale: three brute-force passes over the corpus against the
    ``query_set``-bounded workload (the production path swaps in the
    IVF/PQ candidate generators); everything after the rank windows is
    |queries| × 5 rows per truncation."""
    from finance_etl_pipeline_spark.operators import similarity as S

    emb = table(spark, sf_dir, "embeddings")
    carve = F.col("vec_id") % 50 == 0
    tr = None
    for d in _MRL_DIMS:
        t = S.cosine_topk(emb, carve, k=5, dims=d).select(
            F.lit(d).alias("dim"), "query_id", "vec_id"
        )
        tr = t if tr is None else tr.unionByName(t)
    tr = tr.localCheckpoint(eager=True)
    ex = tr.filter(F.col("dim") == _MRL_DIMS[-1]).select(
        "query_id", "vec_id"
    )
    qd = tr.select("dim", "query_id").distinct()
    hits = (
        tr.join(ex, ["query_id", "vec_id"])
        .groupBy("dim", "query_id")
        .agg(F.count(F.lit(1)).alias("h"))
    )
    perq = qd.join(hits, ["dim", "query_id"], "left").select(
        "dim", "query_id", F.coalesce("h", F.lit(0)).alias("h")
    )
    return (
        perq.groupBy(F.col("dim").cast("long").alias("dim"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_queries"),
            F.sum("h").cast("long").alias("sum_hits"),
            igrid(
                F.sum("h") / (5.0 * F.count(F.lit(1))), 6
            ).alias("recall_e6"),
        )
        .orderBy("dim")
    )
