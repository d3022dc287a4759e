"""Robust statistics and fuzzy matching: winsorization, median/MAD
outlier detection, Benford first-digit audit, and blocked
edit-distance name matching.

The robust-stats trio is the feature-preparation / anomaly layer a
financial or telemetry pipeline runs before modeling (the reference's
DQ engine checks declared rules; these checks are *distributional*).
The fuzzy join is the blocking pattern every entity-resolution
pipeline uses: never all-pairs — block on a cheap key, pay the
quadratic cost only inside blocks.

Cross-engine determinism: percentiles/medians are fround'ed BEFORE
they feed thresholds or caps, so flag decisions can't flip on
interpolation ULPs; Benford's first digit is extracted from the
integer cents string (shared floor-epsilon contract), never from
float log10, whose boundary behavior differs by ULP at powers of 10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from finance_etl_pipeline_spark.functions.scalars import fround, igrid, sql_igrid, sql_round
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import table


@register(
    "f_winsorize_caps",
    f"""
    WITH caps AS (
      SELECT event_type,
             {sql_round('quantile_cont(value, 0.01)', 4)} AS p01,
             {sql_round('quantile_cont(value, 0.99)', 4)} AS p99
      FROM events GROUP BY event_type
    )
    SELECT e.event_type AS event_type,
           {sql_igrid('caps.p01', 4)} AS p01_e4,
           {sql_igrid('caps.p99', 4)} AS p99_e4,
           {sql_igrid('avg(e.value)', 2)} AS avg_raw_e2,
           {sql_igrid('avg(least(greatest(e.value, caps.p01), caps.p99))', 2)} AS avg_winsorized_e2
    FROM events e JOIN caps ON e.event_type = caps.event_type
    GROUP BY e.event_type, caps.p01, caps.p99
    ORDER BY e.event_type
    """,
    "robust",
    "agg",
)
def f_winsorize_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per series: cap values at the rounded
    p01/p99 before averaging — the standard heavy-tail guard for
    features and KPIs.  Two aggregations over the same shuffle key
    (event_type); the caps table is tiny and broadcast back."""
    e = table(spark, sf_dir, "events")
    _pct = F.expr("percentile(value, array(0.01, 0.99))")  # one buffer
    caps = e.groupBy("event_type").agg(
        fround(F.element_at(_pct, 1), 4).alias("p01"),
        fround(F.element_at(_pct, 2), 4).alias("p99"),
    )
    capped = F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99"))
    return (
        e.join(F.broadcast(caps), "event_type")
        .groupBy("event_type", "p01", "p99")
        .agg(
            igrid(F.avg("value"), 2).alias("avg_raw_e2"),
            igrid(F.avg(capped), 2).alias("avg_winsorized_e2"),
        )
        .select(
            "event_type",
            igrid("p01", 4).alias("p01_e4"),
            igrid("p99", 4).alias("p99_e4"),
            "avg_raw_e2",
            "avg_winsorized_e2",
        )
        .orderBy("event_type")
    )


_MAD_K = 3.5  # modified z-score threshold (Iglewicz & Hoaglin)


@register(
    "f_mad_outliers",
    f"""
    WITH med AS (
      SELECT event_type, {sql_round('quantile_cont(value, 0.5)', 4)} AS med
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type,
             {sql_round('quantile_cont(abs(e.value - med.med), 0.5)', 4)} AS mad
      FROM events e JOIN med ON e.event_type = med.event_type
      GROUP BY e.event_type
    )
    SELECT e.event_type AS event_type,
           {sql_igrid('med.med', 4)} AS med_e4,
           {sql_igrid('mad.mad', 4)} AS mad_e4,
           count(*) AS n,
           CAST(sum(CASE WHEN abs(e.value - med.med) > {_MAD_K} * mad.mad
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e
    JOIN med ON e.event_type = med.event_type
    JOIN mad ON e.event_type = mad.event_type
    GROUP BY e.event_type, med.med, mad.mad
    ORDER BY e.event_type
    """,
    "robust",
    "agg",
    "quality",
)
def f_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD outlier counts per series — the robust alternative
    to mean/stddev z-scores (one wild value cannot move the
    threshold).  Two percentile passes (median, then median absolute
    deviation) + one flagging pass, all shuffling on event_type; med
    and mad are rounded before the threshold comparison so flags are
    engine-stable."""
    e = table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        fround(F.expr("percentile(value, 0.5)"), 4).alias("med")
    )
    with_med = e.join(F.broadcast(med), "event_type")
    mad = with_med.groupBy("event_type").agg(
        fround(
            F.expr("percentile(abs(value - med), 0.5)"), 4
        ).alias("mad")
    )
    flagged = with_med.join(F.broadcast(mad), "event_type")
    is_out = F.abs(F.col("value") - F.col("med")) > _MAD_K * F.col("mad")
    return (
        flagged.groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(is_out, 1).otherwise(0)).alias("n_outliers"),
        )
        .select(
            "event_type",
            igrid("med", 4).alias("med_e4"),
            igrid("mad", 4).alias("mad_e4"),
            "n",
            "n_outliers",
        )
        .orderBy("event_type")
    )


@register(
    "dq_benford_first_digit",
    f"""
    WITH cents AS (
      SELECT CAST(floor(l_extendedprice * 100 + 0.5001) AS BIGINT) AS c
      FROM lineitem WHERE l_extendedprice > 0
    ),
    digits AS (
      SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS digit FROM cents
    ),
    obs AS (SELECT digit, count(*) AS n FROM digits GROUP BY digit),
    tot AS (SELECT sum(n) AS total FROM obs)
    SELECT digit, n,
           {sql_igrid('n / CAST(total AS DOUBLE)', 6)} AS share_e6,
           {sql_igrid('log10(1.0 + 1.0 / digit)', 6)} AS benford_expected_e6,
           {sql_igrid('abs(n / CAST(total AS DOUBLE) - log10(1.0 + 1.0 / digit))', 6)} AS abs_dev_e6
    FROM obs CROSS JOIN tot ORDER BY digit
    """,
    "robust",
    "quality",
    "finance",
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit on money amounts — the classic
    forensic-accounting screen (fabricated amounts drift from the
    log10(1+1/d) curve).  The first digit comes from the integer
    CENTS string (shared floor-epsilon rounding), never from float
    log10 of the raw amount, which mis-buckets at powers of ten by
    one ULP.  One narrow pass + a 9-row aggregate."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 0)
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5001).cast("long")
    obs = (
        li.select(
            F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = obs.agg(F.sum("n").alias("total"))
    share = F.col("n") / F.col("total").cast("double")
    expected = F.log10(1.0 + 1.0 / F.col("digit"))
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            igrid(share, 6).alias("share_e6"),
            igrid(expected, 6).alias("benford_expected_e6"),
            igrid(F.abs(share - expected), 6).alias("abs_dev_e6"),
        )
        .orderBy("digit")
    )


_FUZZY_MAX_DIST = 4


@register(
    "j_fuzzy_name_match",
    f"""
    WITH names AS (
      SELECT DISTINCT p_name AS name,
             split_part(p_name, ' ', -1) AS block
      FROM part
    )
    SELECT a.name AS name_a, b.name AS name_b,
           levenshtein(a.name, b.name) AS dist
    FROM names a JOIN names b
      ON a.block = b.block AND a.name < b.name
    WHERE levenshtein(a.name, b.name) <= {_FUZZY_MAX_DIST}
    ORDER BY name_a, name_b
    """,
    "robust",
    "join",
    "dedup",
)
def j_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching: candidate name pairs share a blocking
    key (the head noun = last word) and are kept when edit distance
    <= {_FUZZY_MAX_DIST} — the entity-resolution primitive.  The
    quadratic cost is confined inside blocks: the join key IS the
    block, so at 100 TB the shuffle distributes blocks and no
    executor ever sees the full name universe.  (For skewed block
    sizes, add a second blocking key — e.g. length bucket — exactly
    like the salting pattern in operators/skew.py.)"""
    p = table(spark, sf_dir, "part")
    names = (
        p.select(F.col("p_name").alias("name"))
        .distinct()
        .withColumn("block", F.element_at(F.split("name", " "), -1))
    )
    a = names.select(F.col("name").alias("name_a"), "block")
    b = names.select(F.col("name").alias("name_b"), "block")
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, "block")
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(dist <= _FUZZY_MAX_DIST)
        .select("name_a", "name_b", dist.alias("dist"))
        .orderBy("name_a", "name_b")
    )


_PROF_COLS = ("l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "prof_table_summary",
    " UNION ALL ".join(
        f"""
    SELECT '{c}' AS column_name, count(*) AS n,
           CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           count(DISTINCT {c}) AS n_distinct,
           {sql_igrid(f'min({c})', 4)} AS min_v_e4,
           {sql_igrid(f'max({c})', 4)} AS max_v_e4,
           {sql_igrid(f'avg({c})', 4)} AS avg_v_e4
    FROM lineitem
    """
        for c in _PROF_COLS
    )
    + " ORDER BY column_name",
    "robust",
    "quality",
    "agg",
)
def prof_table_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile (count / nulls / exact distinct /
    min / max / mean) for the numeric fact columns, long-form — the
    stats a query optimizer or DQ baseline collects per table.

    Spark shape: ONE aggregate computes every column's stats in a
    single scan (the multi-countDistinct triggers Catalyst's expand,
    cost x|cols|, still one pass), then a stack() unpivots the single
    wide row — unlike the oracle SQL's five scans.  At 100 TB
    swap exact count(DISTINCT) for approx_count_distinct and the
    expand disappears (a_approx_count_distinct shows the path)."""
    li = table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROF_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__dist"),
            igrid(F.min(c).cast("double"), 4).alias(f"{c}__min"),
            igrid(F.max(c).cast("double"), 4).alias(f"{c}__max"),
            igrid(F.avg(c), 4).alias(f"{c}__avg"),
        ]
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__nulls, {c}__dist, {c}__min, {c}__max, {c}__avg"
        for c in _PROF_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROF_COLS)}, {stack_args}) AS "
        "(column_name, n, n_nulls, n_distinct, min_v_e4, max_v_e4, avg_v_e4)"
    ).orderBy("column_name")


@register(
    "dq_chi2_independence",
    f"""
    WITH banded AS (
      SELECT event_type,
             CASE WHEN value < 50 THEN 'low'
                  WHEN value < 150 THEN 'mid'
                  ELSE 'high' END AS band
      FROM events
    ),
    cells AS (
      SELECT event_type, band, count(*) AS obs FROM banded
      GROUP BY event_type, band
    ),
    margins AS (
      SELECT c.event_type, c.band, c.obs,
             rt.row_tot, ct.col_tot, g.grand
      FROM cells c
      JOIN (SELECT event_type, sum(obs) AS row_tot FROM cells GROUP BY event_type) rt
        ON c.event_type = rt.event_type
      JOIN (SELECT band, sum(obs) AS col_tot FROM cells GROUP BY band) ct
        ON c.band = ct.band
      CROSS JOIN (SELECT sum(obs) AS grand FROM cells) g
    )
    SELECT event_type, band, obs,
           {sql_igrid('row_tot * col_tot / CAST(grand AS DOUBLE)', 4)} AS expected_e4,
           {sql_igrid('''pow(obs - row_tot * col_tot / CAST(grand AS DOUBLE), 2)
              / (row_tot * col_tot / CAST(grand AS DOUBLE))''', 6)} AS chi2_term_e6
    FROM margins
    ORDER BY event_type, band
    """,
    "robust",
    "quality",
    "agg",
)
def dq_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence screen: is value-band distribution
    independent of event_type?  Emits each contingency cell's
    observed count, expected count under independence, and chi²
    term (per-cell rows keep the output summation-order-free; the
    statistic is their sum, df = (r-1)(c-1)).

    Spark shape: one groupBy for the cells, two tiny margin
    aggregates broadcast back — the contingency table never exceeds
    |types| × |bands| rows no matter the event volume."""
    e = table(spark, sf_dir, "events")
    band = (
        F.when(F.col("value") < 50, "low")
        .when(F.col("value") < 150, "mid")
        .otherwise("high")
    )
    cells = (
        e.select("event_type", band.alias("band"))
        .groupBy("event_type", "band")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    rt = cells.groupBy("event_type").agg(F.sum("obs").alias("row_tot"))
    ct = cells.groupBy("band").agg(F.sum("obs").alias("col_tot"))
    g = cells.agg(F.sum("obs").alias("grand"))
    m = (
        cells.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "band")
        .crossJoin(F.broadcast(g))
    )
    expected = F.col("row_tot") * F.col("col_tot") / F.col("grand").cast("double")
    return m.select(
        "event_type",
        "band",
        "obs",
        igrid(expected, 4).alias("expected_e4"),
        igrid(F.pow(F.col("obs") - expected, 2) / expected, 6).alias(
            "chi2_term_e6"
        ),
    ).orderBy("event_type", "band")


def _skew_sql(tbl: str, key: str) -> str:
    """One branch of the prof_key_skew oracle (per-key counts →
    rank-based exact-integer Gini + concentration shares)."""
    return f"""
      SELECT '{tbl}.{key}' AS keyed,
             count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows, max(cnt) AS max_cnt,
             {sql_igrid('CAST(max(cnt) AS DOUBLE) / sum(cnt)', 6)} AS max_share_e6,
             {sql_igrid(
               'CAST(sum(CASE WHEN rd <= 10 THEN cnt ELSE 0 END) AS DOUBLE)'
               ' / sum(cnt)', 6)} AS top10_share_e6,
             {sql_igrid(
               '2.0 * sum(ra * cnt) / (count(*) * CAST(sum(cnt) AS DOUBLE))'
               ' - (count(*) + 1.0) / count(*)', 6)} AS gini_e6
      FROM (
        SELECT cnt,
               row_number() OVER (ORDER BY cnt, k) AS ra,
               row_number() OVER (ORDER BY cnt DESC, k) AS rd
        FROM (SELECT {key} AS k, count(*) AS cnt FROM {tbl} GROUP BY 1)
      )
    """


@register(
    "prof_key_skew",
    f"""
    SELECT * FROM ({_skew_sql('events', 'user_id')}
    UNION ALL {_skew_sql('lineitem', 'l_orderkey')})
    ORDER BY keyed
    """,
    "profile",
    "skew",
)
def prof_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-health profiler for join/aggregation keys: per-key-count
    concentration (max share, top-10 share) and the exact Gini
    coefficient of the key distribution — the diagnostic you run
    BEFORE deciding a key needs salting (operators/skew.py) or AQE
    skew-join handling.  Gini ≈ 0: uniform keys, shuffles balance;
    Gini → 1: a few hot keys own the table.

    Determinism: Gini via the rank formula
    2·Σ(rank·cnt)/(n·Σcnt) − (n+1)/n with rank ties broken by key —
    every sum is exact integer arithmetic, division happens once at
    the end, so both engines agree bit-exactly before the fround.

    Scale: per-key counts are map-side-combined groupBys (key-
    cardinality-sized, not row-count-sized); the rank windows run
    over that reduced count table.  For billion-key tables the same
    metrics come from a sampled or sketched count table — the shape
    downstream of the counts is unchanged."""
    out = None
    for tbl, key in (("events", "user_id"), ("lineitem", "l_orderkey")):
        cnts = (
            table(spark, sf_dir, tbl)
            .groupBy(F.col(key).alias("k"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        ranked = cnts.select(
            "cnt",
            F.row_number().over(Window.orderBy("cnt", "k")).alias("ra"),
            F.row_number()
            .over(Window.orderBy(F.desc("cnt"), "k"))
            .alias("rd"),
        )
        n = F.count(F.lit(1))
        tot = F.sum("cnt")
        m = ranked.agg(
            n.alias("n_keys"),
            tot.alias("n_rows"),
            F.max("cnt").alias("max_cnt"),
            igrid(F.max("cnt").cast("double") / tot, 6).alias("max_share_e6"),
            igrid(
                F.sum(F.when(F.col("rd") <= 10, F.col("cnt")).otherwise(0))
                .cast("double")
                / tot,
                6,
            ).alias("top10_share_e6"),
            igrid(
                2.0 * F.sum(F.col("ra") * F.col("cnt"))
                / (n * tot.cast("double"))
                - (n + 1.0) / n,
                6,
            ).alias("gini_e6"),
        ).select(F.lit(f"{tbl}.{key}").alias("keyed"), "*")
        out = m if out is None else out.unionByName(m)
    return out.orderBy("keyed")


_KEY_CANDIDATES = (
    ("orders", "o_orderkey"),
    ("lineitem", "l_orderkey"),
    ("customer", "c_custkey"),
    ("events", "event_id"),
    ("documents", "doc_id"),
)


@register(
    "dq_uniqueness_profile",
    " UNION ALL ".join(
        f"""
    SELECT '{t}.{k}' AS candidate_key,
           count(*) AS n_rows,
           count(DISTINCT {k}) AS n_distinct,
           CAST(count(*) = count(DISTINCT {k}) AS INTEGER) AS is_unique
    FROM {t}
    """
        for t, k in _KEY_CANDIDATES
    )
    + " ORDER BY candidate_key",
    "robust",
    "quality",
    "profile",
)
def dq_uniqueness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key uniqueness profile across the lake: row count vs
    distinct count per declared key candidate with a pass flag — the
    key-discovery / constraint-audit step a catalog runs before
    trusting joins or MERGE keys (l_orderkey is deliberately
    NON-unique: lineitem's true key is the composite with
    l_linenumber, which `a_duplicate_key_check` audits).

    Scale: one count-distinct aggregate per table — each is a
    map-side-combined shuffle on the key; at billion-key scale swap
    approx_count_distinct (exactness only matters for the flag, which
    a second exact pass can confirm on flagged keys)."""
    out = None
    for t, k in _KEY_CANDIDATES:
        df = (
            table(spark, sf_dir, t)
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct(k).alias("n_distinct"),
            )
            .select(
                F.lit(f"{t}.{k}").alias("candidate_key"),
                "n_rows",
                "n_distinct",
                (F.col("n_rows") == F.col("n_distinct"))
                .cast("int")
                .alias("is_unique"),
            )
        )
        out = df if out is None else out.unionByName(df)
    return out.orderBy("candidate_key")


_FRESHNESS_TABLES = (
    ("orders", "o_orderdate"),
    ("lineitem", "l_shipdate"),
    ("events", "ts"),
)


@register(
    "dq_freshness",
    " UNION ALL ".join(
        f"""
    SELECT '{t}' AS dataset,
           CAST(min({c}) AS TIMESTAMP) AS earliest,
           CAST(max({c}) AS TIMESTAMP) AS latest,
           CAST(date_diff('day', CAST(min({c}) AS TIMESTAMP),
                          CAST(max({c}) AS TIMESTAMP)) AS BIGINT) AS span_days
    FROM {t}
    """
        for t, c in _FRESHNESS_TABLES
    )
    + " ORDER BY dataset",
    "robust",
    "quality",
    "profile",
)
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness profile — the third leg of the DQ triad next to
    completeness (prof_table_summary nulls) and uniqueness
    (dq_uniqueness_profile): each time-bearing dataset's earliest and
    latest timestamps and its day span, the inputs to any staleness
    SLO (production compares `latest` against the wall clock; the
    fixture has no 'now', so the span is the emitted check).

    Scale: min/max aggregates per table — one map-side-combined pass
    each; on partitioned lakes the same numbers come from partition
    metadata without any scan."""
    out = None
    for t, c in _FRESHNESS_TABLES:
        df = table(spark, sf_dir, t).agg(
            F.min(c).cast("timestamp").alias("earliest"),
            F.max(c).cast("timestamp").alias("latest"),
        ).select(
            F.lit(t).alias("dataset"),
            "earliest",
            "latest",
            F.datediff(
                F.col("latest").cast("date"), F.col("earliest").cast("date")
            )
            .cast("long")
            .alias("span_days"),
        )
        out = df if out is None else out.unionByName(df)
    return out.orderBy("dataset")


@register(
    "a_trimmed_mean",
    f"""
    WITH ranked AS (
      SELECT l_returnflag,
             l_extendedprice,
             row_number() OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
             ) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT l_returnflag AS returnflag,
           count(*) AS n_kept,
           {sql_igrid('avg(l_extendedprice)', 2)} AS trimmed_mean_e2
    FROM ranked
    WHERE rn > CAST(floor(n * 0.1) AS BIGINT)
      AND rn <= n - CAST(floor(n * 0.1) AS BIGINT)
    GROUP BY l_returnflag
    ORDER BY returnflag
    """,
    "robust",
    "agg",
)
def a_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% two-sided trimmed mean of extended price per return flag —
    the third robust location estimate next to the winsorized mean
    (f_winsorize_caps caps, this one DROPS the tails) and the
    median (w_rolling_median).  Trim membership is decided by exact
    rank with a full deterministic tie order (price, orderkey,
    linenumber), so both engines drop the identical row set — a
    percentile-threshold formulation would let a 1-ulp interpolation
    difference move boundary rows in or out.

    Scale: one shuffle on l_returnflag (3 groups — for a
    high-cardinality trim key the same shape holds, rank within key);
    the count(*) window rides the same partitioning as row_number, so
    no second shuffle."""
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    wn = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    lo = F.floor(F.col("n") * 0.1).cast("long")
    return (
        ranked.where((F.col("rn") > lo) & (F.col("rn") <= F.col("n") - lo))
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            igrid(F.avg("l_extendedprice"), 2).alias("trimmed_mean_e2"),
        )
        .orderBy("returnflag")
    )


_EWMA_ALPHA = 0.3
_EWMA_SPAN = 32


@register(
    "w_ewma_trailing",
    f"""
    WITH daily AS (
      SELECT event_type,
             CAST(ts AS DATE) AS day,
             {sql_round('sum(value)', 4)} AS v
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    seq AS (
      SELECT event_type, day, v,
             row_number() OVER (
               PARTITION BY event_type ORDER BY day
             ) AS rn
      FROM daily
    )
    SELECT a.event_type AS event_type,
           a.day AS day,
           {sql_igrid(
             'sum(b.v * pow(' + str(1 - _EWMA_ALPHA) + ', a.rn - b.rn)) / '
             + '((1 - pow(' + str(1 - _EWMA_ALPHA) + ', least(a.rn, '
             + str(_EWMA_SPAN) + '))) / ' + str(_EWMA_ALPHA) + ')', 2
           )} AS ewma_e2
    FROM seq a
    JOIN seq b
      ON a.event_type = b.event_type
     AND b.rn BETWEEN a.rn - {_EWMA_SPAN - 1} AND a.rn
    GROUP BY a.event_type, a.day, a.rn
    ORDER BY event_type, day
    """,
    "robust",
    "window",
)
def w_ewma_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized trailing EWMA (alpha=0.3, 32-day truncation) of
    daily event value per event type — pandas ``ewm(adjust=True)``
    semantics restated as a CLOSED-FORM windowed dot product, because
    the textbook recurrence y_i = a*x_i + (1-a)*y_{i-1} is sequential
    and would serialize a 100 TB series through one task.  The
    truncation at 32 days ((0.7)^32 < 1.2e-5 of weight) is part of
    the operator contract, so both engines sum the identical finite
    term set; daily inputs are fround'ed BEFORE weighting so the two
    engines weight the same numbers.

    Spark shape: daily aggregate (one shuffle), then ONE trailing
    window collect_list + a codegen'd higher-order ``aggregate`` with
    negative element_at for the j-steps-back term — no self-join, no
    per-offset lag chain.  The oracle states the same dot product as
    a rank-band self-join, which is the naive O(span) shuffle the
    window form avoids."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(fround(F.sum("value"), 4).alias("v"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(_EWMA_SPAN - 1), 0)
    )
    q = 1 - _EWMA_ALPHA
    num = F.expr(
        "aggregate(sequence(0, size(vs) - 1), cast(0.0 as double), "
        f"(acc, j) -> acc + element_at(vs, -(j + 1)) * pow({q}, j))"
    )
    den = (1 - F.pow(F.lit(q), F.size("vs"))) / _EWMA_ALPHA
    return (
        daily.select(
            "event_type",
            "day",
            F.collect_list("v").over(w).alias("vs"),
        )
        .select(
            "event_type",
            "day",
            igrid(num / den, 2).alias("ewma_e2"),
        )
        .orderBy("event_type", "day")
    )


_ENTROPY_COLS = [
    ("events", "event_type"),
    ("documents", "lang"),
    ("documents", "source"),
    ("customer", "c_mktsegment"),
    ("orders", "o_orderpriority"),
    ("lineitem", "l_returnflag"),
]


@register(
    "prof_categorical_entropy",
    " UNION ALL ".join(
        f"""
    SELECT '{t}.{c}' AS column_name,
           count(*) AS n_values,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           {sql_igrid(
               'ln(sum(cnt)) - sum(cnt * ln(cnt)) / sum(cnt)', 6
           )} AS entropy_e6,
           {sql_igrid('max(cnt) / sum(cnt)', 6)} AS top1_share_e6
    FROM (SELECT {c} AS v, CAST(count(*) AS DOUBLE) AS cnt
          FROM {t} WHERE {c} IS NOT NULL GROUP BY {c})
    """
        for t, c in _ENTROPY_COLS
    )
    + " ORDER BY column_name",
    "robust",
    "profile",
)
def prof_categorical_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy + dominance profile of the categorical
    columns: cardinality, H = ln(N) - Σ n_i·ln(n_i)/N (computed from
    integer value counts so both engines feed ln() the identical
    arguments), and the top-1 value share.  This is the
    column-level complement of prof_table_summary's numeric stats —
    the signal for join-key selectivity, stratification usefulness
    (a near-zero-entropy column can't stratify), and encoding choice
    (dictionary vs plain at write time).

    Scale: one groupBy per profiled column on low-cardinality keys →
    counts are tiny; the entropy algebra runs over |distinct values|
    rows.  For high-cardinality columns swap in
    operators/sketch.py::categorical_profile_sketch — HLL cardinality
    + Misra-Gries dominance floor in bounded state (bounds pinned by
    tests/test_sketch.py)."""
    out = None
    for t, c in _ENTROPY_COLS:
        counts = (
            table(spark, sf_dir, t)
            .where(F.col(c).isNotNull())
            .groupBy(F.col(c).alias("v"))
            .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
        )
        df = counts.agg(
            F.count(F.lit(1)).alias("n_values"),
            F.sum("cnt").cast("long").alias("n_rows"),
            igrid(
                F.log(F.sum("cnt"))
                - F.sum(F.col("cnt") * F.log("cnt")) / F.sum("cnt"),
                6,
            ).alias("entropy_e6"),
            igrid(F.max("cnt") / F.sum("cnt"), 6).alias("top1_share_e6"),
        ).select(
            F.lit(f"{t}.{c}").alias("column_name"),
            "n_values",
            "n_rows",
            "entropy_e6",
            "top1_share_e6",
        )
        out = df if out is None else out.unionByName(df)
    return out.orderBy("column_name")
