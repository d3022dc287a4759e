"""Scalar-function battery (SURVEY.md §2.8 F1–F23).

Each query packs several related scalar functions into one projection
so the oracle verifies the whole family.  Everything stays inside
whole-stage codegen — no UDFs anywhere in this module.

Defensive choices for oracle parity:
- division uses ``nullif(denom, 0)`` so semantics are identical under
  ANSI-on Spark (driver session), ANSI-off Spark, and DuckDB;
- ``try_cast`` is used for cast-may-fail (pandas ``errors='coerce'``
  equivalent, reference build_dashboard.py:64-69) — null on failure in
  both engines regardless of ANSI mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.scalars import fround, igrid
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import table


@register(
    "f_string_funcs",
    """
    SELECT c_custkey,
           c_mktsegment || '|' || CAST(c_custkey AS VARCHAR) AS txn_id,
           c_name || '_' || c_mktsegment                     AS label,
           substr(c_name, 1, 9)                              AS name_prefix,
           lower(c_mktsegment)                               AS segment_lc,
           CAST(contains(lower(c_name), 'customer') AS BOOLEAN) AS has_customer,
           CAST(c_custkey AS VARCHAR)                        AS custkey_str
    FROM customer
    ORDER BY c_custkey
    """,
    "scalar",
)
def f_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 concat_ws, F2 concat, F3 cast-to-string, F10 substring,
    F19 contains, F20 lower (reference transform.py:95,71,79;
    quality.py:173-181)."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat_ws("|", "c_mktsegment", F.col("c_custkey").cast("string")).alias("txn_id"),
        F.concat("c_name", F.lit("_"), "c_mktsegment").alias("label"),
        F.substring("c_name", 1, 9).alias("name_prefix"),
        F.lower("c_mktsegment").alias("segment_lc"),
        F.lower("c_name").contains("customer").alias("has_customer"),
        F.col("c_custkey").cast("string").alias("custkey_str"),
    ).orderBy("c_custkey")


@register(
    "f_date_funcs",
    """
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE)                              AS order_date,
           CAST(year(o_orderdate) AS INTEGER)                     AS yr,
           CAST(quarter(o_orderdate) AS INTEGER)                  AS qtr,
           CAST(month(o_orderdate) AS INTEGER)                    AS mth,
           CAST(dayofmonth(o_orderdate) AS INTEGER)               AS dom,
           CAST(weekofyear(o_orderdate) AS INTEGER)               AS iso_week,
           strftime(o_orderdate, '%Y-%m')                         AS month_str,
           strftime(o_orderdate, '%b')                            AS month_name,
           CAST(strftime(o_orderdate, '%Y%m%d') AS INTEGER)       AS date_key,
           CAST(strftime(o_orderdate, '%Y%m') AS INTEGER)         AS month_key,
           CAST(date_trunc('month', o_orderdate) AS DATE)         AS month_start,
           last_day(o_orderdate)                                  AS month_end,
           CAST(CAST(date_trunc('month', o_orderdate) AS DATE)
                + INTERVAL 1 MONTH AS DATE)                       AS next_month_start
    FROM orders
    ORDER BY o_orderkey
    """,
    "scalar",
)
def f_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5–F11: the full date-part battery — to_date, year/quarter/month/
    day, ISO week, yyyy-MM string, MMM name, yyyyMMdd/yyyyMM surrogate
    keys, month begin/end, add_months (reference
    export_powerbi_star_schema.py:36-48,133-141; transform.py:70;
    pipeline.py:23-27)."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.to_date(d).alias("order_date"),
        F.year(d).alias("yr"),
        F.quarter(d).alias("qtr"),
        F.month(d).alias("mth"),
        F.dayofmonth(d).alias("dom"),
        F.weekofyear(d).alias("iso_week"),
        F.date_format(d, "yyyy-MM").alias("month_str"),
        F.date_format(d, "MMM").alias("month_name"),
        F.date_format(d, "yyyyMMdd").cast("int").alias("date_key"),
        F.date_format(d, "yyyyMM").cast("int").alias("month_key"),
        F.to_date(F.date_trunc("month", d)).alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.add_months(F.to_date(F.date_trunc("month", d)), 1).alias("next_month_start"),
    ).orderBy("o_orderkey")


@register(
    "f_math_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(floor((-l_extendedprice) * 100 + 0.5001) AS BIGINT)            AS negated_e2,
           CAST(floor(l_quantity * l_extendedprice * 100 + 0.5001) AS BIGINT)   AS product_e2,
           CAST(floor(abs(l_discount - l_tax) * 10000 + 0.5001) AS BIGINT)      AS abs_diff_e4,
           CAST(floor(l_extendedprice * (1 - l_discount)
                 / nullif(l_quantity, 0) * 10000 + 0.5001) AS BIGINT)           AS unit_net_e4,
           CAST(floor((coalesce(l_discount, 0.0) - coalesce(l_tax, 0.0)) * 10000 + 0.5001) AS BIGINT) AS disc_minus_tax_e4
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
    "scalar",
)
def f_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 negate, F13 multiply, F14 round, F15 safe division,
    F16 abs, F17 coalesce defaults, F22 coalesce-subtract
    (reference transform.py:44,66,83; quality.py:61;
    export_powerbi_star_schema.py:200-204)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        igrid(-F.col("l_extendedprice"), 2).alias("negated_e2"),
        igrid(F.col("l_quantity") * F.col("l_extendedprice"), 2).alias(
            "product_e2"
        ),
        igrid(F.abs(F.col("l_discount") - F.col("l_tax")), 4).alias(
            "abs_diff_e4"
        ),
        igrid(
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            / F.nullif(F.col("l_quantity"), F.lit(0.0)),
            4,
        ).alias("unit_net_e4"),
        igrid(
            F.coalesce("l_discount", F.lit(0.0)) - F.coalesce("l_tax", F.lit(0.0)), 4
        ).alias("disc_minus_tax_e4"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "f_margin_pct",
    """
    SELECT c_mktsegment,
           CAST(floor(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(floor(o_totalprice * 100 + 0.5001) AS BIGINT) END)
                 / nullif(sum(CAST(floor(o_totalprice * 100 + 0.5001) AS BIGINT)), 0) * 100 * 10000 + 0.5001) AS BIGINT) AS finished_pct_e4
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    "scalar",
    "agg",
)
def f_margin_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15 percentage-of-total with null-safe denominator — the margin
    computation shape (reference export_bi_datasets.py:45-55; division
    by zero yields null, documented SURVEY.md §7.6.5)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(c, o.o_custkey == c.c_custkey)  # customer grows with SF: no hint, AQE decides
        .groupBy("c_mktsegment")
        .agg(
            igrid(
                F.sum(
                    F.when(
                        F.col("o_orderstatus") == "F", igrid("o_totalprice", 2)
                    )
                )
                / F.nullif(F.sum(igrid("o_totalprice", 2)), F.lit(0))
                * 100,
                4,
            ).alias("finished_pct_e4")
        )
        .orderBy("c_mktsegment")
    )


@register(
    "f_try_cast_coerce",
    """
    SELECT event_id,
           CAST(floor(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) * 1000000 + 0.5001) AS BIGINT) AS k_num_e6,
           CAST(floor(TRY_CAST(event_type AS DOUBLE) * 1000000 + 0.5001) AS BIGINT) AS bad_num_e6,
           TRY_CAST(substr(CAST(ts AS VARCHAR), 1, 10) AS DATE)  AS ts_date
    FROM events
    ORDER BY event_id
    """,
    "scalar",
)
def f_try_cast_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F5: null-on-failure numeric and date coercion via try_cast —
    the pandas ``errors='coerce'`` equivalent (reference
    build_dashboard.py:64-69, export_powerbi_star_schema.py:198-210),
    ANSI-mode safe. Also exercises JSON extraction on the events.props
    payload (beyond reference: §2.8 'absent' list)."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        igrid(
            F.get_json_object("props", "$.k").try_cast("double"), 6
        ).alias("k_num_e6"),
        igrid(F.col("event_type").try_cast("double"), 6).alias("bad_num_e6"),
        F.substring(F.col("ts").cast("string"), 1, 10).try_cast("date").alias("ts_date"),
    ).orderBy("event_id")


@register(
    "f_case_when_severity",
    """
    SELECT event_id,
           CASE WHEN event_type = 'error' THEN 'ERROR'
                WHEN value > 150 THEN 'WARN'
                ELSE 'INFO' END AS severity
    FROM events
    ORDER BY event_id
    """,
    "scalar",
)
def f_case_when_severity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F18: chained CASE severity rules (reference quality.py:150-182)."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.when(F.col("event_type") == "error", "ERROR")
        .when(F.col("value") > 150, "WARN")
        .otherwise("INFO")
        .alias("severity"),
    ).orderBy("event_id")


@register(
    "f_regexp_extract",
    """
    SELECT c_custkey,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
           CAST(regexp_matches(c_name, '^Customer') AS BOOLEAN) AS is_customer
    FROM customer
    ORDER BY c_custkey
    """,
    "scalar",
)
def f_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-reference (§2.8 'absent' list): regex extraction + match.
    Spark and DuckDB agree that no-match extract returns ''."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("name_digits"),
        F.col("c_name").rlike("^Customer").alias("is_customer"),
    ).orderBy("c_custkey")


@register(
    "f_hash_funcs",
    """
    SELECT doc_id,
           md5(text)                 AS text_md5,
           sha256(text)              AS text_sha256,
           CAST(length(text) AS BIGINT) AS text_len
    FROM documents
    ORDER BY doc_id
    """,
    "scalar",
    "llm",
)
def f_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-reference (§2.8 'absent' list): cryptographic hashes —
    the backbone of exact dedup and fingerprinting; both engines emit
    lowercase hex."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.length("text").cast("long").alias("text_len"),
    ).orderBy("doc_id")


@register(
    "f_null_tests",
    """
    SELECT event_id,
           CAST(value IS NULL AS BOOLEAN)     AS value_is_null,
           CAST(props IS NOT NULL AS BOOLEAN) AS props_present,
           CAST(floor(coalesce(value, 0.0) * 100 + 0.5001) AS BIGINT) AS value_filled_e2
    FROM events
    ORDER BY event_id
    """,
    "scalar",
)
def f_null_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F21 null tests + F17 fillna (reference transform.py:40,
    export_powerbi_star_schema.py:202-204)."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.col("value").isNull().alias("value_is_null"),
        F.col("props").isNotNull().alias("props_present"),
        igrid(F.coalesce("value", F.lit(0.0)), 2).alias("value_filled_e2"),
    ).orderBy("event_id")
