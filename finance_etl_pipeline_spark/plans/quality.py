"""Data-quality operator battery (SURVEY.md §2.9 Q1–Q9) on testdata.

Exercises the declarative DQ engine in ``operators.quality`` against
the TPC-H-ish tables with business rules chosen so violations actually
exist (an empty exception table verifies nothing).

Oracle-parity note on ``failure_case``: doubles are never cast
directly to string (Java 17's Double.toString and DuckDB's Ryu print
different digit counts for some values) — numeric failure payloads go
through ``CAST(x AS DECIMAL(18,2)) → VARCHAR``, which is
digit-deterministic in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.operators import quality as Q
from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import table

def _li_row_id():
    """Columns can only be built with an active session — keep lazy."""
    return F.concat_ws(
        "|", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )


def _lineitem_checks() -> list[Q.Check]:
    """Business rules over lineitem; two of them genuinely fail."""
    return [
        Q.required("l_returnflag"),
        Q.isin("l_returnflag", ("A", "N", "R")),
        Q.Check("le_45", "l_quantity", F.col("l_quantity") <= 45),
        Q.Check("le_0.08", "l_discount", F.col("l_discount") <= 0.08),
    ]


_LINEITEM_EXC_SQL = """
    WITH exc AS (
      SELECT l_orderkey, l_linenumber, 'l_returnflag' AS column, 'required' AS check,
             CAST(l_returnflag AS VARCHAR) AS failure_case, 0 AS check_number
      FROM lineitem WHERE l_returnflag IS NULL
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_returnflag', 'isin',
             CAST(l_returnflag AS VARCHAR), 1
      FROM lineitem WHERE l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A','N','R')
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_quantity', 'le_45',
             CAST(CAST(l_quantity AS DECIMAL(18,2)) AS VARCHAR), 2
      FROM lineitem WHERE l_quantity IS NOT NULL AND NOT (l_quantity <= 45)
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'l_discount', 'le_0.08',
             CAST(CAST(l_discount AS DECIMAL(18,2)) AS VARCHAR), 3
      FROM lineitem WHERE l_discount IS NOT NULL AND NOT (l_discount <= 0.08)
    )
    SELECT 'lineitem' AS dataset,
           CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR) AS row_id,
           "column", "check", failure_case,
           'Column' AS schema_context, check_number
    FROM exc
    ORDER BY row_id, check_number
"""


@register("dq_exceptions_lineitem", _LINEITEM_EXC_SQL, "dq")
def dq_exceptions_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1/Q2: all row-level check failures in ONE scan via the
    array+explode engine (reference quality.py:98-115 semantics;
    design notes in operators/quality.py)."""
    li = table(spark, sf_dir, "lineitem")
    # engine emits a severity slot (None here — no overrides declared);
    # this plan verifies the pre-severity exception shape
    exc = Q.exceptions_df(li, "lineitem", _lineitem_checks(), _li_row_id()).drop(
        "severity"
    )
    # rewrite double failure_cases to the decimal-deterministic form
    exc = exc.withColumn(
        "failure_case",
        F.when(
            F.col("column").isin("l_quantity", "l_discount"),
            F.col("failure_case").cast("double").cast("decimal(18,2)").cast("string"),
        ).otherwise(F.col("failure_case")),
    )
    return exc.orderBy("row_id", "check_number")


@register(
    "dq_duplicate_keys",
    """
    WITH doubled AS (
      SELECT * FROM events
      UNION ALL
      SELECT * FROM events WHERE event_id < 50
    )
    SELECT 'events' AS dataset,
           CAST(event_id AS VARCHAR) AS row_id,
           'event_id' AS column,
           'unique_key' AS check,
           CAST(count(*) AS VARCHAR) AS failure_case,
           'DataFrameSchema' AS schema_context,
           -1 AS check_number
    FROM doubled
    GROUP BY event_id HAVING count(*) > 1
    ORDER BY CAST(row_id AS BIGINT)
    """,
    "dq",
)
def dq_duplicate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: duplicate-key detection (reference quality.py:8-13) — run on
    a deliberately doubled slice so violations exist."""
    e = table(spark, sf_dir, "events")
    doubled = e.unionByName(e.filter(F.col("event_id") < 50))
    return (
        Q.duplicate_key_exceptions(doubled, "events", ["event_id"])
        .drop("severity")
        .orderBy(F.col("row_id").cast("long"))
    )


@register(
    "dq_referential_part",
    """
    SELECT 'lineitem' AS dataset,
           CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR) AS row_id,
           'l_partkey' AS column,
           'referential_part' AS check,
           CAST(l_partkey AS VARCHAR) AS failure_case,
           'DataFrameSchema' AS schema_context,
           -3 AS check_number
    FROM lineitem
    ANTI JOIN (SELECT DISTINCT p_partkey FROM part WHERE p_size <= 25) d
      ON l_partkey = d.p_partkey
    ORDER BY row_id
    """,
    "dq",
)
def dq_referential_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: referential-integrity exceptions via broadcast left_anti
    (reference pipeline.py:30-47 account_in_coa)."""
    li = table(spark, sf_dir, "lineitem")
    dim = table(spark, sf_dir, "part").filter(F.col("p_size") <= 25)
    return (
        Q.referential_exceptions(
            li, "lineitem", "l_partkey", dim, "p_partkey", "referential_part",
            _li_row_id(),
        )
        .drop("severity")
        .orderBy("row_id")
    )


@register(
    "dq_severity_summary",
    """
    WITH exc AS (
      SELECT 'lineitem' AS dataset, 'l_quantity' AS column, 'le_45' AS check
      FROM lineitem WHERE l_quantity IS NOT NULL AND NOT (l_quantity <= 45)
      UNION ALL
      SELECT 'lineitem', 'l_discount', 'le_0.08'
      FROM lineitem WHERE l_discount IS NOT NULL AND NOT (l_discount <= 0.08)
      UNION ALL
      SELECT 'events', 'value', 'required'
      FROM events WHERE value IS NULL
      UNION ALL
      SELECT 'events', 'event_type', 'isin'
      FROM events WHERE event_type IS NOT NULL
        AND event_type NOT IN ('click','view','purchase','signup','error', 'page_view', 'checkout', 'login', 'logout', 'search')
    ),
    sev AS (
      SELECT dataset,
             CASE WHEN "column" IN ('l_quantity') THEN 'ERROR'
                  WHEN contains(lower("check"), 'required')
                    OR contains(lower("check"), 'dtype')
                    OR contains(lower("check"), 'referential')
                    OR contains(lower("check"), 'unique_key') THEN 'ERROR'
                  ELSE 'WARN' END AS severity
      FROM exc
    ),
    base AS (SELECT unnest(['lineitem','events','orders']) AS dataset),
    counts AS (
      SELECT dataset,
             CAST(sum(CASE WHEN severity='ERROR' THEN 1 ELSE 0 END) AS BIGINT) AS error_count,
             CAST(sum(CASE WHEN severity='WARN' THEN 1 ELSE 0 END) AS BIGINT) AS warn_count
      FROM sev GROUP BY dataset
    )
    SELECT b.dataset,
           coalesce(c.error_count, 0) AS error_count,
           coalesce(c.warn_count, 0) AS warn_count,
           coalesce(c.error_count, 0) + coalesce(c.warn_count, 0) AS issue_count,
           CASE WHEN coalesce(c.error_count, 0) > 0 THEN 'FAIL' ELSE 'PASS' END AS status
    FROM base b LEFT JOIN counts c ON b.dataset = c.dataset
    ORDER BY b.dataset
    """,
    "dq",
)
def dq_severity_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7+Q8: the full severity → summary → status chain (reference
    quality.py:123-249) over a three-dataset universe."""
    li = table(spark, sf_dir, "lineitem")
    ev = table(spark, sf_dir, "events")
    li_exc = Q.exceptions_df(
        li,
        "lineitem",
        [
            Q.Check("le_45", "l_quantity", F.col("l_quantity") <= 45),
            Q.Check("le_0.08", "l_discount", F.col("l_discount") <= 0.08),
        ],
        _li_row_id(),
    )
    ev_exc = Q.exceptions_df(
        ev,
        "events",
        [
            Q.required("value"),
            Q.isin(
                "event_type",
                (
                    "click",
                    "view",
                    "purchase",
                    "signup",
                    "error",
                    "page_view",
                    "checkout",
                    "login",
                    "logout",
                    "search",
                ),
            ),
        ],
        F.col("event_id").cast("string"),
    )
    exc = Q.with_severity(
        li_exc.unionByName(ev_exc), key_columns=("l_quantity",)
    )
    return Q.dq_summary(
        exc, ["lineitem", "events", "orders"], spark, fail_on="ERROR"
    ).orderBy("dataset")


@register(
    "dq_declared_length_audit",
    """
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN n_chars = length(text) THEN 0 ELSE 1 END)
                AS BIGINT) AS n_mismatched,
           CAST(max(abs(n_chars - length(text))) AS BIGINT) AS max_abs_delta
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    "quality",
    "llm",
)
def dq_declared_length_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-metadata vs payload consistency: does the ingest-time
    ``n_chars`` column actually equal ``length(text)``?  The
    LLM-corpus counterpart of the reference's row-level identity
    check (quality.py Q4 payroll identity): declared metadata is what
    downstream samplers/packers trust (s_weighted_sample weights by
    n_chars, s_size_balanced_shards bins by it), so a drifted or
    truncated payload silently corrupts every consumer.  One narrow
    map + per-source aggregate; at 100 TB this is the cheap audit you
    run on every ingest batch before the expensive stages."""
    d = table(spark, sf_dir, "documents")
    delta = F.col("n_chars") - F.length("text")
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(delta == 0, 0).otherwise(1))
            .cast("long")
            .alias("n_mismatched"),
            F.max(F.abs(delta)).cast("long").alias("max_abs_delta"),
        )
        .orderBy("source")
    )


# Sequence-gap audit: orderkey bands of 2^_GAP_SHIFT keys bound every
# window partition (TPC-H orderkeys are deliberately sparse, so the
# audit has real gaps to find).
_GAP_SHIFT = 12


@register(
    "dq_sequence_gaps",
    """
    WITH k AS (SELECT CAST(o_orderkey AS BIGINT) AS k FROM orders),
    d AS (SELECT k, lag(k) OVER (ORDER BY k) AS pk FROM k),
    g AS (
      SELECT k - pk - 1 AS gap FROM d WHERE pk IS NOT NULL AND k - pk > 1
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM k) AS n_keys,
           (SELECT min(k) FROM k) AS min_key,
           (SELECT max(k) FROM k) AS max_key,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(coalesce(sum(gap), 0) AS BIGINT) AS n_missing,
           CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap
    FROM g
    """,
    "dq",
    "window",
)
def dq_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-sequence gap audit: how many runs of consecutive ids are
    missing from ``o_orderkey``, how many ids they cover, and the
    largest hole — the completeness check every CDC/backfill pipeline
    runs on a supposedly-monotone source (a gap that grows run-over-
    run means upstream is dropping records).

    Scale: the textbook form is ``lag() OVER (ORDER BY k)`` — an
    unpartitioned window that single-threads the whole table.  This
    plan bands the key space order-preservingly (k >> _GAP_SHIFT, 4096
    keys per band): interior gaps come from a lag window PARTITIONED
    by band; gaps that straddle band boundaries come from a second lag
    over the per-band (min, max) summary — |keys|/4096 rows, and that
    stitching table can be re-banded recursively if even it is huge.
    No unpartitioned window ever sees fact-sized input.  Exact:
    every adjacent-key pair is examined exactly once (within its band,
    or at the boundary between two non-empty bands — empty bands fold
    into the boundary gap automatically)."""
    from pyspark.sql.window import Window

    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("k")
    )
    keys = o.select("k", F.shiftright(F.col("k"), _GAP_SHIFT).alias("band"))
    w_in = Window.partitionBy("band").orderBy("k")
    interior = (
        keys.select(
            "k", (F.col("k") - F.lag("k").over(w_in) - 1).alias("gap")
        )
        .filter(F.col("gap") > 0)
        .select("gap")
    )
    summary = keys.groupBy("band").agg(
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )
    w_b = Window.orderBy("band")
    boundary = (
        summary.select(
            (F.col("min_k") - F.lag("max_k").over(w_b) - 1).alias("gap")
        )
        .filter(F.col("gap") > 0)
        .select("gap")
    )
    gaps = interior.unionByName(boundary)
    gap_agg = gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.coalesce(F.sum("gap"), F.lit(0)).cast("long").alias("n_missing"),
        F.coalesce(F.max("gap"), F.lit(0)).cast("long").alias("max_gap"),
    )
    stats = summary.agg(
        F.sum("n").cast("long").alias("n_keys"),
        F.min("min_k").alias("min_key"),
        F.max("max_k").alias("max_key"),
    )
    # 1-row × 1-row join to assemble the report
    return stats.crossJoin(F.broadcast(gap_agg)).select(
        "n_keys", "min_key", "max_key", "n_gaps", "n_missing", "max_gap"
    )
