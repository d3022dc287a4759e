"""Privacy / governance scrubbing over the documents corpus.

Training-data pipelines must detect and redact PII before anything
ships to a tokenizer.  The operator here is the standard regex-class
scan (emails / phone numbers / IPv4 addresses) plus redaction, run as
narrow JVM-side maps — `regexp_extract_all` for counting and
`regexp_replace` for scrubbing, no UDFs.

The synthetic corpus is PII-free word soup, so the query INJECTS
deterministic synthetic PII into a fixed doc subset first (doc_id
divisible by 7 gets an e-mail + phone sentence appended; divisible by
13 gets an IP) — injection is part of the query text in BOTH engines,
so detection/redaction results are non-trivial AND oracle-verified.
Patterns are dialect-portable (character classes only — no
lookaround, anchors, or escapes that differ between Java regex and
RE2).

Scale: injection, scan, and redaction are all stateless per-row maps
(whole-stage codegen'd); the only shuffle is the final per-source
aggregate — bounded by |sources|, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.plans import register
from finance_etl_pipeline_spark.sources.readers import spread, table

_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z][a-z]+"
_PHONE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
_IPV4 = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"


@register(
    "tx_pii_scan",
    f"""
    WITH injected AS (
      SELECT doc_id, source,
             text
             || CASE WHEN doc_id % 7 = 0
                     THEN ' contact user' || CAST(doc_id AS VARCHAR)
                          || '@example.com or 555-123-4567'
                     ELSE '' END
             || CASE WHEN doc_id % 13 = 0
                     THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                          || '.1'
                     ELSE '' END AS text
      FROM documents
    ),
    scanned AS (
      SELECT doc_id, source,
             len(regexp_extract_all(text, '{_EMAIL}')) AS n_email,
             len(regexp_extract_all(text, '{_PHONE}')) AS n_phone,
             len(regexp_extract_all(text, '{_IPV4}')) AS n_ip,
             len(text)
               - len(regexp_replace(regexp_replace(regexp_replace(text,
                       '{_EMAIL}', '<EMAIL>', 'g'),
                       '{_PHONE}', '<PHONE>', 'g'),
                       '{_IPV4}', '<IP>', 'g')) AS len_delta
      FROM injected
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN n_email + n_phone + n_ip > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_pii,
           CAST(sum(n_email) AS BIGINT) AS n_emails,
           CAST(sum(n_phone) AS BIGINT) AS n_phones,
           CAST(sum(n_ip) AS BIGINT) AS n_ips,
           CAST(sum(len_delta) AS BIGINT) AS redaction_len_delta
    FROM scanned GROUP BY source ORDER BY source
    """,
    "llm",
    "governance",
    "text",
)
def tx_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scan + redaction accounting per source — see module
    docstring.  ``redaction_len_delta`` (original minus redacted
    length) proves the replace actually ran and is an integer-exact
    cross-engine checksum of the scrub."""
    docs = spread(table(spark, sf_dir, "documents"))
    injected = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com or 555-123-4567"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.concat(
                    F.lit(" host 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".1"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _EMAIL, "<EMAIL>"),
            _PHONE,
            "<PHONE>",
        ),
        _IPV4,
        "<IP>",
    )
    scanned = injected.select(
        "source",
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL), F.lit(0))).alias(
            "n_email"
        ),
        F.size(F.regexp_extract_all("text", F.lit(_PHONE), F.lit(0))).alias(
            "n_phone"
        ),
        F.size(F.regexp_extract_all("text", F.lit(_IPV4), F.lit(0))).alias(
            "n_ip"
        ),
        (F.length("text") - F.length(redacted)).alias("len_delta"),
    )
    return (
        scanned.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(
                    F.col("n_email") + F.col("n_phone") + F.col("n_ip") > 0, 1
                ).otherwise(0)
            ).alias("docs_with_pii"),
            F.sum("n_email").alias("n_emails"),
            F.sum("n_phone").alias("n_phones"),
            F.sum("n_ip").alias("n_ips"),
            F.sum("len_delta").alias("redaction_len_delta"),
        )
        .orderBy("source")
    )
