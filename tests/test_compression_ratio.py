"""zlib compressibility: bounds, determinism, and discrimination."""

from __future__ import annotations

from pyspark.sql import functions as F

from finance_etl_pipeline_spark.operators.text import compression_ratio
from finance_etl_pipeline_spark.sources.readers import table


def test_ratio_bounds_and_determinism(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    out = compression_ratio(docs)
    rows = {r.doc_id: r.ratio_e4 for r in out.collect()}
    assert rows
    assert all(0 < v <= 15000 for v in rows.values())  # zlib never 0; small docs can expand
    again = {r.doc_id: r.ratio_e4 for r in compression_ratio(docs).collect()}
    assert rows == again


def test_repetitive_text_compresses_harder(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    rep = spark.createDataFrame(
        [(10_000_000, "spark " * 200)], "doc_id long, text string"
    )
    out = compression_ratio(docs.select("doc_id", "text").unionByName(rep))
    med = out.filter(F.col("doc_id") < 10_000_000).agg(
        F.expr("percentile(ratio_e4, 0.5)")
    ).first()[0]
    rep_ratio = out.filter(F.col("doc_id") == 10_000_000).first().ratio_e4
    assert rep_ratio < med / 2, (rep_ratio, med)
