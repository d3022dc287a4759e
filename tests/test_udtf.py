"""SpanSplitter UDTF: spans must tile the document text losslessly
(modulo the single separator spaces between spans) and respect the
width/word-boundary contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from finance_etl_pipeline_spark.functions.udtfs import SPAN_WIDTH, SpanSplitter
from finance_etl_pipeline_spark.sources.readers import table


def test_spans_tile_documents(spark, sf_dir):
    spark.udtf.register("split_spans", SpanSplitter)
    table(spark, sf_dir, "documents").createOrReplaceTempView("docs_v")
    spans = spark.sql(
        """
        SELECT d.doc_id, s.span_idx, s.start_char, s.end_char, s.span_text
        FROM docs_v d, LATERAL split_spans(d.text) s
        """
    ).collect()
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.table("docs_v").select("doc_id", "text").collect()
    }

    by_doc: dict[int, list] = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(texts)

    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["span_idx"])
        text = texts[doc_id]
        rebuilt = " ".join(r["span_text"] for r in rows)
        # spans + single separator spaces reproduce the text exactly
        # (the corpus is single-spaced, so the join is lossless)
        assert rebuilt == text, f"doc {doc_id} spans do not tile"
        for r in rows:
            assert r["span_text"] == text[r["start_char"] : r["end_char"]]
            # width contract: spans only exceed the target when a
            # single word is longer than the window
            if r["end_char"] - r["start_char"] > SPAN_WIDTH:
                assert " " not in r["span_text"]
