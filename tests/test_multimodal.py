"""Multimodal plumbing: schema, batch shape, determinism, frame explode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from finance_etl_pipeline_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    decode_features,
    decode_image_real,
    frame_sample,
    with_binary_payload,
)
from finance_etl_pipeline_spark.sources.readers import table


def test_decode_features_schema_and_determinism(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(50)
    feats = decode_features(with_binary_payload(docs))
    assert feats.schema == FEATURE_SCHEMA
    rows1 = {r.doc_id: r for r in feats.collect()}
    rows2 = {r.doc_id: r for r in feats.collect()}
    assert rows1 == rows2  # deterministic across runs
    assert len(rows1) == 50
    one = next(iter(rows1.values()))
    assert one.n_bytes > 0 and one.width >= 64 and one.height >= 64


def test_payload_bytes_roundtrip(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(5)
    joined = (
        with_binary_payload(docs)
        .join(docs.select("doc_id", "text"), "doc_id")
        .select("doc_id", F.decode("payload", "utf-8").alias("decoded"), "text")
    )
    for r in joined.collect():
        assert r.decoded == r.text


def test_frame_sample_explodes(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(10)
    frames = frame_sample(with_binary_payload(docs), every_n_bytes=64)
    agg = frames.groupBy("doc_id").agg(F.count("*").alias("n"), F.max("n_bytes").alias("nb"))
    for r in agg.collect():
        assert r.n == max(r.nb // 64, 1)


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG")
