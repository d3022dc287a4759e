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


def test_resize_stage_contract(spark, sf_dir):
    """Resize composes on the payload table: one mapInPandas pass emits
    source dims + resized binary; resized length is capped by target
    area and deterministic; null payloads yield empty bytes."""
    from finance_etl_pipeline_spark.operators.multimodal import (
        resize_images,
        with_binary_payload,
    )
    from finance_etl_pipeline_spark.sources.readers import table

    docs = table(spark, sf_dir, "documents").limit(50)
    out = resize_images(with_binary_payload(docs), 224, 224)
    rows = out.collect()
    assert len(rows) == 50
    target_len = (224 * 224) // 1024
    for r in rows:
        assert r["target_w"] == 224 and r["target_h"] == 224
        assert r["width"] >= 64 and r["height"] >= 64
        assert len(r["resized"]) <= target_len
        assert isinstance(r["resized"], (bytes, bytearray))
    # determinism: same input -> same bytes
    again = {r["doc_id"]: bytes(r["resized"]) for r in out.collect()}
    first = {r["doc_id"]: bytes(r["resized"]) for r in rows}
    assert again == first


def test_resize_null_payload_safe(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType

    from finance_etl_pipeline_spark.operators.multimodal import resize_images

    df = spark.range(3).select(
        F.col("id").alias("doc_id"),
        F.lit(None).cast(BinaryType()).alias("payload"),
        F.lit("image/png").alias("media_type"),
    )
    rows = resize_images(df).collect()
    assert [bytes(r["resized"]) for r in rows] == [b"", b"", b""]
