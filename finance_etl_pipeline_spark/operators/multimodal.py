"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Design (BASELINE.json north_star): image/audio/video travel as
``binary`` columns with a typed metadata struct; decode / feature
extraction / resize / frame-sampling run as Arrow-batched Pandas UDF
stages over ``mapInPandas`` — the only place Python touches the data,
and it touches it one Arrow batch (not one row) at a time.

The decode step is STUBBED: the real image/audio libraries are not in
this container, so ``_fake_decode`` derives deterministic pseudo
-features from the payload bytes (and ``decode_image_real`` raises
``NotImplementedError`` where Pillow would be called).  Everything
around the stub — schema, batch iteration, partition behavior, column
pruning — is real and tested (tests/test_multimodal.py).

Scale notes: mapInPandas streams batches, so memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of
partition size; the payload column is only materialized in this stage
(upstream stages should select it away — binary blobs dominate I/O).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("checksum", LongType()),
    ]
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Synthesize an opaque binary column + media-type metadata from
    the documents table (in production this is the raw image/audio
    bytes read from the lake)."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").cast(BinaryType()).alias("payload"),
        F.when(F.col("doc_id") % 2 == 0, "image/png")
        .otherwise("audio/wav")
        .alias("media_type"),
    )


def decode_image_real(payload: bytes) -> tuple[int, int]:
    """Where Pillow/libvips would decode. Not available in this
    container — the pipeline uses ``_fake_decode`` instead."""
    raise NotImplementedError("image decoding libraries not installed")


def _fake_decode(payload: bytes | None) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: pseudo width/height from the
    leading bytes, additive checksum over the buffer. NULL payloads
    (e.g. encode(NULL text)) yield the zero-feature row instead of
    crashing the whole Arrow batch."""
    if not payload:
        return 64, 64, 0
    width = 64 + payload[0]
    height = 64 + (payload[1] if len(payload) > 1 else 0)
    checksum = sum(payload) % 1_000_000_007
    return width, height, checksum


def decode_features(payloads: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature stage over mapInPandas."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"]
                    .map(lambda b: len(b) if b is not None else 0)
                    .astype("int64"),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "checksum": [d[2] for d in decoded],
                }
            )

    return payloads.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample(payloads: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' over the opaque payload: emit one row per
    sampled offset (stands in for video frame extraction; the
    explode-shape and per-frame schema are the real contract)."""
    n_frames = F.greatest(
        (F.length("payload") / every_n_bytes).cast("int"), F.lit(1)
    )
    return payloads.select(
        "doc_id",
        "media_type",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no"),
        F.length("payload").cast("long").alias("n_bytes"),
    )
