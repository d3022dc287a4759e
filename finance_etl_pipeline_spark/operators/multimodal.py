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


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("target_w", IntegerType()),
        StructField("target_h", IntegerType()),
        StructField("resized", BinaryType()),
    ]
)


def resize_images(
    payloads: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Arrow-batched 'resize' stage over mapInPandas — the thumbnail/
    model-input normalization step of an image pipeline.

    The pixel work is stubbed (no Pillow in this container): the
    'resized' payload is a deterministic byte subsample of the source
    buffer whose length is ∝ target area, standing in for the actual
    resampler.  What is REAL and tested: the Arrow batch iteration,
    the binary-in/binary-out schema contract, null-payload safety,
    and that the stage composes after ``decode_features`` without
    re-reading the payload twice (single mapInPandas pass emits source
    dims + resized bytes together).

    Scale: identical posture to decode_features — memory bounded per
    Arrow batch; keep the payload column pruned everywhere upstream.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # resized length stands in for target_w*target_h*channels,
        # capped to the source length (subsample, never upsample bytes)
        target_len = max(1, (target_w * target_h) // 1024)
        for pdf in it:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            resized = []
            for p in pdf["payload"]:
                if not p:
                    resized.append(b"")
                    continue
                step = max(1, len(p) // target_len)
                resized.append(bytes(p[::step][:target_len]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "target_w": target_w,
                    "target_h": target_h,
                    "resized": resized,
                }
            )

    return payloads.mapInPandas(batches, RESIZE_SCHEMA)


AUDIO_WINDOW = 64  # payload bytes per analysis frame

ENERGY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_no", LongType()),
        StructField("energy", LongType()),
    ]
)


def audio_frame_energy(payloads: DataFrame) -> DataFrame:
    """Windowed byte-energy over the opaque payload — the audio
    feature-extraction stage (RMS-per-frame shape) as an
    Arrow-batched ``mapInPandas``.  Unlike the decode stub this does
    REAL arithmetic on the binary (numpy frombuffer → reshape →
    per-window sums), so the stage is fully value-verifiable: the
    payload is the document's UTF-8 bytes, and the oracle recomputes
    each window's energy from ASCII codes.  Frames are full
    AUDIO_WINDOW-byte windows; a trailing partial window is dropped
    (both engines).

    Scale: stateless per-row batches — Arrow moves each partition's
    payloads into numpy once; output rows ∝ total bytes / window."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            frames: list[int] = []
            energies: list[int] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8)
                n_full = len(arr) // AUDIO_WINDOW
                if n_full == 0:
                    continue
                sums = (
                    arr[: n_full * AUDIO_WINDOW]
                    .reshape(n_full, AUDIO_WINDOW)
                    .sum(axis=1, dtype=np.int64)
                )
                ids.extend([int(doc_id)] * n_full)
                frames.extend(range(n_full))
                energies.extend(int(s) for s in sums)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_no": frames, "energy": energies}
            )

    return payloads.mapInPandas(batches, ENERGY_SCHEMA)
