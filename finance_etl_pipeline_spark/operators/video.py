"""MJPEG-in-AVI video — real container parsing + per-frame decode +
TRUE frame sampling, pure stdlib+numpy, built from the public RIFF/AVI
layout (the 'hdrl'/'movi' LIST structure of the Microsoft AVI spec)
and this repo's own baseline JPEG codec (``operators/jpeg.py``).

This closes VIDEO the way the codecs closed images and WAV closed
audio: the synthetic corpus gets real, structurally-valid AVI files
whose frames are constant-block JPEGs (bit-exact under the unit quant
table), so per-sampled-frame pixel statistics are recomputable by the
DuckDB oracle — while the Spark-side stages exercise an honest
container walk (word-aligned chunk iteration, 'movi' discovery, MJPG
fourcc check) and honest frame decode, not a byte-offset stand-in.

Scope (loud rejects): one MJPG video stream, '00dc' frame chunks; no
index requirement ('idx1' optional and ignored), no audio streams, no
other codecs.  Frame SAMPLING decodes only the selected frames — the
point of sampling at 100 TB is that unsampled frames cost nothing
beyond the chunk-walk skip.

Reference parity: the reference pipeline has no media handling
(reference src/finance_etl/*); this extends the multimodal layer.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

#: fixed sampling stride of the verified pipeline (every 2nd frame)
FRAME_STRIDE = 2


def _avi_dims(doc_id: int) -> tuple[int, int]:
    """Frame dims: width 16/24, height 8/16 — whole 8×8 blocks (the
    bit-exact JPEG construction) on a grid distinct from the still-
    image families."""
    return 8 * (2 + doc_id % 2), 8 * (1 + (doc_id // 2) % 2)


def _avi_n_frames(doc_id: int) -> int:
    return 4 + doc_id % 3


def _frame_block_value(doc_id: int, f: int, bx, by):
    """Pixel value of block (bx, by) in frame f — mirrored by the
    oracle with x//8, y//8."""
    return (11 * doc_id + 17 * f + 13 * bx + 29 * by) % 256


def _frame_jpeg(doc_id: int, f: int) -> bytes:
    import numpy as np

    from finance_etl_pipeline_spark.operators.jpeg import encode_jpeg

    w, h = _avi_dims(doc_id)
    bx = np.arange(w // 8, dtype=np.int64)[None, :]
    by = np.arange(h // 8, dtype=np.int64)[:, None]
    vals = _frame_block_value(doc_id, f, bx, by)
    img = np.kron(vals, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
    return encode_jpeg([img])


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cid + len(body).to_bytes(4, "little") + body + pad


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def encode_avi(doc_id: int) -> bytes:
    """A structurally valid single-stream MJPG AVI: RIFF('AVI ') with
    LIST('hdrl') carrying avih + one LIST('strl') of strh/strf, and
    LIST('movi') of one '00dc' chunk per JPEG frame."""
    w, h = _avi_dims(doc_id)
    n = _avi_n_frames(doc_id)
    frames = [_frame_jpeg(doc_id, f) for f in range(n)]
    bufsize = max(len(fb) for fb in frames)
    avih = (
        (40_000).to_bytes(4, "little")       # usec per frame (25 fps)
        + (bufsize * 25).to_bytes(4, "little")  # max bytes/sec
        + (0).to_bytes(4, "little")          # padding granularity
        + (0).to_bytes(4, "little")          # flags
        + n.to_bytes(4, "little")            # total frames
        + (0).to_bytes(4, "little")          # initial frames
        + (1).to_bytes(4, "little")          # streams
        + bufsize.to_bytes(4, "little")      # suggested buffer
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + b"\x00" * 16                       # reserved
    )
    strh = (
        b"vids" + b"MJPG"
        + (0).to_bytes(4, "little")          # flags
        + (0).to_bytes(2, "little")          # priority
        + (0).to_bytes(2, "little")          # language
        + (0).to_bytes(4, "little")          # initial frames
        + (1).to_bytes(4, "little")          # scale
        + (25).to_bytes(4, "little")         # rate -> 25 fps
        + (0).to_bytes(4, "little")          # start
        + n.to_bytes(4, "little")            # length (frames)
        + bufsize.to_bytes(4, "little")
        + (0xFFFFFFFF).to_bytes(4, "little")  # quality: default
        + (0).to_bytes(4, "little")          # sample size (varies)
        + (0).to_bytes(2, "little") * 2      # rcFrame left/top
        + w.to_bytes(2, "little")
        + h.to_bytes(2, "little")
    )
    strf = (
        (40).to_bytes(4, "little")           # BITMAPINFOHEADER size
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")          # planes
        + (24).to_bytes(2, "little")         # bit count
        + b"MJPG"                            # compression fourcc
        + (w * h * 3).to_bytes(4, "little")  # size image
        + b"\x00" * 16
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", fb) for fb in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _walk_chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_len) over a RIFF chunk run,
    honoring word alignment."""
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        ln = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        yield cid, pos + 8, ln
        pos += 8 + ln + (ln & 1)


def decode_avi_frames(payload: bytes) -> list[bytes]:
    """The ordered JPEG payloads of a single-stream MJPG AVI — a real
    chunk walk: verify RIFF/'AVI ', check the declared stream codec is
    MJPG (anything else raises with the fourcc named), find the
    'movi' LIST, collect '00dc' frame chunks.  No index is required;
    'idx1' and unknown chunks are skipped by the alignment rules."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    frames: list[bytes] = []
    codec = None
    for cid, start, ln in _walk_chunks(payload, 12, len(payload)):
        if cid != b"LIST":
            continue
        ltype = payload[start : start + 4]
        if ltype == b"hdrl":
            for c2, s2, l2 in _walk_chunks(payload, start + 4, start + ln):
                if c2 == b"LIST" and payload[s2 : s2 + 4] == b"strl":
                    for c3, s3, l3 in _walk_chunks(
                        payload, s2 + 4, s2 + l2
                    ):
                        if c3 == b"strf":
                            codec = payload[s3 + 16 : s3 + 20]
        elif ltype == b"movi":
            if codec != b"MJPG":
                raise ValueError(
                    f"AVI stream codec {codec!r} unsupported (MJPG only)"
                )
            for c2, s2, l2 in _walk_chunks(payload, start + 4, start + ln):
                if c2 == b"00dc":
                    frames.append(payload[s2 : s2 + l2])
    if not frames:
        raise ValueError("AVI has no 00dc frames")
    return frames


def with_avi_payload(docs: DataFrame) -> DataFrame:
    """Arrow-batched synth stage: one real MJPG AVI per doc_id."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": [encode_avi(int(d)) for d in pdf["doc_id"]],
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
        ]
    )
    return docs.select("doc_id").mapInPandas(batches, schema)


FRAME_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sum_v", LongType()),
        StructField("wsum_y", LongType()),
    ]
)


def sampled_frame_stats(
    payloads: DataFrame, stride: int = FRAME_STRIDE
) -> DataFrame:
    """TRUE frame sampling: walk the container, decode ONLY frames
    0, stride, 2·stride, ... (unsampled frames cost one chunk-walk
    skip, never a decode — the property that makes sampling pay at
    scale), and emit per-sampled-frame grayscale statistics.  One row
    per sampled frame; Arrow mapInPandas, binary in / scalars out."""
    import numpy as np

    from finance_etl_pipeline_spark.operators.jpeg import decode_jpeg

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "frame_no", "n_frames", "width", "height",
                "sum_v", "wsum_y",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                jpegs = decode_avi_frames(bytes(payload))
                for f in range(0, len(jpegs), stride):
                    px = decode_jpeg(jpegs[f]).astype(np.int64)
                    h, w = px.shape
                    ys = np.arange(h, dtype=np.int64)[:, None]
                    out["doc_id"].append(int(doc_id))
                    out["frame_no"].append(f)
                    out["n_frames"].append(len(jpegs))
                    out["width"].append(w)
                    out["height"].append(h)
                    out["sum_v"].append(int(px.sum()))
                    out["wsum_y"].append(int((ys * px).sum()))
            pdf_out = pd.DataFrame(out)
            for c in ("frame_no", "n_frames", "width", "height"):
                pdf_out[c] = pdf_out[c].astype("int32")
            yield pdf_out

    return payloads.mapInPandas(batches, FRAME_STATS_SCHEMA)
