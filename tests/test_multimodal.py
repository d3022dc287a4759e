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


# ---------------------------------------------------------------------------
# Pure-numpy BMP decode (value-verified image path)
# ---------------------------------------------------------------------------


def test_decode_bmp_against_handwritten_file():
    """Decoder correctness independent of our own encoder: a 2x2
    24-bit BMP written out byte-by-byte.  Rows are stored bottom-up
    and BGR, with 2 padding bytes per row (2*3=6 -> stride 8):
      file row 0 = IMAGE BOTTOM row: (0,0,255) blue, (0,255,0) green
      file row 1 = IMAGE TOP row:    (255,0,0) red,  (255,255,255) white
    """
    import numpy as np

    from finance_etl_pipeline_spark.operators.multimodal import decode_bmp

    pixel_data = bytes(
        [255, 0, 0, 0, 255, 0, 0, 0]  # bottom row: blue px, green px, pad
        + [0, 0, 255, 255, 255, 255, 0, 0]  # top row: red px, white px, pad
    )
    header = (
        b"BM"
        + (54 + len(pixel_data)).to_bytes(4, "little")
        + b"\x00" * 4
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + (2).to_bytes(4, "little", signed=True)
        + (2).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(pixel_data).to_bytes(4, "little")
        + b"\x00" * 16
    )
    rgb = decode_bmp(header + pixel_data)
    expected = np.array(
        [
            [[255, 0, 0], [255, 255, 255]],  # image top: red, white
            [[0, 0, 255], [0, 255, 0]],  # image bottom: blue, green
        ],
        dtype=np.uint8,
    )
    assert (rgb == expected).all()


def test_encode_decode_bmp_roundtrip_all_padding_cases():
    """doc_ids 0..19 cover every (width, height) combination, i.e.
    every row-padding remainder (3w mod 4 in {0,1,2,3})."""
    import numpy as np

    from finance_etl_pipeline_spark.operators.multimodal import (
        _bmp_dims,
        _pixel_channels,
        decode_bmp,
        encode_bmp,
    )

    for doc_id in range(20):
        rgb = decode_bmp(encode_bmp(doc_id))
        w, h = _bmp_dims(doc_id)
        assert rgb.shape == (h, w, 3)
        r, g, b = _pixel_channels(doc_id, w, h)
        assert (rgb[:, :, 0] == r).all()
        assert (rgb[:, :, 1] == g).all()
        assert (rgb[:, :, 2] == b).all()


def test_decode_bmp_rejects_non_bmp_and_compressed():
    from finance_etl_pipeline_spark.operators.multimodal import decode_bmp

    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"PNG whatever")
    bad = bytearray(
        __import__(
            "finance_etl_pipeline_spark.operators.multimodal",
            fromlist=["encode_bmp"],
        ).encode_bmp(1)
    )
    bad[30] = 1  # compression = BI_RLE8
    with pytest.raises(ValueError, match="unsupported"):
        decode_bmp(bytes(bad))


def test_bmp_stats_stage_schema(spark, sf_dir):
    from finance_etl_pipeline_spark.operators.multimodal import (
        BMP_STATS_SCHEMA,
        bmp_decode_stats,
        with_bmp_payload,
    )

    docs = table(spark, sf_dir, "documents").limit(10)
    stats = bmp_decode_stats(with_bmp_payload(docs))
    assert stats.schema == BMP_STATS_SCHEMA
    rows = stats.collect()
    assert len(rows) == 10
    assert all(r.n_pixels == r.width * r.height for r in rows)


# ---------------------------------------------------------------------------
# PNG: pure numpy + zlib decode, all five scanline filters
# ---------------------------------------------------------------------------


def _hand_png(w, h, scanlines):
    """Assemble a PNG from hand-written (filter_type, filtered_bytes)
    scanlines — the byte layout is pinned HERE, independent of
    encode_png, so an encoder/decoder pair that agree on a wrong
    convention cannot pass."""
    import zlib

    from finance_etl_pipeline_spark.operators.multimodal import (
        PNG_SIG,
        _png_chunk,
    )

    raw = b"".join(bytes([ft]) + bytes(data) for ft, data in scanlines)
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def test_decode_png_handwritten_sub_and_up_filters():
    """2x2 RGB, row 0 Sub-filtered, row 1 Up-filtered — filtered bytes
    computed by hand from the spec formulas."""
    import numpy as np

    from finance_etl_pipeline_spark.operators.multimodal import decode_png

    # raw pixels: (10,20,30)(40,50,60) / (70,80,90)(15,25,35)
    payload = _hand_png(
        2,
        2,
        [
            (1, [10, 20, 30, 30, 30, 30]),  # Sub: x - left(bpp=3)
            (2, [60, 60, 60, 231, 231, 231]),  # Up: x - above, mod 256
        ],
    )
    rgb = decode_png(payload)
    expect = np.array(
        [[[10, 20, 30], [40, 50, 60]], [[70, 80, 90], [15, 25, 35]]],
        dtype=np.uint8,
    )
    assert rgb.shape == (2, 2, 3)
    assert (rgb == expect).all()


def test_decode_png_handwritten_average_and_paeth_filters():
    """2x3 RGB: row 0 None, row 1 Average, row 2 Paeth — every
    predictor branch of Paeth (left vs above) exercised, filtered
    bytes derived by hand."""
    import numpy as np

    from finance_etl_pipeline_spark.operators.multimodal import decode_png

    payload = _hand_png(
        2,
        3,
        [
            (0, [1, 2, 3, 4, 5, 6]),
            # Average: raw [10,20,30,40,50,60]; pred=(left+up)//2
            (3, [10, 19, 29, 33, 38, 42]),
            # Paeth: raw [100,110,120,130,140,150]; pred=b for first
            # pixel (pb=0), pred=a for second (pa smallest)
            (4, [90, 90, 90, 30, 30, 30]),
        ],
    )
    rgb = decode_png(payload)
    expect = np.array(
        [
            [[1, 2, 3], [4, 5, 6]],
            [[10, 20, 30], [40, 50, 60]],
            [[100, 110, 120], [130, 140, 150]],
        ],
        dtype=np.uint8,
    )
    assert (rgb == expect).all()


def test_encode_decode_png_roundtrip_all_filters_and_dims():
    """doc_ids 0..23 cover every (w, h) dims case and, via the
    (doc_id + y) % 5 filter cycle, every filter type in every row
    position; decode must reproduce the generator formulas exactly."""
    import numpy as np

    from finance_etl_pipeline_spark.operators.multimodal import (
        _pixel_channels,
        _png_dims,
        decode_png,
        encode_png,
    )

    for doc_id in range(24):
        w, h = _png_dims(doc_id)
        rgb = decode_png(encode_png(doc_id))
        assert rgb.shape == (h, w, 3)
        r, g, b = _pixel_channels(doc_id, w, h)
        assert (rgb == np.stack([r, g, b], axis=2)).all()


def test_decode_png_rejects_bad_inputs():
    import zlib

    from finance_etl_pipeline_spark.operators.multimodal import (
        PNG_SIG,
        decode_png,
        encode_png,
    )

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BM" + b"\x00" * 60)
    # corrupt a CRC byte: must be detected, not silently mis-decoded
    good = bytearray(encode_png(3))
    good[-1] ^= 0xFF  # IEND CRC
    with pytest.raises(ValueError, match="bad CRC"):
        decode_png(bytes(good))
    # grayscale (color type 0) is honestly unsupported
    ihdr = (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes(
        [8, 0, 0, 0, 0]
    )
    from finance_etl_pipeline_spark.operators.multimodal import _png_chunk

    bad = PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(
        b"IDAT", zlib.compress(b"\x00\x01\x02")
    ) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_png(bad)


def test_decode_features_dispatches_to_real_decoders(spark, sf_dir):
    """A real PNG payload takes the real decode path: width/height are
    the PNG's actual dims (not the pseudo-features), and the checksum
    is the true pixel sum."""
    import numpy as np

    from finance_etl_pipeline_spark.operators.multimodal import (
        _pixel_channels,
        _png_dims,
        encode_png,
    )

    rows = [(int(i), encode_png(int(i)), "image/png") for i in range(6)]
    payloads = spark.createDataFrame(
        rows, "doc_id long, payload binary, media_type string"
    )
    feats = {r.doc_id: r for r in decode_features(payloads).collect()}
    for i in range(6):
        w, h = _png_dims(i)
        assert (feats[i].width, feats[i].height) == (w, h)
        r, g, b = _pixel_channels(i, w, h)
        pixel_sum = int(r.astype(np.int64).sum() + g.astype(np.int64).sum() + b.astype(np.int64).sum())
        assert feats[i].checksum == pixel_sum % 1_000_000_007


# ------------------------------- JPEG codec (operators/jpeg.py) -----


def test_jpeg_constant_blocks_bit_exact():
    """The oracle construction: constant 8×8 blocks under an all-ones
    quant table round-trip BIT-EXACTLY through the lossy format."""
    import numpy as np

    from finance_etl_pipeline_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.RandomState(7)
    for _ in range(4):
        bh, bw = rng.randint(1, 4), rng.randint(1, 5)
        vals = rng.randint(0, 256, (bh, bw))
        img = np.kron(vals, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
        out = decode_jpeg(encode_jpeg([img]))
        assert out.shape == img.shape
        assert (out == img).all()


def test_jpeg_general_content_error_envelope():
    """The decoder is GENERAL, not a constant-block special case:
    gradients and noise (non-multiple-of-8 dims — edge-replicated
    padding + crop) reconstruct within the coefficient-rounding
    envelope; 4:4:4 color adds YCbCr rounding."""
    import numpy as np

    from finance_etl_pipeline_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_rgb,
    )

    rng = np.random.RandomState(13)
    for h, w in [(5, 37), (23, 9), (16, 16)]:
        y, x = np.mgrid[0:h, 0:w]
        img = ((2 * x + 3 * y) % 256).astype(np.uint8)
        out = decode_jpeg(encode_jpeg([img]))
        assert out.shape == (h, w)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2
    noise = rng.randint(0, 256, (24, 16)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg([noise]))
    assert np.abs(out.astype(int) - noise.astype(int)).max() <= 2
    rgb = rng.randint(0, 256, (19, 21, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_rgb(rgb))
    assert out.shape == rgb.shape
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 4


def test_jpeg_quantized_path_and_huffman_generality():
    """A coarse quant table exercises real dequantization (decoded
    coefficients ≠ stored ones), and noisy content populates wide
    Huffman symbol sets — the decoder rebuilds whatever canonical
    tables the DHT declares."""
    import numpy as np

    from finance_etl_pipeline_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    q = np.full((8, 8), 16, dtype=np.int64)
    q[0, 0] = 8
    y, x = np.mgrid[0:32, 0:32]
    img = ((5 * x) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg([img], quant=q))
    # lossy but bounded: smooth content under q=16 stays within ~q/2
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 10


def test_jpeg_loud_rejects():
    """Unsupported shapes raise with the feature NAMED — never a
    silently wrong image."""
    import numpy as np
    import pytest as _pytest

    from finance_etl_pipeline_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    img = np.zeros((8, 8), dtype=np.uint8)
    good = bytearray(encode_jpeg([img]))
    i = bytes(good).find(b"\xff\xc0")
    prog = bytearray(good)
    prog[i + 1] = 0xC2  # SOF2: progressive
    with _pytest.raises(ValueError, match="SOF.*unsupported"):
        decode_jpeg(bytes(prog))
    sub = bytearray(good)
    # FFC0 len(2) prec(1) h(2) w(2) ncomp(1) id(1) SAMPLING(1) ...
    sub[i + 11] = 0x22  # sampling 2x2 on component 1
    with _pytest.raises(ValueError, match="subsampling"):
        decode_jpeg(bytes(sub))
    with _pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"RIFFxxxxWEBP")


def test_dispatch_decode_routes_jpeg(spark, sf_dir):
    """decode_features' magic-byte dispatch takes the REAL decode path
    for JPEG payloads: width/height from actual pixel parsing,
    checksum = pixel sum — distinguishable from the _fake_decode
    stand-in by construction."""
    import numpy as np

    from finance_etl_pipeline_spark.operators.jpeg import decode_jpeg
    from finance_etl_pipeline_spark.operators.multimodal import (
        _dispatch_decode,
        encode_jpeg_doc,
    )

    for doc_id in (0, 1, 2, 3, 4, 5):
        payload = encode_jpeg_doc(doc_id)
        w, h, checksum = _dispatch_decode(payload)
        px = decode_jpeg(payload)
        assert (w, h) == (px.shape[1], px.shape[0])
        assert checksum == int(px.sum()) % 1_000_000_007
        # and the dims follow the documented grid
        assert w == 8 * (2 + doc_id % 3) and h == 8 * (1 + doc_id % 2)


# ------------------------------- WAV codec --------------------------


def test_wav_roundtrip_exact_and_chunk_walk():
    """PCM16 samples round-trip bit-exactly, and the chunk walk skips
    unknown chunks (LIST metadata etc.) with word alignment."""
    import numpy as np

    from finance_etl_pipeline_spark.operators.multimodal import (
        _wav_n_samples,
        _wav_sample,
        decode_wav,
        encode_wav,
    )

    for d in (0, 1, 2, 5, 17):
        rate, s = decode_wav(encode_wav(d))
        assert rate == 8000 and len(s) == _wav_n_samples(d)
        i = np.arange(len(s), dtype=np.int64)
        assert (s.astype(np.int64) == _wav_sample(d, i)).all()
    # inject an odd-length unknown chunk before data: must be skipped
    raw = bytearray(encode_wav(3))
    di = bytes(raw).find(b"data")
    junk = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"  # padded
    patched = bytes(raw[:di]) + junk + bytes(raw[di:])
    patched = (
        patched[:4]
        + (len(patched) - 8).to_bytes(4, "little")
        + patched[8:]
    )
    rate, s = decode_wav(patched)
    assert len(s) == _wav_n_samples(3)


def test_wav_loud_rejects():
    import pytest as _pytest

    from finance_etl_pipeline_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    good = bytearray(encode_wav(1))
    fi = bytes(good).find(b"fmt ")
    stereo = bytearray(good)
    stereo[fi + 10] = 2  # channels field
    with _pytest.raises(ValueError, match="channel"):
        decode_wav(bytes(stereo))
    mulaw = bytearray(good)
    mulaw[fi + 8] = 7  # audio format field
    with _pytest.raises(ValueError, match="PCM only"):
        decode_wav(bytes(mulaw))
    with _pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + b"\x00" * 40)


# ------------------------------- AVI/MJPEG video --------------------


def test_avi_roundtrip_and_frame_order():
    import numpy as np

    from finance_etl_pipeline_spark.operators.jpeg import decode_jpeg
    from finance_etl_pipeline_spark.operators.video import (
        _avi_dims,
        _avi_n_frames,
        _frame_block_value,
        decode_avi_frames,
        encode_avi,
    )

    for d in range(6):
        frames = decode_avi_frames(encode_avi(d))
        assert len(frames) == _avi_n_frames(d)
        w, h = _avi_dims(d)
        for f, jb in enumerate(frames):
            px = decode_jpeg(jb)
            assert px.shape == (h, w)
            bx = np.arange(w // 8, dtype=np.int64)[None, :]
            by = np.arange(h // 8, dtype=np.int64)[:, None]
            want = np.kron(
                _frame_block_value(d, f, bx, by), np.ones((8, 8), np.int64)
            ).astype(np.uint8)
            assert (px == want).all()


def test_avi_loud_rejects_and_unknown_chunk_skip():
    import pytest as _pytest

    from finance_etl_pipeline_spark.operators.video import (
        _avi_n_frames,
        decode_avi_frames,
        encode_avi,
    )

    good = encode_avi(2)
    # non-MJPG codec fourcc in strf: rejected with the fourcc named
    bad = bytearray(good)
    i = bytes(bad).find(b"MJPG", bytes(bad).find(b"strf"))
    bad[i : i + 4] = b"H264"
    with _pytest.raises(ValueError, match="H264"):
        decode_avi_frames(bytes(bad))
    with _pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi_frames(b"\x00" * 32)
    # an injected unknown top-level chunk (odd length, so alignment
    # matters) must be skipped, frames intact
    mi = good.find(b"LIST", 12)
    junk = b"JUNK" + (5).to_bytes(4, "little") + b"abcde" + b"\x00"
    patched = good[:mi] + junk + good[mi:]
    patched = (
        patched[:4]
        + (len(patched) - 8).to_bytes(4, "little")
        + patched[8:]
    )
    assert len(decode_avi_frames(patched)) == _avi_n_frames(2)


def test_sampled_frame_stats_decodes_only_stride(spark, sf_dir):
    """One row per SAMPLED frame, stride honored, n_frames exact."""
    from finance_etl_pipeline_spark.operators.video import (
        FRAME_STATS_SCHEMA,
        sampled_frame_stats,
        with_avi_payload,
    )

    docs = table(spark, sf_dir, "documents").limit(12)
    out = sampled_frame_stats(with_avi_payload(docs), stride=2)
    assert out.schema == FRAME_STATS_SCHEMA
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in by_doc.items():
        nf = 4 + doc_id % 3
        assert sorted(r.frame_no for r in rs) == list(range(0, nf, 2))
        assert all(r.n_frames == nf for r in rs)
