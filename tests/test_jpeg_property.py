"""Property-fuzz of the baseline JPEG codec (hypothesis — same
strategy as tests/test_skipping_property.py): the decoder must hold
its reconstruction envelopes over ARBITRARY dims and content, not
just the hand-picked cases, and the constant-block construction the
oracle rides must stay bit-exact everywhere."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from finance_etl_pipeline_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_rgb,
)

_SETTINGS = dict(max_examples=40, deadline=None)


@settings(**_SETTINGS)
@given(
    bh=st.integers(1, 4),
    bw=st.integers(1, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_constant_blocks_bit_exact_everywhere(bh, bw, seed):
    """The oracle construction: ANY constant-8×8-block grayscale image
    under the unit quant table round-trips bit-exactly."""
    rng = np.random.RandomState(seed)
    vals = rng.randint(0, 256, (bh, bw))
    img = np.kron(vals, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg([img]))
    assert out.shape == img.shape
    assert (out == img).all()


@settings(**_SETTINGS)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_gray_roundtrip_envelope_any_dims(h, w, seed):
    """Arbitrary content and NON-multiple-of-8 dims (edge-replicated
    pad + crop): reconstruction within the coefficient-rounding
    envelope, exact shape back."""
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg([img]))
    assert out.shape == (h, w)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


@settings(**_SETTINGS)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_color_roundtrip_envelope(h, w, seed):
    """4:4:4 color adds the YCbCr forward/inverse rounding: envelope
    widens to ±4, shape and channel order preserved."""
    rng = np.random.RandomState(seed)
    rgb = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_rgb(rgb))
    assert out.shape == rgb.shape
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 4


@settings(**_SETTINGS)
@given(
    seed=st.integers(0, 2**31 - 1),
    q=st.integers(1, 32),
)
def test_quantized_error_bounded_by_table(seed, q):
    """With a uniform quant table q, per-coefficient error is ≤ q/2;
    the spatial error after the orthonormal IDCT is bounded by
    (q/2)·Σ|basis| ≤ 4q — assert the practical half of that bound on
    smooth content (a violated bound means dequantize multiplies by
    the wrong table or the zigzag order is off)."""
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:16, 0:24]
    img = ((3 * x + 5 * y + int(rng.randint(0, 256))) % 256).astype(
        np.uint8
    )
    qt = np.full((8, 8), q, dtype=np.int64)
    out = decode_jpeg(encode_jpeg([img], quant=qt))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2 * q
