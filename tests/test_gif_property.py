"""Property-based round-trips for the native GIF decoder and the Puffin
KMV codec: random rasters x palette sizes x interlace x both independent
encoders (real string-table LZW and the clear-flood variant). GIF is
lossless, so every round-trip must be pixel-exact; the LZW width-growth
boundary (table size crossing a power of two mid-stream) is where a
spec misread would hide, and random data crosses it constantly."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_iceberg_exporter_spark.operators.gif import decode_gif
from opentelemetry_iceberg_exporter_spark.sinks.puffin import (
    decode_kmv,
    encode_kmv,
    kmv_estimate,
)

from test_gif_decode import make_gif

import pytest

# depth/property tier: full-coverage fuzz — slow tier (SPARK_GRAFT_FULL_TESTS=1)
pytestmark = pytest.mark.slow

dims = st.tuples(st.integers(1, 24), st.integers(1, 24))  # (w, h)
palette_exp = st.integers(1, 7)  # 2..128 colors


@settings(max_examples=40, deadline=None)
@given(dims=dims, exp=palette_exp, interlace=st.booleans(), data=st.data())
def test_random_rasters_roundtrip(dims, exp, interlace, data):
    w, h = dims
    n = 1 << exp
    rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1)))
    pal = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
    idx = rng.integers(0, n, size=(h, w), dtype=np.uint8)
    got = decode_gif(make_gif(idx, pal, interlace=interlace))
    assert np.array_equal(got, pal[idx])


@settings(max_examples=20, deadline=None)
@given(dims=dims, exp=st.integers(1, 4), data=st.data())
def test_clear_flood_encoder_roundtrip(dims, exp, data):
    w, h = dims
    n = 1 << exp
    rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1)))
    pal = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
    idx = rng.integers(0, n, size=(h, w), dtype=np.uint8)
    got = decode_gif(make_gif(idx, pal, trivial=True))
    assert np.array_equal(got, pal[idx])


@settings(max_examples=60, deadline=None)
@given(
    magic=st.sampled_from([b"P6", b"BM", b"\x89PNG\r\n\x1a\n", b"\xff\xd8",
                           b"GIF87a", b"GIF89a", b"II*\x00", b"MM\x00*",
                           b"RIFF", b""]),
    junk=st.binary(min_size=0, max_size=200),
)
def test_decode_image_corrupt_inputs_raise_only_contract_errors(magic, junk):
    """At corpus scale corrupt blobs are a certainty: decode_image must
    raise ONLY ValueError/NotImplementedError on arbitrary bytes —
    anything else would fail whole Arrow batches in the feature pass."""
    from opentelemetry_iceberg_exporter_spark.operators.multimodal import (
        decode_image,
    )

    try:
        decode_image(magic + junk)
    except (ValueError, NotImplementedError):
        pass


@settings(max_examples=50, deadline=None)
@given(
    hashes=st.lists(
        st.integers(0, (1 << 60) - 1), min_size=0, max_size=200, unique=True
    ),
    k=st.integers(1, 128),
)
def test_kmv_codec_roundtrip(hashes, k):
    out_k, out = decode_kmv(encode_kmv(hashes, k=k))
    assert out_k == k
    assert out == sorted(hashes)[:k]
    est = kmv_estimate(out_k, out)
    if len(hashes) < k:
        assert est == float(len(hashes))  # exact below k
    else:
        assert est >= 0.0


@settings(max_examples=30, deadline=None)
@given(
    dims=st.tuples(st.integers(1, 16), st.integers(1, 16)),
    big_endian=st.booleans(),
    gray=st.booleans(),
    data=st.data(),
)
def test_tiff_random_rasters_roundtrip(dims, big_endian, gray, data):
    """Random rasters x endianness x strip heights through the TIFF
    codec must round-trip exactly (lossless format)."""
    from test_image_decode import make_tiff
    from opentelemetry_iceberg_exporter_spark.operators.multimodal import (
        decode_image,
    )

    w, h = dims
    rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1)))
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    rps = data.draw(st.integers(1, h))
    got = decode_image(
        make_tiff(img, big_endian=big_endian, rows_per_strip=rps, gray=gray)
    )
    expect = img[:, :, :1].repeat(3, axis=2) if gray else img
    assert np.array_equal(got, expect)
