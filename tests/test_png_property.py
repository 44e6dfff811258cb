"""Property-based round-trip for the native PNG decoder: random pixel
matrices x random per-row scanline filters x every color type, encoded
by the independent spec-derived test encoder (test_image_decode.make_png)
and decoded by operators/multimodal._decode_png. The filter reversal
(especially Average/Paeth's left+prior dependency chains) is where a
spec misread would hide; random data exercises carry/wrap paths a
gradient fixture never hits."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_iceberg_exporter_spark.operators.multimodal import decode_image

from test_image_decode import make_png

dims = st.tuples(st.integers(1, 12), st.integers(1, 12))  # (w, h)
filter_types = st.integers(0, 4)


def _filters(h):
    return st.lists(filter_types, min_size=h, max_size=h)


@settings(max_examples=40, deadline=None)
@given(dims=dims, data=st.data())
def test_rgb_random_pixels_all_filters(dims, data):
    w, h = dims
    rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1)))
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    filters = data.draw(_filters(h))
    assert np.array_equal(decode_image(make_png(img, filters=filters)), img)


@settings(max_examples=25, deadline=None)
@given(dims=dims, data=st.data())
def test_rgba_random_pixels_all_filters(dims, data):
    w, h = dims
    rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1)))
    rgba = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
    filters = data.draw(_filters(h))
    out = decode_image(make_png(rgba, color_type=6, filters=filters))
    assert np.array_equal(out, rgba[:, :, :3])


@settings(max_examples=25, deadline=None)
@given(dims=dims, data=st.data())
def test_gray_random_pixels_all_filters(dims, data):
    w, h = dims
    rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1)))
    gray = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    filters = data.draw(_filters(h))
    out = decode_image(make_png(gray, color_type=0, filters=filters))
    assert np.array_equal(out[:, :, 0], gray)
    assert np.array_equal(out[:, :, 1], gray)
    assert np.array_equal(out[:, :, 2], gray)


@settings(max_examples=20, deadline=None)
@given(dims=dims, data=st.data())
def test_palette_random_indices(dims, data):
    w, h = dims
    rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1)))
    n_colors = data.draw(st.integers(1, 256))
    palette = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, size=(h, w), dtype=np.uint8)
    filters = data.draw(_filters(h))
    out = decode_image(make_png(idx, color_type=3, palette=palette, filters=filters))
    assert np.array_equal(out, palette[idx])
