"""GIF decode (operators/gif.py): bytes are synthesized by an
INDEPENDENT encoder written directly from the GIF89a specification
(real string-table LZW with width growth, plus a trivial clear-flood
variant) — the decoder under test shares nothing with it except the
public spec. GIF is lossless, so every round-trip asserts exact pixel
equality."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from opentelemetry_iceberg_exporter_spark.operators.gif import decode_gif
from opentelemetry_iceberg_exporter_spark.operators.multimodal import (
    decode_image,
    extract_media_features,
)

# ------------------------------------------------------------ independent
# spec encoder (shares nothing with operators/gif.py)


def _pack_codes(codes_widths):
    """LSB-first bit packing per the spec."""
    acc = 0
    nbits = 0
    out = bytearray()
    for code, width in codes_widths:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_compress(indices, min_code_size):
    """Standard GIF LZW: string table, emit-then-add, width grows one
    step later than the decoder's (next_code == 2^width + 1)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = []
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    out.append((clear, width))
    s = bytes([indices[0]])
    for c in indices[1:]:
        sc = s + bytes([c])
        if sc in table:
            s = sc
            continue
        out.append((table[s], width))
        if next_code < 4096:
            table[sc] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        s = bytes([c])
    out.append((table[s], width))
    out.append((end, width))
    return _pack_codes(out)


def _lzw_trivial(indices, min_code_size):
    """Clear-flood encoder: a clear code before every pixel code — valid
    GIF that never grows the dictionary (exercises repeated clears)."""
    clear = 1 << min_code_size
    width = min_code_size + 1
    codes = []
    for i in indices:
        codes.append((clear, width))
        codes.append((int(i), width))
    codes.append((clear + 1, width))
    return _pack_codes(codes)


def _interleave_rows(h):
    return (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )


def make_gif(
    idx: np.ndarray,
    palette: np.ndarray,
    trivial: bool = False,
    interlace: bool = False,
    local_table: bool = False,
    with_extension: bool = True,
    version: bytes = b"89a",
) -> bytes:
    """Full GIF stream from an index raster + palette (palette length
    must be a power of two >= 2)."""
    h, w = idx.shape
    n = len(palette)
    exp = n.bit_length() - 2  # field stores 2^(exp+1) entries
    min_code = max(2, n.bit_length() - 1)
    buf = bytearray()
    buf += b"GIF" + version
    packed = (0 if local_table else 0x80) | exp
    buf += struct.pack("<HHBBB", w, h, packed, 0, 0)
    if not local_table:
        buf += palette.astype(np.uint8).tobytes()
    if with_extension:  # a graphic-control extension the decoder skips
        buf += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    rows = idx[np.asarray(_interleave_rows(h))] if interlace else idx
    ipacked = (0x80 if local_table else 0) | (0x40 if interlace else 0)
    if local_table:
        ipacked |= exp
    buf += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    if local_table:
        buf += palette.astype(np.uint8).tobytes()
    buf.append(min_code)
    flat = rows.reshape(-1).tolist()
    data = (_lzw_trivial if trivial else _lzw_compress)(flat, min_code)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        buf.append(len(chunk))
        buf += chunk
    buf += b"\x00\x3b"
    return bytes(buf)


def _palette(n):
    rng = np.random.RandomState(7)
    return rng.randint(0, 256, size=(n, 3)).astype(np.uint8)


def _raster(w, h, n, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randint(0, n, size=(h, w)).astype(np.uint8)


# ------------------------------------------------------------------- tests


@pytest.mark.parametrize("w,h", [(8, 8), (33, 17), (64, 64)])
def test_roundtrip_exact(w, h):
    pal = _palette(8)
    idx = _raster(w, h, 8)
    got = decode_gif(make_gif(idx, pal))
    assert got.shape == (h, w, 3)
    assert np.array_equal(got, pal[idx])


def test_dictionary_growth_and_width_bumps():
    """A long repetitive raster drives the LZW table through several
    code-width increases."""
    pal = _palette(4)
    idx = np.tile(np.arange(4, dtype=np.uint8), 64 * 64 // 4).reshape(64, 64)
    got = decode_gif(make_gif(idx, pal))
    assert np.array_equal(got, pal[idx])


def test_trivial_clear_flood_encoder():
    pal = _palette(16)
    idx = _raster(19, 7, 16)
    got = decode_gif(make_gif(idx, pal, trivial=True))
    assert np.array_equal(got, pal[idx])


def test_interlaced():
    pal = _palette(8)
    idx = _raster(21, 23, 8, seed=11)
    got = decode_gif(make_gif(idx, pal, interlace=True))
    assert np.array_equal(got, pal[idx])


def test_local_color_table():
    pal = _palette(8)
    idx = _raster(10, 10, 8)
    got = decode_gif(make_gif(idx, pal, local_table=True))
    assert np.array_equal(got, pal[idx])


def test_gif87a_without_extension():
    pal = _palette(4)
    idx = _raster(12, 5, 4)
    got = decode_gif(
        make_gif(idx, pal, with_extension=False, version=b"87a")
    )
    assert np.array_equal(got, pal[idx])


def test_two_color_min_code_floor():
    """1-bit palettes still use the spec's minimum LZW code size of 2."""
    pal = _palette(2)
    idx = _raster(16, 9, 2)
    got = decode_gif(make_gif(idx, pal))
    assert np.array_equal(got, pal[idx])


def test_corrupt_truncated_pixels():
    pal = _palette(4)
    idx = _raster(10, 10, 4)
    data = bytearray(make_gif(idx, pal))
    # truncate the last data sub-block hard
    with pytest.raises(ValueError):
        decode_gif(bytes(data[: len(data) // 2]) + b"\x00\x3b")


def test_not_a_gif_raises():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"RIFF....WEBP")


def test_dispatch_through_decode_image():
    pal = _palette(8)
    idx = _raster(20, 12, 8)
    got = decode_image(make_gif(idx, pal))
    assert got.shape == (12, 20, 3)


def test_corrupt_blob_yields_null_dims_not_job_failure(spark):
    """One corrupt payload in a batch must not fail the feature pass —
    it yields NULL dims and every other row still decodes."""
    pal = _palette(4)
    good = make_gif(_raster(10, 6, 4), pal)
    blobs = [
        (1, good),
        (2, b"GIF89a" + b"\x00\x01garbage"),  # corrupt
        (3, b"\x89PNG\r\n\x1a\ntruncated"),  # corrupt PNG
    ]
    df = spark.createDataFrame(blobs, "media_id long, content binary")
    feats = {r["media_id"]: r for r in extract_media_features(df).collect()}
    assert (feats[1]["width"], feats[1]["height"]) == (10, 6)
    assert feats[2]["width"] is None and feats[2]["out_bytes"] is None
    assert feats[3]["width"] is None
    assert feats[2]["n_bytes"] == len(blobs[1][1])  # row preserved


def test_gif_through_spark(spark):
    """GIF bytes in a binary column through the mapInPandas decode path."""
    pal = _palette(8)
    blobs = [
        (1, make_gif(_raster(100, 40, 8), pal)),
        (2, make_gif(_raster(30, 80, 8, seed=5), pal, interlace=True)),
    ]
    df = spark.createDataFrame(blobs, "media_id long, content binary")
    feats = {r["media_id"]: r for r in extract_media_features(df).collect()}
    assert (feats[1]["width"], feats[1]["height"]) == (100, 40)
    assert (feats[2]["width"], feats[2]["height"]) == (30, 80)
