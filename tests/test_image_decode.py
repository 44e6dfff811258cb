"""Real image decoding for uncompressed formats (operators/multimodal.py
decode_image): PPM(P6) and 24-bit BMP synthesized byte-for-byte from the
public specs, decoded with numpy alone, and run through the full
decode -> resize -> checksum mapInPandas path on a Spark DataFrame."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from opentelemetry_iceberg_exporter_spark.operators.multimodal import (
    decode_image,
    extract_media_features,
    resize_media,
)


def _rgb(w: int, h: int) -> np.ndarray:
    """Deterministic test image: channel-coded gradient."""
    x = np.arange(w, dtype=np.uint8)[None, :, None]
    y = np.arange(h, dtype=np.uint8)[:, None, None]
    return np.concatenate(
        [np.broadcast_to(x, (h, w, 1)),
         np.broadcast_to(y, (h, w, 1)),
         np.broadcast_to((x + y) % 251, (h, w, 1))],
        axis=2,
    ).astype(np.uint8)


def make_ppm(arr: np.ndarray, comment: bool = False) -> bytes:
    h, w = arr.shape[:2]
    header = b"P6\n"
    if comment:
        header += b"# a netpbm comment\n"
    header += f"{w} {h}\n255\n".encode()
    return header + arr.tobytes()


def make_bmp(arr: np.ndarray, top_down: bool = False) -> bytes:
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    bgr = arr[:, :, ::-1]
    rows = bgr if top_down else bgr[::-1]
    body = b"".join(
        rows[r].tobytes() + b"\x00" * (stride - w * 3) for r in range(h)
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24, 0, len(body),
        2835, 2835, 0, 0,
    )
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return header + info + body


@pytest.mark.parametrize("w,h", [(7, 5), (64, 1), (4, 4)])
def test_ppm_roundtrip(w, h):
    img = _rgb(w, h)
    assert np.array_equal(decode_image(make_ppm(img)), img)


def test_ppm_with_comment():
    img = _rgb(6, 3)
    assert np.array_equal(decode_image(make_ppm(img, comment=True)), img)


@pytest.mark.parametrize("top_down", [False, True])
@pytest.mark.parametrize("w,h", [(7, 5), (8, 4), (3, 9)])  # 7 -> padded stride
def test_bmp_roundtrip(w, h, top_down):
    img = _rgb(w, h)
    assert np.array_equal(decode_image(make_bmp(img, top_down)), img)


def test_codec_formats_still_raise():
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"\x89PNG\r\n\x1a\n garbage")


def test_real_decode_through_spark(spark):
    """The end-to-end claim: real image bytes in a binary column, decoded
    and resized inside mapInPandas, dims and output geometry correct."""
    blobs = [
        (1, make_ppm(_rgb(100, 40))),
        (2, make_bmp(_rgb(30, 80))),
        (3, make_ppm(_rgb(16, 16))),
    ]
    df = spark.createDataFrame(blobs, "media_id long, content binary")
    feats = {r["media_id"]: r for r in extract_media_features(df).collect()}
    assert (feats[1]["width"], feats[1]["height"]) == (100, 40)
    assert (feats[2]["width"], feats[2]["height"]) == (30, 80)
    # fit-within-64 geometry: 100x40 -> 64x25 ; 30x80 -> 24x64 ; 16x16 kept
    assert (feats[1]["out_width"], feats[1]["out_height"]) == (64, 25)
    assert (feats[2]["out_width"], feats[2]["out_height"]) == (24, 64)
    assert (feats[3]["out_width"], feats[3]["out_height"]) == (16, 16)

    resized = {r["media_id"]: r for r in resize_media(df, fake_decode=False).collect()}
    assert resized[1]["out_bytes"] == 64 * 25 * 3
    # identical content => identical checksum across rows/engines
    df2 = spark.createDataFrame([blobs[0], (9, blobs[0][1])],
                                "media_id long, content binary")
    again = {r["media_id"]: r["pixels_md5"]
             for r in resize_media(df2, fake_decode=False).collect()}
    assert again[1] == again[9] == resized[1]["pixels_md5"]
