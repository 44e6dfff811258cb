"""Real image decoding (operators/multimodal.py decode_image): PPM(P6),
24-bit BMP, and 8-bit PNG synthesized byte-for-byte from the public
specs by independent test encoders (all five PNG scanline filters, CRCd
chunks, zlib streams), decoded with stdlib+numpy alone, and run through
the full decode -> resize -> checksum mapInPandas path on a Spark
DataFrame."""

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


# --------------------------------------------------------------------------
# PNG: spec-derived test encoder (signature, chunk CRCs, per-row filters,
# zlib deflate) -> stdlib+numpy decoder
# --------------------------------------------------------------------------


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def _filter_row(line: np.ndarray, prior: np.ndarray, ch: int, ftype: int) -> np.ndarray:
    """Apply the PNG filter FORWARD (encoder side) so the decoder must
    reverse it. line/prior are reconstructed byte rows."""
    out = np.zeros_like(line)
    for x in range(line.size):
        a = int(line[x - ch]) if x >= ch else 0
        b = int(prior[x])
        c = int(prior[x - ch]) if x >= ch else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[x] = (int(line[x]) - pred) & 0xFF
    return out


def make_png(
    arr: np.ndarray,
    color_type: int = 2,
    filters: list[int] | None = None,
    palette: np.ndarray | None = None,
    interlace: int = 0,
    bit_depth: int = 8,
) -> bytes:
    """Minimal PNG encoder written from the spec (independent of the
    decoder under test). arr is the raw sample matrix: (H, W) for gray /
    palette indices, (H, W, C) otherwise."""
    import zlib

    h, w = arr.shape[:2]
    ch = 1 if arr.ndim == 2 else arr.shape[2]
    filters = filters if filters is not None else [0] * h
    flat = arr.reshape(h, w * ch).astype(np.uint8)
    prior = np.zeros(w * ch, dtype=np.uint8)
    scanlines = b""
    for y in range(h):
        filtered = _filter_row(flat[y], prior, ch, filters[y])
        scanlines += bytes([filters[y]]) + filtered.tobytes()
        prior = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _png_chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    out += _png_chunk(b"IDAT", zlib.compress(scanlines))
    return out + _png_chunk(b"IEND", b"")


@pytest.mark.parametrize("w,h", [(7, 5), (64, 1), (16, 16)])
def test_png_rgb_roundtrip_unfiltered(w, h):
    img = _rgb(w, h)
    assert np.array_equal(decode_image(make_png(img)), img)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_each_filter_type_reverses(ftype):
    img = _rgb(9, 6)
    png = make_png(img, filters=[ftype] * 6)
    assert np.array_equal(decode_image(png), img)


def test_png_mixed_filters_reverses():
    img = _rgb(8, 5)
    png = make_png(img, filters=[0, 1, 2, 3, 4])
    assert np.array_equal(decode_image(png), img)


def test_png_rgba_drops_alpha():
    img = _rgb(6, 4)
    rgba = np.dstack([img, np.full((4, 6), 200, np.uint8)])
    png = make_png(rgba, color_type=6, filters=[4, 1, 2, 3])
    assert np.array_equal(decode_image(png), img)


def test_png_grayscale_expands_to_rgb():
    gray = (np.arange(30, dtype=np.uint8) * 7 % 256).reshape(5, 6)
    png = make_png(gray, color_type=0, filters=[1, 0, 2, 3, 4])
    out = decode_image(png)
    assert out.shape == (5, 6, 3)
    assert np.array_equal(out[:, :, 0], gray)
    assert np.array_equal(out[:, :, 1], gray)


def test_png_gray_alpha():
    gray = (np.arange(12, dtype=np.uint8) * 11).reshape(3, 4)
    ga = np.dstack([gray, np.full((3, 4), 128, np.uint8)])
    png = make_png(ga, color_type=4, filters=[2, 4, 1])
    out = decode_image(png)
    assert np.array_equal(out[:, :, 0], gray)


def test_png_palette():
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], np.uint8)
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], np.uint8)
    png = make_png(idx, color_type=3, palette=palette, filters=[0, 1])
    assert np.array_equal(decode_image(png), palette[idx])


def test_png_multiple_idat_chunks():
    """IDAT may be split arbitrarily; the concatenation is one zlib stream."""
    import zlib

    img = _rgb(10, 3)
    png = make_png(img)
    # split the single IDAT into two
    sig_end = 8 + 12 + 13  # signature + IHDR chunk
    (length,) = struct.unpack_from(">I", png, sig_end)
    idat_body = png[sig_end + 8 : sig_end + 8 + length]
    rest = png[sig_end + 12 + length :]
    half = len(idat_body) // 2
    rebuilt = (
        png[:sig_end]
        + _png_chunk(b"IDAT", idat_body[:half])
        + _png_chunk(b"IDAT", idat_body[half:])
        + rest
    )
    assert np.array_equal(decode_image(rebuilt), img)


def test_png_interlaced_raises():
    img = _rgb(4, 4)
    with pytest.raises(NotImplementedError, match="interlace"):
        decode_image(make_png(img, interlace=1))


def test_png_16bit_raises():
    img = _rgb(4, 4)
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_image(make_png(img, bit_depth=16))


def test_codec_formats_still_raise():
    # WebP container — the one remaining environment stub (JPEG now
    # decodes natively; see test_jpeg_decode.py)
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 garbage")


def test_real_decode_through_spark(spark):
    """The end-to-end claim: real image bytes in a binary column, decoded
    and resized inside mapInPandas, dims and output geometry correct."""
    blobs = [
        (1, make_ppm(_rgb(100, 40))),
        (2, make_bmp(_rgb(30, 80))),
        (3, make_ppm(_rgb(16, 16))),
        (4, make_png(_rgb(128, 20), filters=[4, 1, 2, 3] * 5)),
    ]
    df = spark.createDataFrame(blobs, "media_id long, content binary")
    feats = {r["media_id"]: r for r in extract_media_features(df).collect()}
    assert (feats[1]["width"], feats[1]["height"]) == (100, 40)
    assert (feats[2]["width"], feats[2]["height"]) == (30, 80)
    # fit-within-64 geometry: 100x40 -> 64x25 ; 30x80 -> 24x64 ; 16x16 kept
    assert (feats[1]["out_width"], feats[1]["out_height"]) == (64, 25)
    assert (feats[2]["out_width"], feats[2]["out_height"]) == (24, 64)
    assert (feats[3]["out_width"], feats[3]["out_height"]) == (16, 16)
    # PNG decoded inside the same mapInPandas pass: 128x20 -> 64x10
    assert (feats[4]["width"], feats[4]["height"]) == (128, 20)
    assert (feats[4]["out_width"], feats[4]["out_height"]) == (64, 10)

    resized = {r["media_id"]: r for r in resize_media(df, fake_decode=False).collect()}
    assert resized[1]["out_bytes"] == 64 * 25 * 3
    # identical content => identical checksum across rows/engines
    df2 = spark.createDataFrame([blobs[0], (9, blobs[0][1])],
                                "media_id long, content binary")
    again = {r["media_id"]: r["pixels_md5"]
             for r in resize_media(df2, fake_decode=False).collect()}
    assert again[1] == again[9] == resized[1]["pixels_md5"]


# ---------------------------------------------------------------- TIFF
def make_tiff(arr: np.ndarray, big_endian: bool = False,
              rows_per_strip: int | None = None, gray: bool = False) -> bytes:
    """Independent baseline-TIFF encoder (6.0 spec): header, strips,
    then one IFD with the required tags; values >4 bytes stored
    out-of-line after the IFD."""
    bo = ">" if big_endian else "<"
    h, w = arr.shape[:2]
    spp = 1 if gray else 3
    raster = (arr[:, :, 0] if gray else arr).tobytes()
    rps = rows_per_strip or h
    strips = [
        raster[i * rps * w * spp : (i + 1) * rps * w * spp]
        for i in range((h + rps - 1) // rps)
    ]
    header = (b"MM" if big_endian else b"II") + struct.pack(bo + "H", 42)
    # layout: header(8) | strip data | IFD | out-of-line values
    strip_start = 8
    offsets, pos = [], strip_start
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    ifd_off = pos
    header += struct.pack(bo + "I", ifd_off)

    entries = []  # (tag, type, count, packed_value_or_None, extra_list)
    def entry(tag, typ, values):
        entries.append((tag, typ, values))

    entry(256, 4, [w])
    entry(257, 4, [h])
    entry(258, 3, [8] * spp)
    entry(259, 3, [1])
    entry(262, 3, [1 if gray else 2])
    entry(273, 4, offsets)
    entry(277, 3, [spp])
    entry(278, 4, [rps])
    entry(279, 4, [len(s) for s in strips])
    entry(284, 3, [1])
    entries.sort()

    tsize = {3: 2, 4: 4}
    tcode = {3: "H", 4: "I"}
    extra_off = ifd_off + 2 + 12 * len(entries) + 4
    ifd = struct.pack(bo + "H", len(entries))
    extra = b""
    for tag, typ, values in entries:
        total = tsize[typ] * len(values)
        ifd += struct.pack(bo + "HHI", tag, typ, len(values))
        if total <= 4:
            packed = struct.pack(bo + tcode[typ] * len(values), *values)
            ifd += packed + b"\x00" * (4 - len(packed))
        else:
            ifd += struct.pack(bo + "I", extra_off + len(extra))
            extra += struct.pack(bo + tcode[typ] * len(values), *values)
    ifd += struct.pack(bo + "I", 0)  # no next IFD
    return header + b"".join(strips) + ifd + extra


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("w,h", [(5, 3), (16, 11)])
def test_tiff_rgb_roundtrip(w, h, big_endian):
    img = _rgb(w, h)
    got = decode_image(make_tiff(img, big_endian=big_endian))
    assert np.array_equal(got, img)


def test_tiff_multi_strip():
    img = _rgb(9, 10)
    got = decode_image(make_tiff(img, rows_per_strip=3))
    assert np.array_equal(got, img)


def test_tiff_grayscale_replicates():
    img = _rgb(6, 4)
    got = decode_image(make_tiff(img, gray=True))
    assert np.array_equal(got, img[:, :, :1].repeat(3, axis=2))


def test_tiff_compressed_stubs():
    img = _rgb(4, 4)
    data = bytearray(make_tiff(img))
    # flip the Compression tag value (259, type SHORT) to 5 (LZW)
    idx = data.find(struct.pack("<HH", 259, 3))
    assert idx > 0
    data[idx + 8] = 5
    with pytest.raises(NotImplementedError, match="compression"):
        decode_image(bytes(data))


def test_tiff_truncated_raises_valueerror():
    img = _rgb(8, 8)
    data = make_tiff(img)
    with pytest.raises(ValueError):
        decode_image(data[: len(data) // 3])


# ---------------------------------------------------------------- PNM family
def test_pgm_p5_grayscale():
    img = _rgb(7, 5)
    gray = img[:, :, 0]
    payload = b"P5\n7 5\n255\n" + gray.tobytes()
    got = decode_image(payload)
    assert np.array_equal(got, gray[:, :, None].repeat(3, axis=2))


def test_ppm_p3_ascii():
    img = _rgb(4, 3)
    body = " ".join(str(int(v)) for v in img.reshape(-1))
    payload = ("P3\n# ascii\n4 3\n255\n" + body).encode()
    assert np.array_equal(decode_image(payload), img)


def test_pgm_p2_ascii():
    img = _rgb(5, 2)
    gray = img[:, :, 0]
    body = "\n".join(str(int(v)) for v in gray.reshape(-1))
    payload = ("P2\n5 2\n255\n" + body).encode()
    got = decode_image(payload)
    assert np.array_equal(got, gray[:, :, None].repeat(3, axis=2))


def test_ascii_pnm_out_of_range_raises():
    with pytest.raises(ValueError, match="range"):
        decode_image(b"P2\n2 1\n255\n300 1")


def test_ascii_pnm_truncated_raises():
    with pytest.raises(ValueError, match="fewer samples"):
        decode_image(b"P3\n2 2\n255\n1 2 3")
