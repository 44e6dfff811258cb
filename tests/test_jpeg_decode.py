"""Baseline JPEG decode (operators/jpeg.py): bytes are synthesized by an
INDEPENDENT encoder written directly from ITU-T T.81 (Annex K quant +
Huffman tables, forward DCT, run-length/magnitude entropy coding, byte
stuffing, restart markers) — the decoder under test shares nothing with
it except the public spec. JPEG is lossy, so assertions are tolerance-
based: near-exact for flat blocks, small mean error for gradients."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from opentelemetry_iceberg_exporter_spark.operators.jpeg import decode_jpeg
from opentelemetry_iceberg_exporter_spark.operators.multimodal import (
    decode_image,
    extract_media_features,
)

# ---------------------------------------------------------------- tables
# T.81 Annex K.1/K.2 quantization tables (raster order)
QT_LUM = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61,
     12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56,
     14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77,
     24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101,
     72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
QT_CHROM = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32, dtype=np.int32)

# T.81 Annex K.3 typical Huffman tables: (bits-per-length, symbols)
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

ZIGZAG = np.array(
    [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
     12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
     35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
     58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

_A = np.zeros((8, 8))
for _u in range(8):
    _al = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _A[_u, _x] = _al * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of a base table (public formula)."""
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int32)


def _enc_table(counts: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


class _Writer:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, bits: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((bits >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:  # pad the final byte with 1-bits (T.81 F.1.2.3)
        while self.n:
            self.put(1, 1)


def _fdct_quant(block: np.ndarray, q_zz: np.ndarray) -> np.ndarray:
    coeff = _A @ (block.astype(np.float64) - 128.0) @ _A.T
    return np.round(coeff.flatten()[ZIGZAG] / q_zz).astype(np.int64)


def _encode_block(w: _Writer, zz: np.ndarray, pred: int,
                  dc: dict, ac: dict) -> int:
    diff = int(zz[0]) - pred
    s = int(abs(diff)).bit_length()
    ln, code = dc[s]
    w.put(code, ln)
    if s:
        w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac[0xF0]  # ZRL
            w.put(code, ln)
            run -= 16
        sv = int(abs(v)).bit_length()
        ln, code = ac[(run << 4) | sv]
        w.put(code, ln)
        w.put(v if v >= 0 else v + (1 << sv) - 1, sv)
        run = 0
    if run:
        ln, code = ac[0x00]  # EOB
        w.put(code, ln)
    return int(zz[0])


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht_body(tc: int, th: int, spec: tuple[list[int], list[int]]) -> bytes:
    counts, symbols = spec
    return bytes([(tc << 4) | th]) + bytes(counts) + bytes(symbols)


def make_jpeg(img: np.ndarray, subsampling: str = "444", quality: int = 50,
              restart_interval: int = 0, grayscale: bool = False) -> bytes:
    """Independent baseline JPEG encoder written from T.81."""
    h, w = img.shape[:2]
    qy = _scale_qt(QT_LUM, quality)
    qc = _scale_qt(QT_CHROM, quality)
    qy_zz, qc_zz = qy[ZIGZAG], qc[ZIGZAG]

    rgb = img.astype(np.float64)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2] + 128
    cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2] + 128

    if grayscale:
        hy = vy = 1
        comps = [(1, 0x11, 0)]
    elif subsampling == "420":
        hy = vy = 2
        comps = [(1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1)]
    else:
        hy = vy = 1
        comps = [(1, 0x11, 0), (2, 0x11, 1), (3, 0x11, 1)]

    mcu_w, mcu_h = 8 * hy, 8 * vy
    pw, ph = -(-w // mcu_w) * mcu_w, -(-h // mcu_h) * mcu_h

    def pad(p: np.ndarray) -> np.ndarray:
        return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")

    yp = pad(y)
    if not grayscale:
        if subsampling == "420":  # chroma = 2x2 mean then pad to 8-multiples
            cbs = pad(cb).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            crs = pad(cr).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        else:
            cbs, crs = pad(cb), pad(cr)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, bytes([0x00]) + bytes(qy_zz.astype(np.uint8)))
    if not grayscale:
        out += _seg(0xDB, bytes([0x01]) + bytes(qc_zz.astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hv, tq in comps:
        sof += bytes([cid, hv, tq])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_body(0, 0, DC_LUM)) + _seg(0xC4, _dht_body(1, 0, AC_LUM))
    if not grayscale:
        out += _seg(0xC4, _dht_body(0, 1, DC_CHROM))
        out += _seg(0xC4, _dht_body(1, 1, AC_CHROM))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for cid, _, tq in comps:
        sos += bytes([cid, 0x00 if tq == 0 else 0x11])
    out += _seg(0xDA, sos + bytes([0, 63, 0]))

    dc_y, ac_y = _enc_table(*DC_LUM), _enc_table(*AC_LUM)
    dc_c, ac_c = _enc_table(*DC_CHROM), _enc_table(*AC_CHROM)
    wtr = _Writer()
    preds = [0, 0, 0]
    n_rst = 0
    mcus = [(my, mx) for my in range(ph // mcu_h) for mx in range(pw // mcu_w)]
    for i, (my, mx) in enumerate(mcus):
        if restart_interval and i and i % restart_interval == 0:
            wtr.flush()
            wtr.buf += bytes([0xFF, 0xD0 + (n_rst % 8)])
            n_rst += 1
            preds = [0, 0, 0]
        for by in range(vy):
            for bx in range(hy):
                r, c = my * mcu_h + by * 8, mx * mcu_w + bx * 8
                zz = _fdct_quant(yp[r:r + 8, c:c + 8], qy_zz)
                preds[0] = _encode_block(wtr, zz, preds[0], dc_y, ac_y)
        if not grayscale:
            for ci, plane in ((1, cbs), (2, crs)):
                r, c = my * 8, mx * 8
                zz = _fdct_quant(plane[r:r + 8, c:c + 8], qc_zz)
                preds[ci] = _encode_block(wtr, zz, preds[ci], dc_c, ac_c)
    wtr.flush()
    out += wtr.buf + b"\xff\xd9"  # EOI
    return bytes(out)


def _rgb(w: int, h: int) -> np.ndarray:
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    return np.concatenate(
        [np.broadcast_to(x % 256, (h, w, 1)),
         np.broadcast_to(y % 256, (h, w, 1)),
         np.broadcast_to((x + y) % 251, (h, w, 1))],
        axis=2).astype(np.uint8)


def _smooth(w: int, h: int) -> np.ndarray:
    """Low-frequency image: JPEG-friendly, tight reconstruction bounds."""
    x = np.linspace(0, np.pi, w)[None, :]
    y = np.linspace(0, np.pi, h)[:, None]
    r = (127 + 100 * np.sin(x) * np.cos(y)).astype(np.uint8)
    g = np.broadcast_to((127 + 80 * np.cos(x)).astype(np.uint8), (h, w))
    b = np.broadcast_to((127 + 60 * np.sin(y)).astype(np.uint8), (h, w))
    return np.stack([r, g, b], axis=2)


# ----------------------------------------------------------------- tests
def test_flat_color_near_exact():
    img = np.full((16, 24, 3), [90, 160, 40], dtype=np.uint8)
    got = decode_jpeg(make_jpeg(img, quality=90))
    assert got.shape == (16, 24, 3)
    assert np.max(np.abs(got.astype(int) - img.astype(int))) <= 2


@pytest.mark.parametrize("w,h", [(8, 8), (24, 16), (17, 11), (64, 48)])
def test_smooth_roundtrip_444(w, h):
    img = _smooth(w, h)
    got = decode_jpeg(make_jpeg(img, "444", quality=90))
    assert got.shape == (h, w, 3)
    err = np.abs(got.astype(int) - img.astype(int))
    assert err.mean() < 3.0 and err.max() < 32


@pytest.mark.parametrize("w,h", [(32, 32), (21, 13), (40, 24)])
def test_smooth_roundtrip_420(w, h):
    img = _smooth(w, h)
    got = decode_jpeg(make_jpeg(img, "420", quality=90))
    assert got.shape == (h, w, 3)
    err = np.abs(got.astype(int) - img.astype(int))
    assert err.mean() < 6.0  # chroma 2x2 averaging adds loss vs 4:4:4


def test_gradient_roundtrip_standard_tables():
    img = _rgb(48, 32)
    got = decode_jpeg(make_jpeg(img, "444", quality=50))
    err = np.abs(got.astype(int) - img.astype(int))
    assert err.mean() < 6.0  # Annex-K q50 tables: visibly lossy, not broken


def test_grayscale_single_component():
    img = np.repeat(np.linspace(0, 255, 24).astype(np.uint8)[None, :, None], 16, 0)
    img3 = np.repeat(img, 3, axis=2)
    got = decode_jpeg(make_jpeg(img3, quality=90, grayscale=True))
    assert got.shape == (16, 24, 3)
    # grayscale expands to identical RGB channels
    assert np.array_equal(got[:, :, 0], got[:, :, 1])
    assert np.abs(got[:, :, 0].astype(int) - img[:, :, 0].astype(int)).mean() < 3.0


def test_restart_markers():
    img = _smooth(64, 32)
    plain = decode_jpeg(make_jpeg(img, "444", quality=90))
    with_rst = decode_jpeg(make_jpeg(img, "444", quality=90, restart_interval=3))
    # restart markers change framing only, not reconstruction
    assert np.array_equal(plain, with_rst)


def test_byte_stuffing_exercised():
    # high-entropy images produce 0xFF bytes in the bitstream, which the
    # encoder must stuff (FF 00) and the decoder must unstuff; assert the
    # path is actually hit across a deterministic batch, and decode holds
    rng = np.random.RandomState(7)
    stuffed_seen = False
    for _ in range(6):
        img = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
        data = make_jpeg(img, quality=95)
        if b"\xff\x00" in data.split(b"\xff\xda")[1]:
            stuffed_seen = True
        got = decode_jpeg(data)
        assert got.shape == (24, 24, 3)
        assert np.abs(got.astype(int) - img.astype(int)).mean() < 12
    assert stuffed_seen


def test_progressive_raises():
    img = _smooth(16, 16)
    data = bytearray(make_jpeg(img))
    i = data.index(b"\xff\xc0")
    data[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(bytes(data))


def test_12bit_raises():
    img = _smooth(16, 16)
    data = bytearray(make_jpeg(img))
    i = data.index(b"\xff\xc0")
    data[i + 4] = 12  # precision byte inside SOF0
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_jpeg(bytes(data))


def test_dispatch_through_decode_image():
    img = _smooth(20, 12)
    got = decode_image(make_jpeg(img, quality=90))
    assert got.shape == (12, 20, 3)


def test_jpeg_through_spark(spark):
    """JPEG bytes in a binary column through the mapInPandas decode path:
    dims extracted from real entropy-decoded pixels."""
    blobs = [
        (1, make_jpeg(_smooth(100, 40), "444", quality=90)),
        (2, make_jpeg(_smooth(30, 80), "420", quality=75)),
    ]
    df = spark.createDataFrame(blobs, "media_id long, content binary")
    feats = {r["media_id"]: r for r in extract_media_features(df).collect()}
    assert (feats[1]["width"], feats[1]["height"]) == (100, 40)
    assert (feats[2]["width"], feats[2]["height"]) == (30, 80)
    assert (feats[1]["out_width"], feats[1]["out_height"]) == (64, 25)
