"""Baseline JPEG (ITU-T T.81) decoder: pure stdlib + numpy.

Implements the full baseline sequential DCT pipeline from the public
spec — marker parse (DQT/SOF0/DHT/DRI/SOS), Huffman entropy decode with
byte-stuffing and restart markers, dequantization, zigzag reorder,
8x8 inverse DCT, chroma upsampling (4:4:4 / 4:2:2 / 4:2:0), and
YCbCr→RGB conversion — with no codec library. Progressive (SOF2),
arithmetic coding, and 12-bit precision raise NotImplementedError.

The entropy decode is per-block Python (a Huffman stream is inherently
sequential), but every numeric stage — dequantize, IDCT, level shift,
upsample, color convert — is vectorized numpy over whole planes. Called
from Arrow-batched mapInPandas (operators/multimodal.py), so the Spark
side stays batch-shaped regardless.

Reference parity note: the reference repo ships no image pipeline at
all; this module exists for the LLM-training-data extensions (m01/m02),
where multimodal payload decode is a first-class requirement.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: ZIGZAG[i] = raster index of the i-th coefficient
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal DCT-II basis: A[u, x] = alpha(u) * cos((2x+1) u pi / 16)
# idct2(B) = A.T @ B @ A ; fdct2(b) = A @ b @ A.T
_A = np.zeros((8, 8))
for _u in range(8):
    _alpha = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _A[_u, _x] = _alpha * np.cos((2 * _x + 1) * _u * np.pi / 16)


def build_huffman_table(counts: list[int], symbols: list[int]) -> dict:
    """Canonical JPEG Huffman table: {(length, code): symbol}.

    `counts[i]` is the number of codes of length i+1 (16 entries);
    `symbols` lists the decoded values in code order (T.81 Annex C).
    """
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment.

    Handles byte stuffing (0xFF 0x00 → data 0xFF) and stops cleanly at
    any other marker; `restart()` realigns to a byte boundary and
    consumes the expected RSTn marker.
    """

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.at_marker = False

    def _fill(self) -> bool:
        if self.pos >= len(self.data):
            self.at_marker = True
            return False
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:  # a real marker terminates the segment
                self.at_marker = True
                return False
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            return 0  # spec: pad with zero bits past the marker
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huffman(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG: Huffman code longer than 16 bits")

    def restart(self, n: int) -> None:
        """Byte-align and consume the RSTn marker (T.81 E.2.4)."""
        self.acc = 0
        self.nbits = 0
        self.at_marker = False
        if self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF:
            marker = self.data[self.pos + 1]
            if 0xD0 <= marker <= 0xD7:
                if marker != 0xD0 + (n % 8):
                    raise ValueError(
                        f"invalid JPEG: expected RST{n % 8}, got RST{marker - 0xD0}"
                    )
                self.pos += 2
                return
        raise ValueError("invalid JPEG: missing restart marker")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map an s-bit magnitude to a signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "dc_table", "ac_table", "pred", "plane")

    def __init__(self, cid: int, h: int, v: int, tq: int):
        self.cid = cid
        self.h = h
        self.v = v
        self.tq = tq
        self.dc_table: dict = {}
        self.ac_table: dict = {}
        self.pred = 0
        self.plane: np.ndarray | None = None


def decode_jpeg(content: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes to an (H, W, 3) uint8 RGB array."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    comps: list[_Component] = []
    restart_interval = 0
    width = height = 0
    out = None

    while pos < len(content):
        if content[pos] != 0xFF:
            pos += 1  # tolerate fill bytes
            continue
        marker = content[pos + 1]
        pos += 2
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack_from(">H", content, pos)[0]
        seg_end = pos + seg_len
        body = content[pos + 2 : seg_end]

        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(body, np.uint8, 64, i).astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(body, ">u2", 64, i).astype(np.int32)
                    i += 128
                qt[tq] = tbl
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext. sequential
            precision = body[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG not supported")
            height, width = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(_Component(cid, hv >> 4, hv & 0x0F, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline/extended-sequential JPEG (SOF0/SOF1) is "
                f"supported (got SOF marker 0x{marker:02X})"
            )
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                counts = list(body[i + 1 : i + 17])
                n = sum(counts)
                symbols = list(body[i + 17 : i + 17 + n])
                huff[(tc, th)] = build_huffman_table(counts, symbols)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS — entropy-coded scan follows
            ns = body[0]
            scan: list[_Component] = []
            for c in range(ns):
                cid, tt = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(cc for cc in comps if cc.cid == cid)
                comp.dc_table = huff[(0, tt >> 4)]
                comp.ac_table = huff[(1, tt & 0x0F)]
                scan.append(comp)
            out = _decode_scan(
                content, seg_end, scan, qt, width, height, restart_interval
            )
            break
        pos = seg_end

    if out is None:
        raise ValueError("invalid JPEG: no SOS scan found")
    return out


def _decode_scan(
    data: bytes,
    pos: int,
    comps: list[_Component],
    qt: dict[int, np.ndarray],
    width: int,
    height: int,
    restart_interval: int,
) -> np.ndarray:
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))

    # per-component: raw coefficient blocks in MCU order; dequant + IDCT
    # happen vectorized over ALL blocks at once after the bit-level pass
    blocks: dict[int, np.ndarray] = {}
    for c in comps:
        c.pred = 0
        blocks[c.cid] = np.zeros((mcuy * c.v * mcux * c.h, 64), dtype=np.int32)

    reader = _BitReader(data, pos)
    zz = ZIGZAG
    n_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            mcu_index = my * mcux + mx
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                reader.restart(n_rst)
                n_rst += 1
                for c in comps:
                    c.pred = 0
            for c in comps:
                base = (my * c.v * mcux + mx) * c.h  # row of blocks per v step
                for by in range(c.v):
                    for bx in range(c.h):
                        blk = blocks[c.cid][base + by * mcux * c.h + bx]
                        # DC
                        s = reader.decode_huffman(c.dc_table)
                        c.pred += _extend(reader.receive(s), s)
                        blk[0] = c.pred
                        # AC: run-length of zeros + magnitude
                        k = 1
                        while k < 64:
                            rs = reader.decode_huffman(c.ac_table)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("invalid JPEG: AC index overflow")
                            blk[k] = _extend(reader.receive(s), s)
                            k += 1

    planes: dict[int, np.ndarray] = {}
    for c in comps:
        q = qt[c.tq]
        coeff = blocks[c.cid].astype(np.float64) * q[np.newaxis, :]
        raster = np.zeros_like(coeff)
        raster[:, zz] = coeff  # undo zigzag for every block at once
        b8 = raster.reshape(-1, 8, 8)
        pixels = np.einsum("ux,nuv,vy->nxy", _A, b8, _A) + 128.0
        pixels = np.clip(np.round(pixels), 0, 255).astype(np.uint8)
        # stitch blocks back into the component plane
        bw, bh = mcux * c.h, mcuy * c.v  # blocks across / down
        plane = (
            pixels.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        # upsample to full resolution, then crop
        ry, rx = vmax // c.v, hmax // c.h
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes[c.cid] = plane[:height, :width]

    if len(comps) == 1:
        gray = planes[comps[0].cid]
        return np.repeat(gray[:, :, None], 3, axis=2)
    y = planes[comps[0].cid].astype(np.float64)
    cb = planes[comps[1].cid].astype(np.float64) - 128.0
    cr = planes[comps[2].cid].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
