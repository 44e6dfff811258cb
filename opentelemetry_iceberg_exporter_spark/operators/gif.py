"""Native GIF decoder (GIF87a/GIF89a), written from the public GIF
specification — no codec libraries.

Supported: global + local color tables, variable-width LZW image data
(clear/end codes, dictionary growth to the 4096-entry cap, 12-bit max
code width, LSB-first bit packing), interlaced images (the spec's
four-pass row schedule), and multi-image streams (the FIRST image is
decoded — animation frame selection is m02's job, not the codec's).
Transparency (GIF89a graphic-control extension) is ignored: output is
the raw palette mapping as (H, W, 3) uint8 RGB, which is what feature
extraction wants.

Reference counterpart: none (the reference has no media path); this
extends the multimodal decode family (PPM/BMP/PNG/JPEG) with the last
palette-era mainstream format.
"""

from __future__ import annotations

import struct

MAX_TABLE = 4096  # spec: code values never exceed 12 bits


def _lzw_decode(data: bytes, min_code_size: int, npix: int) -> bytearray:
    """GIF-variant LZW: variable code width starting at min_code_size+1,
    LSB-first packing, clear resets the table, width grows when the
    table fills the current code space (capped at 12 bits)."""
    clear = 1 << min_code_size
    end = clear + 1
    init = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(init)
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + width <= total_bits and len(out) < npix:
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = list(init)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt GIF: first code not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < MAX_TABLE:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < MAX_TABLE:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF: LZW code beyond table")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return out


def _deinterlace(idx, height: int):
    """The spec's four-pass interlace schedule: rows 0,8,16.. then
    4,12.. then 2,6.. then 1,3,.."""
    import numpy as np

    order = (
        list(range(0, height, 8))
        + list(range(4, height, 8))
        + list(range(2, height, 4))
        + list(range(1, height, 2))
    )
    out = np.empty_like(idx)
    out[np.asarray(order)] = idx
    return out


def decode_gif(content: bytes):
    """(H, W, 3) uint8 RGB of the first image in the stream."""
    if content[:4] != b"GIF8" or content[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF payload")
    try:
        return _decode_gif_body(content)
    except (IndexError, struct.error) as exc:
        raise ValueError("corrupt GIF: truncated stream") from exc


def _decode_gif_body(content: bytes):
    import numpy as np

    _, _, packed, _, _ = struct.unpack("<HHBBB", content[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(content[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(content):
        block = content[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + length-prefixed sub-blocks
            pos += 1
            while content[pos]:
                pos += 1 + content[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"corrupt GIF: unexpected block 0x{block:02x}")
        _, _, w, h, ipacked = struct.unpack("<HHHHB", content[pos : pos + 9])
        pos += 9
        palette = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            palette = np.frombuffer(
                content[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if palette is None:
            raise ValueError("corrupt GIF: image without any color table")
        min_code_size = content[pos]
        pos += 1
        lzw = bytearray()
        while content[pos]:
            ln = content[pos]
            lzw += content[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        pixels = _lzw_decode(bytes(lzw), min_code_size, w * h)
        if len(pixels) < w * h:
            raise ValueError(
                f"corrupt GIF: {len(pixels)} of {w * h} pixels decoded"
            )
        idx = np.frombuffer(bytes(pixels[: w * h]), dtype=np.uint8).reshape(h, w)
        if idx.max(initial=0) >= len(palette):
            raise ValueError("corrupt GIF: pixel index beyond color table")
        if ipacked & 0x40:
            idx = _deinterlace(idx, h)
        return palette[idx]
    raise ValueError("corrupt GIF: no image descriptor")
