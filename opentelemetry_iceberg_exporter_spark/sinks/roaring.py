"""Roaring bitmap serialization (the public RoaringFormatSpec), the
64-bit "portable" flavor Iceberg v3 deletion vectors store in Puffin
blobs (Iceberg spec "Deletion Vectors"; same layout Delta Lake DVs
use, by design).

Written from the spec, not from any roaring library:

32-bit portable format (RoaringFormatSpec):
* cookie — either SERIAL_COOKIE_NO_RUNCONTAINER (12346, u32le) followed
  by a u32le container count, or SERIAL_COOKIE (12347) with
  (container_count - 1) in the upper 16 bits, followed by a
  run-container bitset of (count + 7) // 8 bytes;
* descriptive header — per container: u16le key (value >> 16) and
  u16le (cardinality - 1);
* offset header — u32le byte offset of each container from the START of
  the serialized bitmap; present always for the no-run cookie, and for
  the run cookie only when container_count >= NO_OFFSETS_THRESHOLD (4);
* containers in key order:
  - array container  (cardinality <= 4096, not run): u16le values;
  - bitset container (cardinality >  4096): 8 KiB bitmap (1024 u64le);
  - run container: u16le run count, then (u16le start, u16le
    length - 1) pairs.

A container is written as a run container when that is its smallest
encoding (the spec's runOptimize rule: a run encoding of r runs costs
2 + 4r bytes vs 2*card for arrays / 8192 for bitsets).

64-bit portable format (RoaringFormatSpec "extension for 64-bit
implementations"): u64le count of 32-bit buckets, then per bucket in
key order a u32le high-32 key followed by the full 32-bit portable
serialization of its low-32 bitmap.

Only sorted-unique u64 position sets are handled (deletion vectors are
exactly that); numpy in/out keeps encode/decode vectorized.
"""

from __future__ import annotations

import struct

SERIAL_COOKIE_NO_RUNCONTAINER = 12346
SERIAL_COOKIE = 12347
NO_OFFSETS_THRESHOLD = 4
ARRAY_MAX = 4096


def _split_containers(values) -> list[tuple[int, "object"]]:
    """values: sorted unique uint32 numpy array -> [(key16, lo16-array)]."""
    import numpy as np

    if len(values) == 0:
        return []
    keys = (values >> 16).astype(np.uint32)
    bounds = np.flatnonzero(np.diff(keys)) + 1
    chunks = np.split(values, bounds)
    return [(int(c[0] >> 16), (c & 0xFFFF).astype(np.uint16)) for c in chunks]


def _runs_of(lo) -> list[tuple[int, int]]:
    """Maximal runs [(start, length)] of a sorted unique u16 array."""
    import numpy as np

    if len(lo) == 0:
        return []
    lo32 = lo.astype(np.int64)
    breaks = np.flatnonzero(np.diff(lo32) != 1) + 1
    starts = np.concatenate(([0], breaks))
    ends = np.concatenate((breaks, [len(lo32)]))
    return [(int(lo32[s]), int(e - s)) for s, e in zip(starts, ends)]


def serialize_32(values) -> bytes:
    """Portable 32-bit serialization of a sorted unique uint32 array."""
    containers = _split_containers(values)
    n = len(containers)

    encoded: list[tuple[int, bytes, bool]] = []  # (key, payload, is_run)
    for key, lo in containers:
        card = len(lo)
        runs = _runs_of(lo)
        run_cost = 2 + 4 * len(runs)
        plain_cost = 2 * card if card <= ARRAY_MAX else 8192
        if run_cost < plain_cost:
            body = struct.pack("<H", len(runs)) + b"".join(
                struct.pack("<HH", start, length - 1) for start, length in runs
            )
            encoded.append((key, body, True))
        elif card <= ARRAY_MAX:
            encoded.append((key, lo.tobytes(), False))
        else:
            import numpy as np

            bits = np.zeros(1024, dtype=np.uint64)
            idx = lo.astype(np.uint32)
            np.bitwise_or.at(
                bits, idx >> 6, np.uint64(1) << (idx & np.uint32(63)).astype(np.uint64)
            )
            encoded.append((key, bits.tobytes(), False))

    has_run = any(r for _, _, r in encoded)
    out = bytearray()
    if has_run:
        out += struct.pack("<I", SERIAL_COOKIE | ((n - 1) << 16))
        bitset = bytearray((n + 7) // 8)
        for i, (_, _, is_run) in enumerate(encoded):
            if is_run:
                bitset[i // 8] |= 1 << (i % 8)
        out += bytes(bitset)
    else:
        out += struct.pack("<I", SERIAL_COOKIE_NO_RUNCONTAINER)
        out += struct.pack("<I", n)
    for (key, lo), (_, body, is_run) in zip(containers, encoded):
        out += struct.pack("<HH", key, len(lo) - 1)
    write_offsets = (not has_run) or n >= NO_OFFSETS_THRESHOLD
    header_len = len(out) + (4 * n if write_offsets else 0)
    if write_offsets:
        pos = header_len
        for _, body, _ in encoded:
            out += struct.pack("<I", pos)
            pos += len(body)
    for _, body, _ in encoded:
        out += body
    return bytes(out)


def deserialize_32(data: bytes, offset: int = 0) -> tuple["object", int]:
    """Decode one portable 32-bit bitmap at `offset`; returns (sorted
    uint32 numpy array, bytes consumed)."""
    import numpy as np

    start = offset
    (cookie,) = struct.unpack_from("<I", data, offset)
    offset += 4
    if (cookie & 0xFFFF) == SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        nb = (n + 7) // 8
        run_bitset = data[offset : offset + nb]
        offset += nb
        has_offsets = n >= NO_OFFSETS_THRESHOLD
    elif cookie == SERIAL_COOKIE_NO_RUNCONTAINER:
        (n,) = struct.unpack_from("<I", data, offset)
        offset += 4
        run_bitset = b""
        has_offsets = True
    else:
        raise ValueError(f"not a portable roaring bitmap (cookie {cookie})")

    keys, cards = [], []
    for _ in range(n):
        k, c = struct.unpack_from("<HH", data, offset)
        offset += 4
        keys.append(k)
        cards.append(c + 1)
    if has_offsets:
        offset += 4 * n  # trust container order; offsets are redundant here

    parts = []
    for i in range(n):
        is_run = bool(run_bitset and (run_bitset[i // 8] >> (i % 8)) & 1)
        if is_run:
            (n_runs,) = struct.unpack_from("<H", data, offset)
            offset += 2
            lo_parts = []
            for _ in range(n_runs):
                s, lm1 = struct.unpack_from("<HH", data, offset)
                offset += 4
                lo_parts.append(np.arange(s, s + lm1 + 1, dtype=np.uint32))
            lo = (
                np.concatenate(lo_parts)
                if lo_parts
                else np.empty(0, dtype=np.uint32)
            )
        elif cards[i] <= ARRAY_MAX:
            lo = np.frombuffer(
                data, dtype="<u2", count=cards[i], offset=offset
            ).astype(np.uint32)
            offset += 2 * cards[i]
        else:
            bits = np.frombuffer(data, dtype="<u8", count=1024, offset=offset)
            offset += 8192
            lo = np.flatnonzero(
                np.unpackbits(
                    bits.view(np.uint8), bitorder="little"
                )
            ).astype(np.uint32)
        parts.append((np.uint32(keys[i]) << np.uint32(16)) | lo)
    values = (
        np.concatenate(parts) if parts else np.empty(0, dtype=np.uint32)
    )
    return values, offset - start


def serialize_64(positions) -> bytes:
    """Portable 64-bit serialization of sorted unique uint64 positions."""
    import numpy as np

    positions = np.asarray(positions, dtype=np.uint64)
    highs = (positions >> np.uint64(32)).astype(np.uint32)
    bounds = np.flatnonzero(np.diff(highs)) + 1
    chunks = np.split(positions, bounds) if len(positions) else []
    out = bytearray(struct.pack("<Q", len(chunks)))
    for chunk in chunks:
        out += struct.pack("<I", int(chunk[0] >> np.uint64(32)))
        out += serialize_32((chunk & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    return bytes(out)


def deserialize_64(data: bytes, offset: int = 0) -> "object":
    """Decode a portable 64-bit bitmap -> sorted uint64 numpy array."""
    import numpy as np

    (n_buckets,) = struct.unpack_from("<Q", data, offset)
    offset += 8
    parts = []
    for _ in range(n_buckets):
        (high,) = struct.unpack_from("<I", data, offset)
        offset += 4
        lows, used = deserialize_32(data, offset)
        offset += used
        parts.append((np.uint64(high) << np.uint64(32)) | lows.astype(np.uint64))
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.concatenate(parts)
