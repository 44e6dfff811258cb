"""Minimal Avro Object Container File codec (write + read, null codec).

Iceberg manifests and manifest lists are REQUIRED by the spec to be Avro
files; this container ships no Avro Python library and no Iceberg jars,
so the filesystem-catalog commit path (sinks/iceberg_fs.py) carries its
own schema-driven binary codec, written against the Avro 1.11
specification (binary encoding + object container files):

* int/long     -- zigzag varint
* float/double -- 4/8-byte little-endian IEEE 754
* bytes/string -- varint byte-length prefix
* fixed        -- raw bytes, size from schema
* record       -- field values in declared order
* array/map    -- varint-count blocks terminated by a 0 count
* union        -- varint branch index, then the branch value
* OCF          -- magic `Obj\\x01`, file-metadata map (avro.schema,
                  avro.codec), 16-byte sync marker, then blocks of
                  (row-count, byte-size, rows..., sync)

Only what Iceberg metadata needs is implemented; schemas are plain
Python dicts in Avro JSON-schema shape. Unknown or unsupported schema
types raise instead of mis-encoding.

Reference parity: the Go reference delegates this to iceberg-go's Avro
dependency (catalog_rest.go:243-303 commits manifests it never builds by
hand); here the commit path owns the bytes.
"""

from __future__ import annotations

import io
import json
import os
import struct
from typing import Any, Iterable, Iterator

MAGIC = b"Obj\x01"
SYNC_SIZE = 16


# --------------------------------------------------------------------------
# primitive encoders
# --------------------------------------------------------------------------


def _encode_long(out: io.BytesIO, n: int) -> None:
    """Zigzag + varint (Avro int and long share this wire format)."""
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _decode_long(buf: io.BytesIO) -> int:
    shift = 0
    accum = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        accum |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (accum >> 1) ^ -(accum & 1)


def _encode_bytes(out: io.BytesIO, data: bytes) -> None:
    _encode_long(out, len(data))
    out.write(data)


def _decode_bytes(buf: io.BytesIO) -> bytes:
    n = _decode_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


# --------------------------------------------------------------------------
# schema-driven value codec
# --------------------------------------------------------------------------


def _schema_type(schema: Any) -> Any:
    """An Avro schema node is a string, a dict, or a union list."""
    if isinstance(schema, dict):
        return schema["type"]
    return schema


def encode_value(out: io.BytesIO, schema: Any, value: Any) -> None:
    if isinstance(schema, list):  # union: branch index then value
        idx = _union_branch(schema, value)
        _encode_long(out, idx)
        encode_value(out, schema[idx], value)
        return
    t = _schema_type(schema)
    if t == "null":
        if value is not None:
            raise ValueError(f"null schema got {value!r}")
    elif t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _encode_long(out, int(value))
    elif t == "float":
        out.write(struct.pack("<f", float(value)))
    elif t == "double":
        out.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        _encode_bytes(out, bytes(value))
    elif t == "string":
        _encode_bytes(out, value.encode("utf-8"))
    elif t == "fixed":
        size = schema["size"]
        if len(value) != size:
            raise ValueError(f"fixed({size}) got {len(value)} bytes")
        out.write(bytes(value))
    elif t == "record":
        for field in schema["fields"]:
            encode_value(out, field["type"], value[field["name"]])
    elif t == "array":
        items = list(value)
        if items:
            _encode_long(out, len(items))
            for item in items:
                encode_value(out, schema["items"], item)
        _encode_long(out, 0)
    elif t == "map":
        entries = dict(value)
        if entries:
            _encode_long(out, len(entries))
            for k, v in entries.items():
                _encode_bytes(out, k.encode("utf-8"))
                encode_value(out, schema["values"], v)
        _encode_long(out, 0)
    else:
        raise ValueError(f"unsupported Avro type {t!r}")


def _union_branch(union: list, value: Any) -> int:
    """Pick the union branch for a value: null -> the null branch,
    anything else -> the first non-null branch (Iceberg metadata unions
    are always [null, T] option types)."""
    for i, branch in enumerate(union):
        if _schema_type(branch) == "null" and value is None:
            return i
    for i, branch in enumerate(union):
        if _schema_type(branch) != "null":
            if value is None:
                continue
            return i
    raise ValueError(f"no union branch for {value!r} in {union!r}")


def decode_value(buf: io.BytesIO, schema: Any) -> Any:
    if isinstance(schema, list):
        idx = _decode_long(buf)
        return decode_value(buf, schema[idx])
    t = _schema_type(schema)
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _decode_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _decode_bytes(buf)
    if t == "string":
        return _decode_bytes(buf).decode("utf-8")
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "record":
        return {f["name"]: decode_value(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        items = []
        while True:
            count = _decode_long(buf)
            if count == 0:
                return items
            if count < 0:  # block with byte-size prefix (writers may emit it)
                _decode_long(buf)
                count = -count
            for _ in range(count):
                items.append(decode_value(buf, schema["items"]))
    if t == "map":
        entries: dict[str, Any] = {}
        while True:
            count = _decode_long(buf)
            if count == 0:
                return entries
            if count < 0:
                _decode_long(buf)
                count = -count
            for _ in range(count):
                key = _decode_bytes(buf).decode("utf-8")
                entries[key] = decode_value(buf, schema["values"])
    raise ValueError(f"unsupported Avro type {t!r}")


# --------------------------------------------------------------------------
# object container files
# --------------------------------------------------------------------------

_META_SCHEMA = {"type": "map", "values": "bytes"}


def write_ocf(
    path: str,
    schema: dict,
    rows: Iterable[dict],
    extra_metadata: dict[str, str] | None = None,
) -> int:
    """Write rows to an Avro OCF at `path` (single block, null codec).
    Returns the file length in bytes (manifest lists need it)."""
    sync = os.urandom(SYNC_SIZE)
    meta: dict[str, bytes] = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": b"null",
    }
    for k, v in (extra_metadata or {}).items():
        meta[k] = v.encode("utf-8")

    body = io.BytesIO()
    count = 0
    for row in rows:
        encode_value(body, schema, row)
        count += 1

    out = io.BytesIO()
    out.write(MAGIC)
    encode_value(out, _META_SCHEMA, meta)
    out.write(sync)
    if count:
        _encode_long(out, count)
        _encode_long(out, body.tell())
        out.write(body.getvalue())
        out.write(sync)

    data = out.getvalue()
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return len(data)


def read_ocf(path: str) -> tuple[dict, dict[str, str], list[dict]]:
    """Read an Avro OCF: returns (schema, file-metadata, rows).

    Codecs: `null` (what this module writes) and `deflate` — RFC 1951
    raw deflate per block, the Java Iceberg writer's DEFAULT for
    manifests — so manifests committed by jar-backed engines read back
    here (stdlib zlib; the reference inherits the same via iceberg-go)."""
    with open(path, "rb") as f:
        buf = io.BytesIO(f.read())
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    raw_meta = decode_value(buf, _META_SCHEMA)
    meta = {k: v.decode("utf-8") for k, v in raw_meta.items()}
    codec = meta.get("avro.codec", "null")
    if codec not in ("null", "deflate"):
        raise ValueError(f"{path}: unsupported codec {meta['avro.codec']!r}")
    schema = json.loads(meta["avro.schema"])
    buf.read(SYNC_SIZE)

    rows: list[dict] = []
    for count, block_len in _iter_block_headers(buf):
        if codec == "deflate":
            import zlib

            block = io.BytesIO(zlib.decompress(buf.read(block_len), -15))
        else:
            block = buf
        for _ in range(count):
            rows.append(decode_value(block, schema))
        buf.read(SYNC_SIZE)
    return schema, meta, rows


def _iter_block_headers(buf: io.BytesIO) -> Iterator[tuple[int, int]]:
    while True:
        try:
            count = _decode_long(buf)
        except EOFError:
            return
        yield count, _decode_long(buf)  # (row count, block byte size)
