"""Minimal Parquet footer reader: row count via a Thrift compact-protocol
walk (format spec: parquet-format/FileMetaData + thrift compact encoding).

Why this exists: pyarrow refuses to PARSE a footer whose schema carries a
LogicalType it does not know ("Metadata contains Thrift LogicalType that
is not recognized") — e.g. the VARIANT logical type Spark 4 writes for
VariantType columns. The engine only needs `num_rows` from the footer at
write time (manifest record counts), and Thrift compact is explicitly
skippable WITHOUT interpreting any value: every field is length-prefixed
or varint-delimited, so an unknown enum inside the schema list is just
bytes to step over. FileMetaData is:

    1: i32                 version
    2: list<SchemaElement> schema        (where the unknown type lives)
    3: i64                 num_rows      <- what we want
    4: list<RowGroup>      row_groups
    ...

This walker skips every field generically and decodes only field 3.
Like the repo's other spec-level codecs (Avro OCF, Puffin, roaring), it
is written from the PUBLIC format documentation and cross-checked in
tests against pyarrow on footers pyarrow can read.
"""

from __future__ import annotations

import io
import struct

# thrift compact type ids (thrift docs: "Compact Protocol encoding")
_CT_STOP = 0
_CT_TRUE = 1
_CT_FALSE = 2
_CT_BYTE = 3
_CT_I16 = 4
_CT_I32 = 5
_CT_I64 = 6
_CT_DOUBLE = 7
_CT_BINARY = 8
_CT_LIST = 9
_CT_SET = 10
_CT_MAP = 11
_CT_STRUCT = 12


def _varint(buf: io.BytesIO) -> int:
    out = shift = 0
    while True:
        b = buf.read(1)
        if not b:
            raise ValueError("truncated thrift varint")
        out |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            return out
        shift += 7
        if shift > 63:  # thrift i64 is at most 10 varint bytes
            raise ValueError("thrift varint overflows 64 bits")


def _zigzag(buf: io.BytesIO) -> int:
    v = _varint(buf)
    return (v >> 1) ^ -(v & 1)


def _skip(buf: io.BytesIO, ctype: int) -> None:
    """Step over one compact-encoded value of `ctype` without
    interpreting it — unknown enums/logical types inside are inert.

    Bool asymmetry (thrift compact spec): a bool STRUCT FIELD carries
    its value in the field-header type nibble (zero-width here — the
    struct walkers `continue` before calling _skip), but a bool
    COLLECTION ELEMENT is one byte (0x01/0x02) on the wire — list/set/
    map recursion below must consume it or the walk desyncs."""
    if ctype in (_CT_TRUE, _CT_FALSE):
        buf.read(1)  # collection-element form: one value byte
        return
    if ctype == _CT_BYTE:
        buf.read(1)
    elif ctype in (_CT_I16, _CT_I32, _CT_I64):
        _varint(buf)
    elif ctype == _CT_DOUBLE:
        buf.read(8)
    elif ctype == _CT_BINARY:
        buf.read(_varint(buf))
    elif ctype in (_CT_LIST, _CT_SET):
        head = buf.read(1)[0]
        size = head >> 4
        elem = head & 0x0F
        if size == 0x0F:
            size = _varint(buf)
        for _ in range(size):
            _skip(buf, elem)
    elif ctype == _CT_MAP:
        size = _varint(buf)
        if size:
            kv = buf.read(1)[0]
            ktype, vtype = kv >> 4, kv & 0x0F
            for _ in range(size):
                _skip(buf, ktype)
                _skip(buf, vtype)
    elif ctype == _CT_STRUCT:
        _skip_struct(buf)
    else:
        raise ValueError(f"unknown thrift compact type {ctype}")


def _skip_struct(buf: io.BytesIO) -> None:
    while True:
        head = buf.read(1)
        if not head:
            raise ValueError("truncated thrift struct")
        if head[0] == _CT_STOP:
            return
        ctype = head[0] & 0x0F
        if (head[0] >> 4) == 0:  # long-form field id
            _zigzag(buf)
        if ctype in (_CT_TRUE, _CT_FALSE):
            continue
        _skip(buf, ctype)


def _footer_buf(path: str) -> io.BytesIO:
    with open(path, "rb") as f:
        f.seek(0, 2)
        end = f.tell()
        if end < 12:
            raise ValueError(f"{path}: not a parquet file (too short)")
        f.seek(end - 8)
        tail = f.read(8)
        if tail[4:] != b"PAR1":
            raise ValueError(f"{path}: missing parquet footer magic")
        meta_len = struct.unpack("<I", tail[:4])[0]
        f.seek(end - 8 - meta_len)
        return io.BytesIO(f.read(meta_len))


def footer_num_rows(path: str) -> int:
    """FileMetaData.num_rows straight off the footer bytes — works on
    footers pyarrow rejects for unknown logical types (VARIANT et al.)."""
    buf = _footer_buf(path)
    field_id = 0
    while True:
        head = buf.read(1)
        if not head:
            break
        if head[0] == _CT_STOP:
            break
        ctype = head[0] & 0x0F
        delta = head[0] >> 4
        if delta == 0:
            field_id = _zigzag(buf)
        else:
            field_id += delta
        if field_id == 3 and ctype == _CT_I64:
            return _zigzag(buf)
        if ctype in (_CT_TRUE, _CT_FALSE):
            continue
        _skip(buf, ctype)
    raise ValueError(f"{path}: footer has no num_rows (field 3)")


def _schema_elements(buf: io.BytesIO) -> list[tuple[str, int]]:
    """Decode FileMetaData field 2 (list<SchemaElement>) into
    (name, num_children) pairs, depth-first as stored. SchemaElement:
    1: Type, 2: type_length, 3: repetition, 4: name, 5: num_children —
    everything but 4/5 is skipped generically."""
    head = buf.read(1)[0]
    size = head >> 4
    if size == 0x0F:
        size = _varint(buf)
    out: list[tuple[str, int]] = []
    for _ in range(size):
        name, n_children = "", 0
        field_id = 0
        while True:
            h = buf.read(1)[0]
            if h == _CT_STOP:
                break
            ctype = h & 0x0F
            delta = h >> 4
            if delta == 0:
                field_id = _zigzag(buf)
            else:
                field_id += delta
            if ctype in (_CT_TRUE, _CT_FALSE):
                continue
            if field_id == 4 and ctype == _CT_BINARY:
                name = buf.read(_varint(buf)).decode("utf-8")
            elif field_id == 5 and ctype == _CT_I32:
                n_children = _zigzag(buf)
            else:
                _skip(buf, ctype)
        out.append((name, n_children))
    return out


def footer_column_names(path: str) -> set[str]:
    """TOP-LEVEL column names from the footer schema — the presence
    check v3 default-value reads need, robust to logical types pyarrow
    rejects. The schema list is depth-first: the root's immediate
    children are the top-level columns; each child's own subtree is
    stepped over by child count."""
    buf = _footer_buf(path)
    field_id = 0
    elements: list[tuple[str, int]] | None = None
    while True:
        head = buf.read(1)
        if not head or head[0] == _CT_STOP:
            break
        ctype = head[0] & 0x0F
        delta = head[0] >> 4
        if delta == 0:
            field_id = _zigzag(buf)
        else:
            field_id += delta
        if field_id == 2 and ctype == _CT_LIST:
            elements = _schema_elements(buf)
            break
        if ctype in (_CT_TRUE, _CT_FALSE):
            continue
        _skip(buf, ctype)
    if not elements:
        raise ValueError(f"{path}: footer has no schema (field 2)")
    top: set[str] = set()
    i = 1  # elements[0] is the root
    for _ in range(elements[0][1]):
        if i >= len(elements):
            break
        name, n_children = elements[i]
        top.add(name)
        # step over this column's whole subtree: each consumed element
        # owes its own child count (depth-first layout)
        todo, i = n_children, i + 1
        while todo and i < len(elements):
            todo += elements[i][1] - 1
            i += 1
    return top


# ---------------------------------------------------------------------------
# Row-group column statistics (FileMetaData field 4) — the min/max/
# null-count bounds pyarrow would surface, decoded off the raw footer so
# VARIANT-bearing files (whose footers pyarrow refuses to parse) keep
# manifest bounds on their OTHER columns, and so shredded-variant
# typed_value subcolumns' stats are reachable for path pruning.
#
#   RowGroup        { 1: list<ColumnChunk> columns, ... }
#   ColumnChunk     { 3: ColumnMetaData meta_data, ... }
#   ColumnMetaData  { 1: Type (enum), 3: list<string> path_in_schema,
#                     12: Statistics, ... }
#   Statistics      { 3: i64 null_count, 5: binary max_value,
#                     6: binary min_value, ... }
#
# Only the v2 exact-ordering fields (5/6) are read; the deprecated
# min/max (1/2) have writer-dependent ordering for signed types and are
# ignored. Truncated bounds (is_{min,max}_value_exact = false) are still
# VALID bounds per the format spec (min_value <= all values <= max_value).

# parquet physical Type enum (parquet-format Types.thrift)
PHYS_BOOLEAN = 0
PHYS_INT32 = 1
PHYS_INT64 = 2
PHYS_INT96 = 3
PHYS_FLOAT = 4
PHYS_DOUBLE = 5
PHYS_BYTE_ARRAY = 6
PHYS_FIXED = 7

_PLAIN_DECODERS = {
    PHYS_BOOLEAN: lambda b: b[0] != 0,
    PHYS_INT32: lambda b: struct.unpack("<i", b)[0],
    PHYS_INT64: lambda b: struct.unpack("<q", b)[0],
    PHYS_FLOAT: lambda b: struct.unpack("<f", b)[0],
    PHYS_DOUBLE: lambda b: struct.unpack("<d", b)[0],
    PHYS_BYTE_ARRAY: lambda b: bytes(b),
    PHYS_FIXED: lambda b: bytes(b),
}


def _struct_fields(buf: io.BytesIO):
    """Yield (field_id, ctype) for one struct; the caller MUST consume
    each non-bool value (decode or _skip) before the next iteration —
    bool fields are zero-width (value in the header nibble)."""
    field_id = 0
    while True:
        h = buf.read(1)
        if not h:
            raise ValueError("truncated thrift struct")
        if h[0] == _CT_STOP:
            return
        ctype = h[0] & 0x0F
        delta = h[0] >> 4
        if delta == 0:
            field_id = _zigzag(buf)
        else:
            field_id += delta
        yield field_id, ctype


def _list_head(buf: io.BytesIO) -> tuple[int, int]:
    head = buf.read(1)[0]
    size = head >> 4
    if size == 0x0F:
        size = _varint(buf)
    return size, head & 0x0F


def _parse_statistics(buf: io.BytesIO) -> dict:
    out: dict = {"min": None, "max": None, "null_count": None}
    for fid, ct in _struct_fields(buf):
        if ct in (_CT_TRUE, _CT_FALSE):
            continue
        if fid == 5 and ct == _CT_BINARY:
            out["max"] = buf.read(_varint(buf))
        elif fid == 6 and ct == _CT_BINARY:
            out["min"] = buf.read(_varint(buf))
        elif fid == 3 and ct == _CT_I64:
            out["null_count"] = _zigzag(buf)
        else:
            _skip(buf, ct)
    return out


def _parse_column_meta(buf: io.BytesIO) -> dict:
    meta: dict = {
        "type": None,
        "path": None,
        "stats": None,
        "bloom_offset": None,
        "bloom_length": None,
    }
    for fid, ct in _struct_fields(buf):
        if ct in (_CT_TRUE, _CT_FALSE):
            continue
        if fid == 1 and ct == _CT_I32:
            meta["type"] = _zigzag(buf)
        elif fid == 3 and ct == _CT_LIST:
            size, _elem = _list_head(buf)
            meta["path"] = ".".join(
                buf.read(_varint(buf)).decode("utf-8") for _ in range(size)
            )
        elif fid == 12 and ct == _CT_STRUCT:
            meta["stats"] = _parse_statistics(buf)
        elif fid == 14 and ct == _CT_I64:
            # bloom_filter_offset: file position of the chunk's
            # BloomFilterHeader (parquet-format ColumnMetaData fid 14)
            meta["bloom_offset"] = _zigzag(buf)
        elif fid == 15 and ct == _CT_I32:
            # bloom_filter_length: header + bitset size (fid 15,
            # optional — parquet-mr >= 1.12 writes it)
            meta["bloom_length"] = _zigzag(buf)
        else:
            _skip(buf, ct)
    return meta


def _parse_column_chunk(buf: io.BytesIO) -> dict | None:
    meta = None
    for fid, ct in _struct_fields(buf):
        if ct in (_CT_TRUE, _CT_FALSE):
            continue
        if fid == 3 and ct == _CT_STRUCT:
            meta = _parse_column_meta(buf)
        else:
            _skip(buf, ct)
    return meta


def footer_row_group_stats(path: str) -> list[dict]:
    """Per row group: {'num_rows': int|None, 'columns': {dotted leaf
    path -> {'type': physical Type enum, 'min': bytes|None, 'max':
    bytes|None, 'null_count': int|None}}} — min/max still plain-encoded
    physical bytes (decode with _PLAIN_DECODERS[type])."""
    buf = _footer_buf(path)
    groups: list[dict] = []
    for fid, ct in _struct_fields(buf):
        if ct in (_CT_TRUE, _CT_FALSE):
            continue
        if fid == 4 and ct == _CT_LIST:
            n_groups, _elem = _list_head(buf)
            for _ in range(n_groups):
                cols: dict[str, dict] = {}
                num_rows: int | None = None
                for rg_fid, rg_ct in _struct_fields(buf):
                    if rg_ct in (_CT_TRUE, _CT_FALSE):
                        continue
                    if rg_fid == 1 and rg_ct == _CT_LIST:
                        n_cols, _e = _list_head(buf)
                        for _ in range(n_cols):
                            m = _parse_column_chunk(buf)
                            if m and m["path"]:
                                cols[m["path"]] = {
                                    "type": m["type"],
                                    "min": (m["stats"] or {}).get("min"),
                                    "max": (m["stats"] or {}).get("max"),
                                    "null_count": (m["stats"] or {}).get(
                                        "null_count"
                                    ),
                                    "bloom_offset": m["bloom_offset"],
                                    "bloom_length": m["bloom_length"],
                                }
                    elif rg_fid == 3 and rg_ct == _CT_I64:
                        num_rows = _zigzag(buf)
                    else:
                        _skip(buf, rg_ct)
                groups.append({"num_rows": num_rows, "columns": cols})
            return groups
        _skip(buf, ct)
    return groups  # no row groups (empty file): nothing to report


def footer_column_minmax(path: str) -> dict[str, tuple[int, object, object]]:
    """{dotted leaf path: (physical type, min, max)} aggregated across
    ALL row groups, decoded to Python values. A column missing exact
    stats in ANY row group is OMITTED — a partial aggregate is not a
    valid file bound."""
    groups = footer_row_group_stats(path)
    if not groups:
        return {}
    agg: dict[str, tuple[int, object, object]] = {}
    dead: set[str] = set()
    for gi, group in enumerate(groups):
        cols = group["columns"]
        for name in agg:
            if name not in cols:
                dead.add(name)
        for name, st in cols.items():
            if name in dead:
                continue
            dec = _PLAIN_DECODERS.get(st["type"])
            if (
                dec is None
                or st["min"] is None
                or st["max"] is None
                or (gi > 0 and name not in agg)
            ):
                dead.add(name)
                continue
            try:
                lo, hi = dec(st["min"]), dec(st["max"])
            except (struct.error, IndexError):
                dead.add(name)
                continue
            if name in agg:
                _, plo, phi = agg[name]
                lo, hi = min(plo, lo), max(phi, hi)
            agg[name] = (st["type"], lo, hi)
    return {k: v for k, v in agg.items() if k not in dead}
