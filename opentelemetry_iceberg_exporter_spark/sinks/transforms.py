"""Iceberg partition transforms beyond the exporter's hidden time
partitioning: ``bucket[N]`` and ``truncate[W]`` (Iceberg table spec,
"Partition Transforms" + Appendix B "32-bit Hash Requirements").

The reference exporter only ever partitions by hours/days/months of the
record timestamp (catalog_rest.go:494-542); bucket/truncate are the two
remaining spec transforms a table created by ANY Iceberg writer may
carry, and the ones that matter for the 100 TB query path:

* ``bucket[N]`` over a high-cardinality key gives bounded write fan-out
  and equality-predicate file pruning (a point lookup opens 1/N of the
  files) — and two tables bucketed the same way can be joined
  partition-wise without a shuffle (storage-partitioned join).
* ``truncate[W]`` clusters lexicographic prefixes (ids, URLs) so range
  and prefix predicates prune at the manifest level.

Hashing is the spec's Murmur3 x86 32-bit with seed 0 over the spec's
single-value binary representations; `tests/test_transforms.py` pins the
published Appendix-B conformance vectors (e.g. ``bucket hash(34) ==
2017239379``, ``hash("iceberg") == 1210000089``) so compatibility is
checked against the SPEC, not against this module itself.

Executor-side evaluation is an Arrow-batched pandas UDF whose kernel is
vectorized numpy: fixed-width sources hash as one (n_rows, 2)-block
sweep; variable-length strings are grouped by byte length and each
length class is hashed as a single (n_rows, n_blocks) sweep — no
per-row Python in either path. Truncate needs no Python at all
(substring / floor-mod are Catalyst expressions).
"""

from __future__ import annotations

import re
from decimal import Decimal
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """Murmur3 x86 32-bit (public domain algorithm, Austin Appleby),
    the hash the Iceberg spec mandates for bucket transforms. Returns
    the SIGNED int32 the spec's conformance vectors quote."""
    h = seed & _M32
    nblocks = len(data) // 4
    for i in range(nblocks):
        k = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        k = (k * _C1) & _M32
        k = _rotl32(k, 15)
        k = (k * _C2) & _M32
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[nblocks * 4 :]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * _C1) & _M32
        k = _rotl32(k, 15)
        k = (k * _C2) & _M32
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


_EPOCH_DAY = np.datetime64("1970-01-01", "D")

# Iceberg types whose spec hash representation is the 8-byte
# little-endian long (ints are widened before hashing so bucket specs
# survive int->long type promotion)
_LONG_HASHED = {
    "int", "long", "date", "time", "timestamp", "timestamptz",
    # v3 ns timestamps hash their epoch-nanos long (spec Appendix B)
    "timestamp_ns", "timestamptz_ns",
}


def _to_long(value: Any, source_type: str) -> int:
    """The spec's long view of a value: days for dates, micros for
    time/timestamps, the value itself for ints."""
    import datetime as _dt

    if source_type == "date" and isinstance(value, _dt.date):
        return (value - _dt.date(1970, 1, 1)).days
    if source_type in ("timestamp", "timestamptz") and isinstance(value, _dt.datetime):
        if value.tzinfo is not None:
            value = value.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        td = value - _dt.datetime(1970, 1, 1)
        # integer arithmetic, not total_seconds() — float micros drift
        return (td.days * 86400 + td.seconds) * 1_000_000 + td.microseconds
    if source_type in ("timestamp_ns", "timestamptz_ns") and isinstance(
        value, _dt.datetime
    ):
        if value.tzinfo is not None:
            value = value.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        td = value - _dt.datetime(1970, 1, 1)
        return ((td.days * 86400 + td.seconds) * 1_000_000 + td.microseconds) * 1000
    if source_type == "time" and isinstance(value, _dt.time):
        return ((value.hour * 60 + value.minute) * 60 + value.second) * 1_000_000 + value.microsecond
    return int(value)


def _decimal_bytes(unscaled: int) -> bytes:
    """Minimal-length big-endian two's-complement (spec: decimal hash
    input)."""
    length = max(1, (unscaled.bit_length() + 8) // 8)
    return unscaled.to_bytes(length, "big", signed=True)


def hash_value(value: Any, source_type: str) -> int:
    """Spec 32-bit hash of a single value (Appendix B table)."""
    if source_type in _LONG_HASHED:
        v = _to_long(value, source_type)
        return murmur3_x86_32(v.to_bytes(8, "little", signed=True))
    if source_type == "string":
        return murmur3_x86_32(str(value).encode("utf-8"))
    if source_type == "uuid":
        import uuid as _uuid

        u = value if isinstance(value, _uuid.UUID) else _uuid.UUID(str(value))
        return murmur3_x86_32(u.bytes)
    if source_type in ("binary",) or source_type.startswith("fixed"):
        return murmur3_x86_32(bytes(value))
    if source_type.startswith("decimal"):
        unscaled = value
        if isinstance(value, Decimal):
            unscaled = int(value.scaleb(-value.as_tuple().exponent))
        return murmur3_x86_32(_decimal_bytes(int(unscaled)))
    raise ValueError(f"bucket transform undefined for Iceberg type {source_type!r}")


def bucket_value(value: Any, n: int, source_type: str) -> int | None:
    """``(hash(v) & Integer.MAX_VALUE) % N`` — None partitions as null."""
    if value is None:
        return None
    return (hash_value(value, source_type) & 0x7FFFFFFF) % n


def truncate_value(value: Any, width: int, source_type: str) -> Any:
    """Spec truncate: floor-mod for integers (so ``-1`` truncates to
    ``-W``, not 0), leading code points for strings, leading bytes for
    binary, unscaled floor-mod for decimals."""
    if value is None:
        return None
    if source_type in ("int", "long"):
        v = int(value)
        return v - (v % width)  # Python % is already floor-mod
    if source_type == "string":
        return str(value)[:width]
    if source_type == "binary" or source_type.startswith("fixed"):
        return bytes(value)[:width]
    if source_type.startswith("decimal"):
        if isinstance(value, Decimal):
            exp = value.as_tuple().exponent
            unscaled = int(value.scaleb(-exp))
            return Decimal(unscaled - (unscaled % width)).scaleb(exp)
        v = int(value)
        return v - (v % width)
    raise ValueError(f"truncate transform undefined for Iceberg type {source_type!r}")


_TRANSFORM_RE = re.compile(r"^(bucket|truncate)\[(\d+)\]$")


def parse_transform(transform: str) -> tuple[str, int | None]:
    """``"bucket[16]" -> ("bucket", 16)``; plain names pass through."""
    m = _TRANSFORM_RE.match(transform)
    if m:
        return m.group(1), int(m.group(2))
    return transform, None


def transform_result_type(transform: str, source_type: str) -> str:
    """Iceberg result type of a partition transform (drives the Avro
    type of the manifest's partition field)."""
    base, _ = parse_transform(transform)
    if base == "truncate":
        return source_type
    # bucket and the time transforms all produce int
    return "int"


# --------------------------------------------------------------------------
# vectorized executor-side kernels
# --------------------------------------------------------------------------


def _finalize(h: np.ndarray, total_len: int) -> np.ndarray:
    """Vectorized murmur3 finalizer over a uint32 row vector."""
    h = h ^ np.uint32(total_len)
    h = h ^ (h >> np.uint32(16))
    h = ((h.astype(np.uint64) * 0x85EBCA6B) & _M32).astype(np.uint32)
    h = h ^ (h >> np.uint32(13))
    h = ((h.astype(np.uint64) * 0xC2B2AE35) & _M32).astype(np.uint32)
    return h ^ (h >> np.uint32(16))


def _mix_block(h: np.ndarray, k: np.ndarray) -> np.ndarray:
    """One full murmur3 block round, vectorized over rows."""
    k = ((k.astype(np.uint64) * _C1) & _M32).astype(np.uint32)
    k = (k << np.uint32(15)) | (k >> np.uint32(17))
    k = ((k.astype(np.uint64) * _C2) & _M32).astype(np.uint32)
    h = h ^ k
    h = (h << np.uint32(13)) | (h >> np.uint32(19))
    return ((h.astype(np.uint64) * 5 + 0xE6546B64) & _M32).astype(np.uint32)


def _tail_mix(h: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Tail round (no h-rotation), vectorized over rows."""
    k = ((k.astype(np.uint64) * _C1) & _M32).astype(np.uint32)
    k = (k << np.uint32(15)) | (k >> np.uint32(17))
    k = ((k.astype(np.uint64) * _C2) & _M32).astype(np.uint32)
    return h ^ k


def murmur3_longs(values: np.ndarray) -> np.ndarray:
    """Spec hash of an int64 vector (8-byte little-endian blocks) as
    ONE two-block vectorized sweep; returns int32."""
    u = values.astype(np.int64).view(np.uint64)
    h = np.zeros(len(u), dtype=np.uint32)
    h = _mix_block(h, (u & _M32).astype(np.uint32))
    h = _mix_block(h, (u >> np.uint64(32)).astype(np.uint32))
    return _finalize(h, 8).view(np.int32)


def murmur3_bytes_batch(encoded: "pd.Series") -> np.ndarray:
    """Spec hash of a Series of ``bytes`` (None allowed) — rows are
    grouped by byte length and each length class is hashed as one
    vectorized multi-block sweep, so the Python-level loop is over
    DISTINCT LENGTHS, not rows."""
    out = np.zeros(len(encoded), dtype=np.int32)
    lengths = encoded.map(lambda b: -1 if b is None else len(b)).to_numpy()
    for length in np.unique(lengths):
        if length < 0:
            continue
        idx = np.nonzero(lengths == length)[0]
        if length == 0:
            out[idx] = _finalize(np.zeros(len(idx), dtype=np.uint32), 0).view(np.int32)
            continue
        flat = np.frombuffer(
            b"".join(encoded.iloc[i] for i in idx), dtype=np.uint8
        ).reshape(len(idx), length)
        h = np.zeros(len(idx), dtype=np.uint32)
        nblocks = length // 4
        if nblocks:
            blocks = np.ascontiguousarray(flat[:, : nblocks * 4]).view("<u4")
            for b in range(nblocks):
                h = _mix_block(h, blocks[:, b])
        tail_len = length % 4
        if tail_len:
            tail = flat[:, nblocks * 4 :].astype(np.uint32)
            k = np.zeros(len(idx), dtype=np.uint32)
            for j in range(tail_len):
                k |= tail[:, j] << np.uint32(8 * j)
            h = _tail_mix(h, k)
        out[idx] = _finalize(h, length).view(np.int32)
    return out


def _bucket_udf_long(n: int):
    """Takes the long PRE-SPLIT into (high 32 bits as int, low 32 bits
    as long): a nullable int64 crosses Arrow as float64, which is exact
    only below 2**53 — each half is < 2**32, so the full 64-bit value
    survives any null-driven float conversion bit-for-bit."""

    @pandas_udf("int")
    def _bucket(hi: pd.Series, lo: pd.Series) -> pd.Series:
        mask = hi.notna()
        h = hi[mask].to_numpy(dtype=np.int64)
        l_ = lo[mask].to_numpy(dtype=np.int64)
        vals = ((h.view(np.uint64) << np.uint64(32)) | l_.view(np.uint64)).view(np.int64)
        hashed = murmur3_longs(vals).astype(np.int64)
        buckets = (hashed & 0x7FFFFFFF) % n
        out = pd.Series(np.full(len(hi), np.nan), index=hi.index, dtype="object")
        out[mask] = buckets
        return out.astype("Int32")

    return _bucket


def _bucket_long_col(n: int, col: Column) -> Column:
    hi = F.shiftright(col, 32).cast("int")
    lo = col.bitwiseAND(F.lit(0xFFFFFFFF))  # long in [0, 2^32)
    return _bucket_udf_long(n)(hi, lo)


def _bucket_udf_string(n: int):
    @pandas_udf("int")
    def _bucket(s: pd.Series) -> pd.Series:
        encoded = s.map(lambda v: None if v is None else str(v).encode("utf-8"))
        hashed = murmur3_bytes_batch(encoded).astype(np.int64)
        buckets = (hashed & 0x7FFFFFFF) % n
        out = pd.Series(buckets, index=s.index, dtype="object")
        out[s.isna()] = None
        return out.astype("Int32")

    return _bucket


def _bucket_udf_binary(n: int):
    @pandas_udf("int")
    def _bucket(s: pd.Series) -> pd.Series:
        encoded = s.map(lambda v: None if v is None else bytes(v))
        hashed = murmur3_bytes_batch(encoded).astype(np.int64)
        buckets = (hashed & 0x7FFFFFFF) % n
        out = pd.Series(buckets, index=s.index, dtype="object")
        out[s.isna()] = None
        return out.astype("Int32")

    return _bucket


def bucket_column(source: str, n: int, source_type: str) -> Column:
    """``bucket[n]`` as a Spark Column: the long view of the source is
    built with Catalyst expressions (unix_micros / datediff / cast),
    split into 32-bit halves so Arrow's float64 null representation
    cannot lose bits, and only the murmur3 itself runs in the
    Arrow-batched numpy kernel."""
    if source_type in ("int", "long", "timestamp_ns", "timestamptz_ns"):
        # ns timestamps ride as epoch-nanos longs already
        return _bucket_long_col(n, F.col(source).cast("long"))
    if source_type in ("timestamp", "timestamptz"):
        return _bucket_long_col(n, F.unix_micros(F.col(source)))
    if source_type == "date":
        return _bucket_long_col(n, F.datediff(F.col(source), F.lit("1970-01-01")).cast("long"))
    if source_type == "string":
        return _bucket_udf_string(n)(F.col(source))
    if source_type == "binary" or source_type.startswith("fixed"):
        return _bucket_udf_binary(n)(F.col(source))
    raise ValueError(f"bucket column undefined for Iceberg type {source_type!r}")


def truncate_column(source: str, width: int, source_type: str) -> Column:
    """``truncate[w]`` needs no Python at all: floor-mod / substring are
    Catalyst expressions inside whole-stage codegen."""
    if source_type in ("int", "long"):
        col = F.col(source).cast("long")
        return (col - F.pmod(col, F.lit(width))).cast("long")
    if source_type == "string":
        return F.substring(F.col(source), 1, width)
    raise ValueError(f"truncate column undefined for Iceberg type {source_type!r}")
