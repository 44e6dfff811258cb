"""File-level pruning for EQUALITY predicates via Parquet bloom filters
(parquet-format BloomFilter.md — split-block bloom filters, SBBF).

Min/max bounds prune range predicates but are useless for point lookups
on high-cardinality, uniformly distributed keys — exactly the OTLP
access pattern "find this trace": every file's (trace_id_min,
trace_id_max) spans nearly the whole key space, so a `trace_id = '...'`
scan touches every live file. The reference has no answer below a full
scan either (its query side delegates to the reading engine). Parquet's
answer is the per-column-chunk split-block bloom filter: ~10-20 bits
per distinct value buys a <1% false-positive membership test, so a
point lookup on a 100 TB table prunes to the handful of files that
MIGHT contain the key — O(candidate files) footer+filter reads instead
of a full data scan.

Write side: the Iceberg table property
`write.parquet.bloom-filter-enabled.column.<col>` (spec property;
`_parquet_write_options` maps it to the parquet writer's
`parquet.bloom.filter.enabled#<col>`). This module is the READ side:

* `xxh64` — XXH64 from the public spec (github.com/Cyan4973/xxHash
  doc/xxhash_spec.md); parquet hashes the PLAIN encoding of each value
  with seed 0. Cross-checked in tests against Spark's own `xxhash64`
  (seed 42) across every tail-length code path.
* `sbbf_might_contain` — the spec's block probe: block index =
  `((h >> 32) * num_blocks) >> 32`, then 8×32-bit words, one bit each
  selected by `(uint32(h) * SALT[i]) >> 27`.
* `prune_files_by_bloom` — for each candidate file: one ranged read of
  the footer-declared bloom region per (row group, probed column);
  a file is dropped only when EVERY row group carries a readable,
  spec-valid filter for the column and ALL probe values test absent.
  Anything unexpected (no filter — e.g. the chunk was fully
  dictionary-encoded and the writer skipped the bloom, an unknown
  algorithm/hash/compression variant, a physical type that does not
  match the declared column type, truncated bytes) keeps the file:
  strictly conservative, never wrong pruning.

Soundness notes:
* A bloom filter has false POSITIVES only — `False` from a probe is a
  proof of absence, so dropping the file cannot lose a match.
* `col = lit` / `col IN (...)` never match NULL rows, so null handling
  needs no special case (same rule as bounds pruning).
* Only string/int/long columns are probed. Floating-point equality is
  deliberately excluded: `0.0 = -0.0` is TRUE in SQL but the two plain
  encodings hash differently, so a bloom miss would not prove absence.

Zero bytes are read when the predicate has no equality conjunct on a
bloom-enabled column. Small candidate lists probe on driver threads;
large ones (the NORMAL bloom case — candidates ≈ the whole live file
set) ship through one executor-side job with only booleans returning
(sinks/footer_probe.py).
"""

from __future__ import annotations

import io
import re
import struct
from functools import partial
from typing import Any

from .parquet_footer import (
    PHYS_BYTE_ARRAY,
    PHYS_INT32,
    PHYS_INT64,
    _CT_FALSE,
    _CT_I32,
    _CT_STRUCT,
    _CT_TRUE,
    _struct_fields,
    _skip,
    _zigzag,
    footer_row_group_stats,
)

# ---------------------------------------------------------------------------
# XXH64 (xxhash_spec.md). Parquet bloom filters hash plain-encoded
# values with seed 0; Spark SQL's xxhash64 uses the same algorithm with
# seed 42 — the tests exploit that as an independent oracle.

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M64
    return (_rotl64(acc, 31) * _P1) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h ^= _round(0, v)
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl64(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = (_rotl64(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl64(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64_batch(rows, seed: int = 0):
    """Vectorized XXH64 (seed configurable, parquet uses 0) over the
    ROWS of a C-contiguous (n, L) uint8 matrix — n equal-length byte
    strings hashed in one numpy pass. Same spec as the scalar `xxh64`
    (fuzz-pinned against it across every tail-length code path); the
    batch form exists because the ingest index probe hashes up to 2M
    fixed-width keys per batch and a pure-Python loop is seconds of
    serial driver CPU where numpy is milliseconds.

    All arithmetic is uint64 with C wraparound; byte loads view the
    row slices through explicit little-endian dtypes, so the result is
    host-endianness-independent. Returns a (n,) uint64 array."""
    import numpy as np

    M = np.ascontiguousarray(rows, dtype=np.uint8)
    if M.ndim != 2:
        raise ValueError("xxh64_batch expects a (n, L) uint8 matrix")
    n_rows, L = M.shape
    u64 = np.uint64
    P1, P2, P3, P4, P5 = (u64(_P1), u64(_P2), u64(_P3), u64(_P4), u64(_P5))

    def load64(i):
        return (
            np.ascontiguousarray(M[:, i : i + 8]).view(np.dtype("<u8")).ravel()
        )

    def load32(i):
        return (
            np.ascontiguousarray(M[:, i : i + 4])
            .view(np.dtype("<u4"))
            .ravel()
            .astype(u64)
        )

    def rotl(x, r):
        return (x << u64(r)) | (x >> u64(64 - r))

    def rnd(acc, lane):
        return rotl(acc + lane * P2, u64(31)) * P1

    i = 0
    if L >= 32:
        v1 = np.full(n_rows, u64((seed + _P1 + _P2) & _M64), dtype=u64)
        v2 = np.full(n_rows, u64((seed + _P2) & _M64), dtype=u64)
        v3 = np.full(n_rows, u64(seed & _M64), dtype=u64)
        v4 = np.full(n_rows, u64((seed - _P1) & _M64), dtype=u64)
        while i + 32 <= L:
            v1 = rnd(v1, load64(i))
            v2 = rnd(v2, load64(i + 8))
            v3 = rnd(v3, load64(i + 16))
            v4 = rnd(v4, load64(i + 24))
            i += 32
        h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
        for v in (v1, v2, v3, v4):
            h = (h ^ rnd(np.zeros(n_rows, dtype=u64), v)) * P1 + P4
    else:
        h = np.full(n_rows, u64((seed + _P5) & _M64), dtype=u64)
    h = h + u64(L)
    while i + 8 <= L:
        h = rotl(h ^ rnd(np.zeros(n_rows, dtype=u64), load64(i)), u64(27)) * P1 + P4
        i += 8
    if i + 4 <= L:
        h = rotl(h ^ (load32(i) * P1), u64(23)) * P2 + P3
        i += 4
    while i < L:
        h = rotl(h ^ (M[:, i].astype(u64) * P5), u64(11)) * P1
        i += 1
    h ^= h >> u64(33)
    h *= P2
    h ^= h >> u64(29)
    h *= P3
    h ^= h >> u64(32)
    return h


# ---------------------------------------------------------------------------
# Split-block bloom filter probe (parquet-format BloomFilter.md).

_SALT = (
    0x47B6137B,
    0x44974D91,
    0x8824AD5B,
    0xA2B7289D,
    0x705495C7,
    0x2DF1424B,
    0x9EFC4947,
    0x5C6BFB31,
)


def sbbf_might_contain(bitset: bytes, h: int) -> bool:
    """The spec's block probe. True = maybe present (or the bitset is
    malformed/empty — conservative); False = PROVABLY absent."""
    num_blocks = len(bitset) // 32
    if num_blocks == 0:
        return True
    base = (((h >> 32) * num_blocks) >> 32) * 32
    x = h & 0xFFFFFFFF
    for i in range(8):
        bit = ((x * _SALT[i]) & 0xFFFFFFFF) >> 27
        word = int.from_bytes(bitset[base + 4 * i : base + 4 * i + 4], "little")
        if not (word >> bit) & 1:
            return False
    return True


def sbbf_any_contained(bitset: bytes, hashes) -> bool:
    """Vectorized batch probe: True when ANY of the uint64 XXH64
    `hashes` MIGHT be present in the bitset (False = every hash
    provably absent). Same block math as `sbbf_might_contain`, run
    across the whole hash batch in a handful of numpy passes — the
    probe an incremental-ingest index lookup needs, where one file's
    filter is tested against O(batch) keys, not one literal. A
    malformed/empty bitset answers True (conservative)."""
    import numpy as np

    num_blocks = len(bitset) // 32
    if num_blocks == 0:
        return True
    h = np.ascontiguousarray(hashes, dtype=np.uint64)
    if h.size == 0:
        return False
    words = np.frombuffer(bitset, dtype="<u4")[: num_blocks * 8]
    # block index = ((h >> 32) * num_blocks) >> 32; h>>32 < 2^32 and
    # num_blocks <= 2^19 (16 MiB cap), so the product fits in uint64
    base = ((((h >> np.uint64(32)) * np.uint64(num_blocks)) >> np.uint64(32))
            * np.uint64(8)).astype(np.int64)
    x = (h & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    alive = np.ones(h.shape, dtype=bool)
    with np.errstate(over="ignore"):  # uint32 multiply wraps by spec
        for i in range(8):
            bit = (x * np.uint32(_SALT[i])) >> np.uint32(27)
            w = words[base + i]
            alive &= ((w >> bit) & np.uint32(1)).astype(bool)
            if not alive.any():
                return False
    return True


_MAX_BLOOM_BYTES = 16 * 1024 * 1024  # sanity cap; writer default max is 1 MiB


def _parse_bloom_header(buf: io.BytesIO) -> int | None:
    """BloomFilterHeader (thrift compact): {1: i32 numBytes,
    2: algorithm union, 3: hash union, 4: compression union}. Returns
    numBytes when the filter is the supported spec shape (BLOCK +
    XXHASH + UNCOMPRESSED — each union's field 1), else None. Leaves
    `buf` positioned at the first bitset byte."""
    num_bytes = None
    algo = hsh = comp = None
    try:
        for fid, ct in _struct_fields(buf):
            if ct in (_CT_TRUE, _CT_FALSE):
                continue
            if fid == 1 and ct == _CT_I32:
                num_bytes = _zigzag(buf)
            elif fid in (2, 3, 4) and ct == _CT_STRUCT:
                variant = None
                for ufid, uct in _struct_fields(buf):
                    variant = ufid
                    if uct not in (_CT_TRUE, _CT_FALSE):
                        _skip(buf, uct)
                if fid == 2:
                    algo = variant
                elif fid == 3:
                    hsh = variant
                else:
                    comp = variant
            else:
                _skip(buf, ct)
    except (ValueError, IndexError):
        return None
    if (algo, hsh, comp) != (1, 1, 1):
        return None  # not BLOCK/XXHASH/UNCOMPRESSED: can't interpret
    if num_bytes is None or num_bytes <= 0 or num_bytes > _MAX_BLOOM_BYTES:
        return None
    return num_bytes


def read_bloom_bitset(
    path: str, offset: int, length: int | None
) -> bytes | None:
    """One ranged read of a column chunk's bloom region. None when the
    filter can't be interpreted (keep the file)."""
    try:
        with open(path, "rb") as f:
            f.seek(offset)
            # fid-15 length covers header+bitset; without it, 64 bytes
            # is ample for the ~15-byte header, then read the declared
            # bitset tail.
            head = f.read(length if length else 64)
            buf = io.BytesIO(head)
            num_bytes = _parse_bloom_header(buf)
            if num_bytes is None:
                return None
            start = buf.tell()
            bitset = head[start : start + num_bytes]
            if len(bitset) < num_bytes:
                f.seek(offset + start + len(bitset))
                bitset += f.read(num_bytes - len(bitset))
            if len(bitset) != num_bytes or num_bytes % 32:
                return None
            return bitset
    except OSError:
        return None


# ---------------------------------------------------------------------------
# Equality-conjunct extraction. Same tight grammar family as the DML
# planner (iceberg_fs._DML_CMP): `col = lit`, flipped, and
# `col IN (lit, ...)`; anything else contributes no bloom pruning.

_IDENT = r"`?([A-Za-z_][A-Za-z0-9_]*)`?"
_LIT = r"(?:'(?:[^']|'')*'|-?\d+)"
_EQ = re.compile(rf"^{_IDENT}\s*==?\s*({_LIT})$", re.IGNORECASE)
_EQ_FLIP = re.compile(rf"^({_LIT})\s*==?\s*{_IDENT}$", re.IGNORECASE)
_IN = re.compile(
    rf"^{_IDENT}\s+IN\s*\(\s*({_LIT}(?:\s*,\s*{_LIT})*)\s*\)$", re.IGNORECASE
)
_IN_SPLIT = re.compile(rf"({_LIT})")

# Iceberg column type -> (expected parquet physical type, plain encoder).
# Floats deliberately absent (0.0/-0.0 hash differently but compare
# equal); other types absent until a use case proves them out.
_ENCODERS: dict[str, tuple[int, Any]] = {
    "string": (PHYS_BYTE_ARRAY, lambda s: s.encode("utf-8")),
    "int": (
        PHYS_INT32,
        lambda v: struct.pack("<i", v) if -(2**31) <= v < 2**31 else None,
    ),
    "long": (
        PHYS_INT64,
        lambda v: struct.pack("<q", v) if -(2**63) <= v < 2**63 else None,
    ),
}


def _parse_lit(text: str, col_type: str) -> Any | None:
    t = text.strip()
    if t.startswith("'"):
        return t[1:-1].replace("''", "'") if col_type == "string" else None
    if col_type in ("int", "long"):
        try:
            return int(t)
        except ValueError:
            return None
    return None


def parse_bloom_conjuncts(
    conjuncts: list[str], bloom_cols: dict[str, str]
) -> dict[str, tuple[int, list[bytes]]]:
    """{column -> (expected physical type, plain-encoded probe values)}
    for the AND-level equality conjuncts on bloom-enabled columns
    (`bloom_cols`: name -> Iceberg type). For `IN`, the file must miss
    EVERY listed value to be prunable, so all encodings are returned.
    Case-insensitive column resolution, mirroring the DML grammar."""
    by_fold = {name.casefold(): (name, t) for name, t in bloom_cols.items()}
    out: dict[str, tuple[int, list[bytes]]] = {}
    for raw in conjuncts:
        c = raw.strip()
        col = None
        lits: list[str] = []
        m = _EQ.match(c)
        if m:
            col, lits = m.group(1), [m.group(2)]
        else:
            m = _EQ_FLIP.match(c)
            if m:
                col, lits = m.group(2), [m.group(1)]
            else:
                m = _IN.match(c)
                if m:
                    col = m.group(1)
                    lits = _IN_SPLIT.findall(m.group(2))
        if col is None or col.casefold() not in by_fold:
            continue
        name, col_type = by_fold[col.casefold()]
        if col_type not in _ENCODERS:
            continue
        phys, enc = _ENCODERS[col_type]
        vals = [_parse_lit(lit, col_type) for lit in lits]
        if any(v is None for v in vals):
            continue
        plains = [enc(v) for v in vals]
        if any(p is None for p in plains):
            continue
        # two equality conjuncts on the same column AND together —
        # either one's proof of absence suffices, keep the shorter list
        if name not in out or len(plains) < len(out[name][1]):
            out[name] = (phys, plains)
    return out


def _file_provably_matchless(
    path: str, probes: dict[str, tuple[int, list[bytes]]]
) -> bool:
    """True only when some probed column's values are PROVEN absent from
    every row group of `path`."""
    try:
        groups = footer_row_group_stats(path)
    except (ValueError, OSError, IndexError):
        return False
    if not groups:
        return False
    bitsets: dict[int, bytes | None] = {}
    for col, (phys, plains) in probes.items():
        hashes = [xxh64(p) for p in plains]
        absent_everywhere = True
        for g in groups:
            info = g["columns"].get(col)
            if (
                info is None
                or info.get("bloom_offset") is None
                or info["type"] != phys
            ):
                absent_everywhere = False
                break
            off = info["bloom_offset"]
            if off not in bitsets:
                bitsets[off] = read_bloom_bitset(
                    path, off, info.get("bloom_length")
                )
            bs = bitsets[off]
            if bs is None or any(sbbf_might_contain(bs, h) for h in hashes):
                absent_everywhere = False
                break
        if absent_everywhere:
            return True
    return False


def prune_files_by_bloom(
    files: list, probes: dict[str, tuple[int, list[bytes]]], spark=None
) -> tuple[list, list]:
    """(kept, dropped) split of candidate DataFiles by bloom probes
    (from parse_bloom_conjuncts). Every failure mode keeps the file.

    Small lists probe on driver threads; with a session and a large
    candidate list (the NORMAL bloom case — blooms fire exactly when
    min/max bounds don't prune, so candidates ≈ the whole live file
    set) the probe ships to executors and only booleans return
    (footer_probe.probe_verdicts)."""
    if not files or not probes:
        return list(files), []
    from .footer_probe import probe_verdicts

    verdict = probe_verdicts(
        [f.file_path for f in files],
        partial(_file_provably_matchless, probes=probes),
        spark=spark,
    )
    kept = [f for f in files if not verdict[f.file_path]]
    dropped = [f for f in files if verdict[f.file_path]]
    return kept, dropped


def _file_matchless_for_hashes(path: str, col: str, phys: int, hashes) -> bool:
    """True only when EVERY row group of `path` carries a readable
    spec-valid bloom on `col` (expected physical type `phys`) and NO
    hash in the uint64 batch tests present — proof the file holds none
    of the batch's keys. Any read/shape surprise keeps the file."""
    try:
        groups = footer_row_group_stats(path)
    except (ValueError, OSError, IndexError):
        return False
    if not groups:
        return False
    for g in groups:
        info = g["columns"].get(col)
        if info is None or info.get("bloom_offset") is None or info["type"] != phys:
            return False
        bs = read_bloom_bitset(path, info["bloom_offset"], info.get("bloom_length"))
        if bs is None or sbbf_any_contained(bs, hashes):
            return False
    return True


def _file_matchless_for_hash_broadcast(path: str, col: str, phys: int, bc) -> bool:
    """Broadcast-variable flavor of _file_matchless_for_hashes: the
    uint64 hash array travels to each executor ONCE (torrent broadcast)
    instead of riding every task's serialized closure — at the probe's
    2M-key cap the array is 16 MB, which per-task pickling would ship
    hundreds of times."""
    return _file_matchless_for_hashes(path, col, phys, bc.value)


def prune_files_by_hash_batch(
    files: list, col: str, hashes, spark=None
) -> tuple[list, list]:
    """(kept, dropped) split of candidate DataFiles for a BATCH
    point-lookup: drop every file whose blooms prove it contains NONE
    of the uint64 XXH64 `hashes` (plain-encoded key values, seed 0 —
    `xxh64(key.encode())` for strings). This is the incremental-ingest
    index probe: a micro-batch carries O(batch) uniformly-hashed keys,
    each living in at most a handful of index files, so on a grown
    index the surviving set — and therefore the bytes the subsequent
    scan reads — scales with the BATCH, not the corpus. Only string
    keys are supported (the ingesters' key columns are md5 hex).
    Files without interpretable blooms are kept: strictly conservative.

    Probe cost is O(files × batch) bit tests but vectorized
    (`sbbf_any_contained` — a few numpy passes per row group) and
    routed through footer_probe: driver threads for small file lists,
    one executor-side mapInPandas job (booleans only to the driver)
    at DISTRIBUTED_THRESHOLD+ files."""
    import numpy as np

    if not files:
        return [], []
    h = np.ascontiguousarray(hashes, dtype=np.uint64)
    if h.size == 0:
        # no keys: every file is provably matchless for the batch
        return [], list(files)
    from .footer_probe import DISTRIBUTED_THRESHOLD, probe_verdicts

    paths = [f.file_path for f in files]
    bc = None
    if spark is not None and len(paths) >= DISTRIBUTED_THRESHOLD:
        # executor-side probe: ship the hash array once per executor
        bc = spark.sparkContext.broadcast(h)
        probe_fn = partial(
            _file_matchless_for_hash_broadcast,
            col=col,
            phys=PHYS_BYTE_ARRAY,
            bc=bc,
        )
    else:
        probe_fn = partial(
            _file_matchless_for_hashes, col=col, phys=PHYS_BYTE_ARRAY, hashes=h
        )
    try:
        verdict = probe_verdicts(paths, probe_fn, spark=spark)
    finally:
        if bc is not None:
            bc.unpersist()
    kept = [f for f in files if not verdict[f.file_path]]
    dropped = [f for f in files if verdict[f.file_path]]
    return kept, dropped
