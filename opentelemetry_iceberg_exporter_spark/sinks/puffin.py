"""Puffin statistics files (Apache Iceberg's "Puffin file format" spec)
+ per-column NDV statistics computed as distributed Spark jobs.

Container layout, implemented exactly from the public spec:

    Puffin  == Magic Blob_1 ... Blob_n Footer
    Footer  == Magic FooterPayload FooterPayloadSize Flags Magic
    Magic   == 0x50 0x46 0x41 0x31 ("PFA1")

FooterPayload is the UTF-8 JSON FileMetadata ({"blobs": [BlobMetadata],
"properties": {...}}); FooterPayloadSize is a 4-byte little-endian int;
Flags is 4 bytes (bit 0 of byte 0 = payload compressed — this writer
always emits uncompressed, flag 0, and the reader rejects the
compressed bit it does not implement). BlobMetadata carries type,
fields (source field ids), snapshot-id, sequence-number, offset,
length, and properties. Footer JSON is serialized with sorted keys and
compact separators so the bytes are deterministic (pinned by the
spec-independent golden fixtures in tests/golden/).

The NDV blob type is ``engine-kmv-ndv-v1`` — a K-Minimum-Values sketch
over the repo's cross-engine md5-derived 60-bit hash (NOT Apache
DataSketches' theta serialization: emitting foreign bytes under the
``apache-datasketches-theta-v1`` name without a second reader to verify
them would be worse than an honest engine-specific type, which the
Puffin spec explicitly permits and other readers skip). The blob
payload is ``KMV1 | k:u32le | n:u32le | n ascending u64le hashes``;
the exact NDV (computed distributed) travels in the blob's ``ndv``
property — the same property engines read off theta blobs — so
planners never parse the sketch for the common case.

Statistics registration follows the table-spec ``statistics`` field
(StatisticsFile: snapshot-id, statistics-path, file-size-in-bytes,
file-footer-size-in-bytes, blob-metadata), committed on the fs catalog
via a metadata-only CAS and over REST via the spec's set-statistics /
remove-statistics update actions. One statistics file per snapshot;
recompute replaces, snapshot expiry drops entry + file.

No reference counterpart (the reference delegates all statistics to
iceberg-go); engine extension R25.
"""

from __future__ import annotations

import json
import os
import struct
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAGIC = b"PFA1"
KMV_BLOB_TYPE = "engine-kmv-ndv-v1"
KMV_MAGIC = b"KMV1"
KMV_K = 64
# 60-bit hash space of md5_hash64 (15 hex chars)
HASH_SPACE = 1 << 60


# ---------------------------------------------------------------------------
# container


def write_puffin(path: str, blobs: list[dict], properties: dict | None = None) -> dict:
    """Write a Puffin file. Each blob dict: {type, fields, snapshot-id,
    sequence-number, payload: bytes, properties: dict}. Returns the
    StatisticsFile fragment {file-size-in-bytes, file-footer-size-in-
    bytes, blob-metadata} (path/snapshot added by the caller)."""
    blob_meta: list[dict] = []
    with open(path, "wb") as f:
        f.write(MAGIC)
        offset = len(MAGIC)
        for b in blobs:
            payload = b["payload"]
            f.write(payload)
            blob_meta.append(
                {
                    "type": b["type"],
                    "fields": list(b["fields"]),
                    "snapshot-id": b["snapshot-id"],
                    "sequence-number": b["sequence-number"],
                    "offset": offset,
                    "length": len(payload),
                    "properties": dict(b.get("properties", {})),
                }
            )
            offset += len(payload)
        footer_payload = json.dumps(
            {"blobs": blob_meta, "properties": dict(properties or {})},
            sort_keys=True,
            separators=(",", ":"),
        ).encode("utf-8")
        f.write(MAGIC)
        f.write(footer_payload)
        f.write(struct.pack("<i", len(footer_payload)))
        f.write(b"\x00\x00\x00\x00")  # flags: uncompressed footer
        f.write(MAGIC)
    footer_size = len(MAGIC) * 2 + len(footer_payload) + 8
    return {
        "file-size-in-bytes": os.path.getsize(path),
        "file-footer-size-in-bytes": footer_size,
        "blob-metadata": blob_meta,
    }


def read_puffin(path: str) -> tuple[dict, list[bytes]]:
    """Read a Puffin file -> (FileMetadata, payload bytes per blob,
    in blob-metadata order). Validates all three magics and rejects
    the footer-compression flag (never written here)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != MAGIC or data[-4:] != MAGIC:
        raise ValueError(f"{path}: not a Puffin file (bad magic)")
    flags = data[-8:-4]
    if flags[0] & 1:
        raise ValueError(f"{path}: compressed footer payload not supported")
    if any(flags[1:]) or flags[0] & ~1:
        raise ValueError(f"{path}: reserved Puffin flag bits set")
    (payload_size,) = struct.unpack("<i", data[-12:-8])
    payload_end = len(data) - 12
    payload_start = payload_end - payload_size
    if data[payload_start - 4 : payload_start] != MAGIC:
        raise ValueError(f"{path}: footer start magic missing")
    meta = json.loads(data[payload_start:payload_end].decode("utf-8"))
    payloads = [
        data[b["offset"] : b["offset"] + b["length"]] for b in meta.get("blobs", [])
    ]
    return meta, payloads


# ---------------------------------------------------------------------------
# deletion vectors (Iceberg v3 "Deletion Vectors" blob, `deletion-vector-v1`)
#
# Blob payload layout per the v3 spec (deliberately bit-compatible with
# Delta Lake DVs):
#   length : 4 bytes BIG-endian — len(magic + vector)
#   magic  : the u32 constant 1681511377 little-endian = D1 D3 39 64
#            (the Delta deletion-vector magic the Iceberg spec adopted)
#   vector : 64-bit roaring bitmap, portable serialization (roaring.py)
#   crc    : 4 bytes BIG-endian CRC-32 of (magic + vector)
# BlobMetadata properties carry `referenced-data-file` and `cardinality`.
# ---------------------------------------------------------------------------

DV_BLOB_TYPE = "deletion-vector-v1"
DV_MAGIC = struct.pack("<I", 1681511377)  # D1 D3 39 64


def dv_payload_from_vec(vec: bytes) -> bytes:
    """Wrap an already-serialized 64-bit roaring vector as a DV blob
    payload (executors serialize vectors; the driver only wraps)."""
    import zlib

    body = DV_MAGIC + vec
    return struct.pack(">i", len(body)) + body + struct.pack(">I", zlib.crc32(body))


def encode_deletion_vector(positions) -> bytes:
    """Serialize sorted unique uint64 row positions as a DV blob payload."""
    from .roaring import serialize_64

    return dv_payload_from_vec(serialize_64(positions))


def decode_deletion_vector(payload: bytes):
    """DV blob payload -> sorted uint64 numpy array of deleted positions.
    Validates length, magic, and CRC."""
    import zlib

    from .roaring import deserialize_64

    (n,) = struct.unpack_from(">i", payload, 0)
    body = payload[4 : 4 + n]
    if len(body) != n:
        raise ValueError("deletion vector blob truncated")
    if body[:4] != DV_MAGIC:
        raise ValueError("deletion vector magic mismatch")
    (crc,) = struct.unpack_from(">I", payload, 4 + n)
    if zlib.crc32(body) != crc:
        raise ValueError("deletion vector CRC mismatch")
    return deserialize_64(body[4:])


def write_deletion_vector_file(
    location: str,
    dvs: dict[str, tuple[bytes, int]],
    sequence_number: int,
    snapshot_id: int = -1,
) -> tuple[str, dict[str, tuple[int, int, int]]]:
    """Write ONE Puffin file holding a DV blob per referenced data file
    (the spec's layout: a commit's vectors co-locate in one file).
    `dvs` maps data-file path -> (serialized 64-bit roaring vector,
    cardinality) — vectors arrive pre-serialized from the executors.
    snapshot_id = -1 in blob metadata means "assigned at commit" (the
    tree writer generates snapshot ids after planning; the MANIFEST
    entry is the authoritative locator either way). Returns
    (puffin path, {data_file: (content_offset, content_size_in_bytes,
    cardinality)}) for the manifest entries."""
    path = os.path.join(location, "data", f"dv-{uuid.uuid4().hex}.puffin")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    blobs = []
    order = sorted(dvs)
    for data_file in order:
        vec, card = dvs[data_file]
        blobs.append(
            {
                "type": DV_BLOB_TYPE,
                "fields": [],
                "snapshot-id": snapshot_id,
                "sequence-number": sequence_number,
                "payload": dv_payload_from_vec(bytes(vec)),
                "properties": {
                    "referenced-data-file": data_file,
                    "cardinality": str(card),
                },
            }
        )
    meta = write_puffin(path, blobs)
    spans: dict[str, tuple[int, int, int]] = {}
    for data_file, bm in zip(order, meta["blob-metadata"]):
        spans[data_file] = (
            bm["offset"],
            bm["length"],
            int(bm["properties"]["cardinality"]),
        )
    return path, spans


def read_deletion_vector_span(path: str, offset: int, length: int):
    """Read ONE DV blob by its manifest-recorded span — no footer parse,
    no full-file read (the point of content_offset/content_size: a scan
    touches exactly the bytes of the vectors it needs)."""
    with open(path, "rb") as f:
        f.seek(offset)
        payload = f.read(length)
    return decode_deletion_vector(payload)


# ---------------------------------------------------------------------------
# KMV sketch


def encode_kmv(hashes: list[int], k: int = KMV_K) -> bytes:
    """KMV1 | k:u32le | n:u32le | ascending u64le hashes."""
    hs = sorted(hashes)[:k]
    return (
        KMV_MAGIC
        + struct.pack("<II", k, len(hs))
        + b"".join(struct.pack("<Q", h) for h in hs)
    )


def decode_kmv(payload: bytes) -> tuple[int, list[int]]:
    if payload[:4] != KMV_MAGIC:
        raise ValueError("not a KMV1 payload")
    k, n = struct.unpack("<II", payload[4:12])
    hashes = [
        struct.unpack("<Q", payload[12 + 8 * i : 20 + 8 * i])[0] for i in range(n)
    ]
    return k, hashes


def kmv_estimate(k: int, hashes: list[int]) -> float:
    """NDV estimate: fewer than k distinct values -> exact count; else
    (k-1)/theta with theta = kth-min / hash-space."""
    if len(hashes) < k:
        return float(len(hashes))
    # kth-min of 0 (only possible at k=1) would zero theta; clamp to the
    # smallest representable fraction of the hash space
    theta = max(hashes[k - 1], 1) / HASH_SPACE
    return (k - 1) / theta


# ---------------------------------------------------------------------------
# distributed NDV computation


def _stats_columns(md: dict) -> list[dict]:
    """Top-level primitive fields of the current schema (same support
    surface as manifest column bounds)."""
    from .iceberg_fs import current_schema

    return [
        f
        for f in current_schema(md)["fields"]
        if isinstance(f["type"], str)  # primitives are plain strings
    ]


def compute_ndv_blobs(
    spark_df: DataFrame,
    fields: list[dict],
    snapshot_id: int,
    sequence_number: int,
) -> list[dict]:
    """One KMV blob per column. Distributed shape: ONE multi-column
    count_distinct aggregate for the exact NDVs (single scan), then per
    column a distinct -> TakeOrdered(k) job over the md5-derived hash —
    only k longs ever reach the driver per column, and the scans are
    column-pruned. The exact count is a full distinct per column (this
    is an offline stats job, same cost class as Iceberg's own
    compute_table_stats action)."""
    from ..functions.textfns import md5_hash64

    if not fields:
        return []
    exact = spark_df.agg(
        *[
            F.count_distinct(F.col(f["name"])).alias(f["name"])
            for f in fields
        ]
    ).collect()[0]
    blobs = []
    for f in fields:
        name = f["name"]
        hashes = [
            r["h"]
            for r in (
                spark_df.select(
                    md5_hash64(F.col(name).cast("string")).alias("h")
                )
                .filter(F.col("h").isNotNull())
                .distinct()
                .orderBy("h")
                .limit(KMV_K)
                .collect()
            )
        ]
        blobs.append(
            {
                "type": KMV_BLOB_TYPE,
                "fields": [f["id"]],
                "snapshot-id": snapshot_id,
                "sequence-number": sequence_number,
                "payload": encode_kmv(hashes),
                "properties": {"ndv": str(int(exact[name]))},
            }
        )
    return blobs


def write_column_stats_file(
    spark: SparkSession,
    location: str,
    md: dict,
    table_df: DataFrame,
    snapshot_id: int,
    columns: list[str] | None = None,
) -> dict | None:
    """Compute + write the Puffin for a snapshot; returns the full
    StatisticsFile entry (None when the schema has no primitive
    columns). `table_df` must be the snapshot's deletes-applied scan."""
    fields = _stats_columns(md)
    if columns is not None:
        want = set(columns)
        unknown = want - {f["name"] for f in fields}
        if unknown:
            raise ValueError(
                f"no such primitive top-level column(s): {sorted(unknown)}"
            )
        fields = [f for f in fields if f["name"] in want]
    if not fields:
        return None
    snap = next(
        s for s in md["snapshots"] if s["snapshot-id"] == snapshot_id
    )
    blobs = compute_ndv_blobs(
        table_df, fields, snapshot_id, snap.get("sequence-number", 0)
    )
    os.makedirs(os.path.join(location, "metadata"), exist_ok=True)
    path = os.path.join(
        location, "metadata", f"stats-{snapshot_id}-{uuid.uuid4().hex}.puffin"
    )
    frag = write_puffin(path, blobs, {"created-by": "otel-spark-engine"})
    return {
        "snapshot-id": snapshot_id,
        "statistics-path": os.path.abspath(path),
        **frag,
    }


def merge_kmv(parts: list[tuple[int, list[int]]]) -> tuple[int, list[int], int | None]:
    """Union KMV sketches (the reason sketches exist: stats of an
    append-only window merge into stats of the whole table without a
    rescan). Returns (k, merged_k_min_hashes, exact_ndv_or_None):
    a sketch holding FEWER than its k hashes is the COMPLETE distinct-
    hash set of its input, so if every part is complete the union is the
    complete set and its size is the exact (hash-)distinct count —
    otherwise only the (k-1)/theta estimate applies."""
    k = min(p[0] for p in parts)
    complete = all(len(h) < pk for pk, h in parts)
    union = sorted(set().union(*[set(h) for _, h in parts]))
    exact = len(union) if complete else None
    return k, union[:k], exact


def incremental_column_stats_entry(
    spark: SparkSession,
    location: str,
    md: dict,
    new_files_df: DataFrame,
    prev_stats: dict[str, dict],
    snapshot_id: int,
    sequence_number: int,
) -> dict | None:
    """Build the StatisticsFile for `snapshot_id` by sketching ONLY the
    window's new rows and KMV-merging with the previous snapshot's
    sketches — O(increment), never O(table). The `ndv` property is the
    exact hash-distinct union size when both sides' sketches are
    complete, else the KMV estimate; `ndv-exact` records which."""
    fields = [f for f in _stats_columns(md) if f["name"] in prev_stats]
    if not fields:
        return None
    inc_blobs = compute_ndv_blobs(
        new_files_df, fields, snapshot_id, sequence_number
    )
    blobs = []
    for f, inc in zip(fields, inc_blobs):
        prev = prev_stats[f["name"]]
        _, inc_hashes = decode_kmv(inc["payload"])
        k, merged, exact = merge_kmv(
            [(prev["k"], prev["sketch"]), (KMV_K, inc_hashes)]
        )
        # a previous EXACT ndv with a complete sketch keeps exactness
        prev_complete = len(prev["sketch"]) < prev["k"]
        if exact is not None and prev.get("exact", True) and prev_complete:
            ndv, is_exact = exact, True
        else:
            ndv, is_exact = int(round(kmv_estimate(k, merged))), False
        blobs.append(
            {
                "type": KMV_BLOB_TYPE,
                "fields": [f["id"]],
                "snapshot-id": snapshot_id,
                "sequence-number": sequence_number,
                "payload": encode_kmv(merged, k=k),
                "properties": {
                    "ndv": str(ndv),
                    "ndv-exact": "true" if is_exact else "false",
                },
            }
        )
    os.makedirs(os.path.join(location, "metadata"), exist_ok=True)
    path = os.path.join(
        location, "metadata", f"stats-{snapshot_id}-{uuid.uuid4().hex}.puffin"
    )
    frag = write_puffin(path, blobs, {"created-by": "otel-spark-engine"})
    return {
        "snapshot-id": snapshot_id,
        "statistics-path": os.path.abspath(path),
        **frag,
    }


def plan_incremental_stats(
    spark: SparkSession, md: dict, location: str
) -> tuple[str, dict | None]:
    """Transport-neutral planning for an incremental stats refresh.
    Returns ("empty", None) on an empty table, ("existing", entry) when
    the current snapshot already has stats, or ("new", entry) with the
    entry to commit. Raises when no ancestor has stats (seed with a
    full compute first) or the window contains a delete/overwrite
    (sketches cannot subtract)."""
    from .iceberg_fs import incremental_data_files, read_schema_for, table_file_scan

    current = md["current-snapshot-id"]
    if current == -1:
        return "empty", None
    with_stats = {e["snapshot-id"] for e in md.get("statistics", [])}
    by_id = {s["snapshot-id"]: s for s in md["snapshots"]}
    cursor, prev_sid = current, None
    while cursor is not None and cursor in by_id:
        if cursor in with_stats:
            prev_sid = cursor
            break
        cursor = by_id[cursor].get("parent-snapshot-id")
    if prev_sid is None:
        raise FileNotFoundError(
            "no ancestor snapshot has column stats; run "
            "compute_column_stats() once to seed"
        )
    if prev_sid == current:
        return "existing", next(
            e for e in md["statistics"] if e["snapshot-id"] == current
        )
    prev_stats = read_column_stats(md, prev_sid)
    files = incremental_data_files(md, prev_sid, current)[0]
    schema = read_schema_for(spark, md)
    new_df = (
        table_file_scan(spark, md, schema, [f.file_path for f in files])
        if files
        else spark.createDataFrame([], schema)
    )
    snap = by_id[current]
    entry = incremental_column_stats_entry(
        spark,
        location,
        md,
        new_df,
        prev_stats,
        current,
        snap.get("sequence-number", 0),
    )
    return "new", entry


def read_column_stats(md: dict, snapshot_id: int | None = None) -> dict[str, dict]:
    """{column_name: {"ndv": int, "k": int, "sketch": [hashes],
    "estimate": float}} from the REGISTERED statistics file of a
    snapshot (current when None). Raises if none is registered."""
    from .iceberg_fs import current_schema

    sid = md["current-snapshot-id"] if snapshot_id is None else snapshot_id
    entry = next(
        (e for e in md.get("statistics", []) if e["snapshot-id"] == sid), None
    )
    if entry is None:
        raise FileNotFoundError(
            f"no statistics file registered for snapshot {sid}; run "
            "compute_column_stats()"
        )
    meta, payloads = read_puffin(entry["statistics-path"])
    by_id = {f["id"]: f["name"] for f in current_schema(md)["fields"]}
    out: dict[str, dict] = {}
    for bm, payload in zip(meta["blobs"], payloads):
        if bm["type"] != KMV_BLOB_TYPE:
            continue  # unknown blob types are skippable per spec
        k, hashes = decode_kmv(payload)
        name = by_id.get(bm["fields"][0], f"field-{bm['fields'][0]}")
        out[name] = {
            "ndv": int(bm["properties"]["ndv"]),
            "exact": bm["properties"].get("ndv-exact", "true") == "true",
            "k": k,
            "sketch": hashes,
            "estimate": kmv_estimate(k, hashes),
        }
    return out
