"""`df.write.format("iceberg_fs")` / `writeStream.format("iceberg_fs")`
— the WRITE half of the native Spark format (see iceberg_source.py for
reads).

Spark's Python Data Source writer protocol IS Iceberg's commit
protocol, mapped one-to-one:

* each executor task streams its Arrow batches, splits them by the
  table's hidden partition transform (the same numpy murmur3 /
  floor-div kernels the column path uses), writes one Parquet file per
  partition value it saw (field-id-stamped, rename-safe), and returns
  the file list as its WriterCommitMessage;
* the DRIVER receives every task's messages only if ALL tasks
  succeeded, and turns them into ONE atomic metadata commit
  (`FsTable.append_files` — CAS version swap, O(new files));
* `abort()` deletes the orphaned task files (and the regular
  `remove_orphan_files` maintenance sweeps anything a crashed driver
  left behind).

The streaming writer adds idempotence: each epoch commits one snapshot
stamped with its `spark-batch-id`, and a replayed epoch (restart
between sink commit and checkpoint advance) is recognized from the
snapshot summaries on main's ancestry and skipped — the classic
Iceberg exactly-once streaming sink.

`mode("append")` only: a Spark-level full-table overwrite is a
different commit shape (it would also break the incremental/changelog
contracts) — use `FsTable.rewrite_data_files` / `delete_where` for
surgical rewrites.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSourceArrowWriter,
    DataSourceStreamWriter,
    WriterCommitMessage,
)

from ..sinks.iceberg_fs import (
    DataFile,
    FsTable,
    _ancestry_window,
    current_schema,
    default_spec_fields,
)
from ..sinks.transforms import parse_transform


@dataclass
class _WrittenFiles(WriterCommitMessage):
    # (file_path, size_bytes, record_count, ((pname, pvalue), ...)) per file
    files: tuple


def _micros(col):
    import pyarrow as pa
    import pyarrow.compute as pc

    return pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)


def _transform_values(col, transform: str, source_type: str):
    """Partition value per row of one Arrow column — the executor-side
    numpy mirror of transform_column (nulls -> None partitions)."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from ..sinks.transforms import murmur3_bytes_batch, murmur3_longs

    base, param = parse_transform(transform)
    null_mask = pc.is_null(col).to_numpy(zero_copy_only=False)
    if base in ("hours", "days"):
        sec = {"hours": 3600, "days": 86400}[base]
        vals = _micros(col) // (sec * 1_000_000)  # numpy // floors
    elif base in ("months", "years"):
        y = pc.year(col).to_numpy(zero_copy_only=False)
        m = pc.month(col).to_numpy(zero_copy_only=False)
        vals = (y - 1970) * 12 + (m - 1) if base == "months" else y - 1970
    elif base == "bucket":
        if source_type in ("int", "long"):
            longs = col.cast("int64").to_numpy(zero_copy_only=False)
        elif source_type in ("timestamp", "timestamptz"):
            longs = _micros(col)
        elif source_type == "date":
            longs = col.cast("int32").cast("int64").to_numpy(zero_copy_only=False)
        else:
            s = pd.Series(col.to_pylist(), dtype="object")
            encoded = s.map(
                lambda v: None
                if v is None
                else (v.encode("utf-8") if isinstance(v, str) else bytes(v))
            )
            hashed = murmur3_bytes_batch(encoded).astype("int64")
            vals = (hashed & 0x7FFFFFFF) % param
            return [None if n else int(v) for n, v in zip(null_mask, vals)]
        safe = np.where(null_mask, 0, longs).astype("int64")
        hashed = murmur3_longs(safe).astype("int64")
        vals = (hashed & 0x7FFFFFFF) % param
    elif base == "truncate":
        if source_type in ("int", "long"):
            longs = col.cast("int64").to_numpy(zero_copy_only=False)
            safe = np.where(null_mask, 0, longs).astype("int64")
            vals = safe - (safe % param)  # numpy % is floor-mod
        else:
            return [
                None if v is None else str(v)[:param] for v in col.to_pylist()
            ]
    else:
        raise ValueError(f"unsupported transform {transform!r}")
    return [None if n else int(v) for n, v in zip(null_mask, vals)]


class IcebergFsArrowWriter(DataSourceArrowWriter):
    def __init__(self, options, overwrite: bool):
        if overwrite:
            raise ValueError(
                "iceberg_fs supports mode('append') only — full-table "
                "overwrites would break the incremental/changelog "
                "contracts; use delete_where/rewrite_data_files"
            )
        self.location = options["path"]
        # DRIVER-side planning state, pickled to the tasks
        md = FsTable(self.location).metadata()
        schema = current_schema(md)
        self.fields = tuple(
            (f["name"], f["type"] if isinstance(f["type"], str) else None, f["id"])
            for f in schema["fields"]
        )
        name_by_id = {f["id"]: f["name"] for f in schema["fields"]}
        type_by_id = {
            f["id"]: f["type"] for f in schema["fields"] if isinstance(f["type"], str)
        }
        self.spec = tuple(
            (pf["name"], pf["transform"], name_by_id[pf["source-id"]], type_by_id[pf["source-id"]])
            for pf in default_spec_fields(md)
        )
        self.batch_dir = os.path.join(self.location, "data", uuid.uuid4().hex)

    # -- executor side -----------------------------------------------------
    def write(self, iterator):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        batches = list(iterator)
        if not batches:
            return _WrittenFiles(())
        table = pa.Table.from_batches(batches)
        # field-id-stamped schema (rename-safe files, same as the engine)
        fields = []
        for f in table.schema:
            fid = next((i for n, _, i in self.fields if n == f.name), None)
            meta = {b"PARQUET:field_id": str(fid).encode()} if fid else None
            fields.append(pa.field(f.name, f.type, f.nullable, metadata=meta))
        table = table.cast(pa.schema(fields))

        # split rows by the tuple of partition values
        if self.spec:
            per_field = [
                _transform_values(table[source], transform, stype)
                for _, transform, source, stype in self.spec
            ]
            keys = list(zip(*per_field))
            uniq = sorted(set(keys), key=lambda k: tuple((v is None, v) for v in k))
        else:
            keys = None
            uniq = [()]

        os.makedirs(self.batch_dir, exist_ok=True)
        written = []
        for key in uniq:
            if keys is not None:
                mask = np.fromiter((k == key for k in keys), dtype=bool, count=len(keys))
                part = table.filter(pa.array(mask))
            else:
                part = table
            path = os.path.join(self.batch_dir, f"part-{uuid.uuid4().hex}.parquet")
            pq.write_table(part, path, compression="zstd")
            partition = tuple(
                (self.spec[i][0], key[i]) for i in range(len(self.spec))
            )
            written.append((path, os.path.getsize(path), part.num_rows, partition))
        return _WrittenFiles(tuple(written))

    # -- driver side -------------------------------------------------------
    def _data_files(self, messages) -> list[DataFile]:
        return [
            DataFile(
                file_path=path,
                file_size_in_bytes=size,
                record_count=rows,
                partition=dict(partition),
            )
            for m in messages
            if m is not None
            for (path, size, rows, partition) in m.files
        ]

    def commit(self, messages) -> None:
        files = self._data_files(messages)
        if files:
            FsTable(self.location).append_files(files)

    def abort(self, messages) -> None:
        for f in self._data_files(messages):
            try:
                os.remove(f.file_path)
            except OSError:
                pass


class IcebergFsStreamWriter(IcebergFsArrowWriter, DataSourceStreamWriter):
    """One snapshot per epoch, idempotent on epoch replay."""

    def _committed_batch_ids(self) -> set:
        md = FsTable(self.location).metadata()
        chain, _ = _ancestry_window(md, None, None)
        return {
            s["summary"].get("spark-batch-id")
            for s in chain
            if "spark-batch-id" in s["summary"]
        }

    def commit(self, messages, batchId: int) -> None:  # noqa: N803 (API name)
        files = self._data_files(messages)
        if not files:
            return
        if str(batchId) in self._committed_batch_ids():
            # epoch replay after a restart that crashed between sink
            # commit and checkpoint advance: drop the duplicate files,
            # keep the original snapshot (exactly-once)
            self.abort(messages)
            return
        FsTable(self.location).append_files(
            files, snapshot_properties={"spark-batch-id": str(batchId)}
        )

    def abort(self, messages, batchId: int | None = None) -> None:  # noqa: N803
        IcebergFsArrowWriter.abort(self, messages)
