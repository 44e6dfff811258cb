"""Cross-partition file repartitioner — R6.

Reference parity (internal/recovery/repartitioner.go:77-196): a file
whose rows span multiple time partitions cannot be registered as one
Iceberg data file ('more than one value for partition field', X4). The
reference reads it, SplitByPartition's it, writes one file per hour,
registers them atomically, then deletes the original (with partial-write
cleanup on failure).

In Spark the split-write IS the partitioned writer: read the misplaced
file as a DataFrame and append through the Hive/Iceberg partitioned sink
— correct partitioning by definition (SURVEY §2.4 R6 'the whole operator
dissolves'). What remains is the orchestration: write -> verify row
count -> delete original.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass

from pyspark.sql import SparkSession

from .. import schemas as S
from ..config import ExporterConfig
from ..sinks.parquet_sink import write_raw_parquet

log = logging.getLogger(__name__)


@dataclass
class RepartitionResult:
    uri: str
    table: str
    rows: int
    deleted: bool


def repartition_file(
    spark: SparkSession,
    uri: str,
    table: str,
    config: ExporterConfig,
    *,
    delete_original: bool = True,
) -> RepartitionResult:
    """Read a misplaced Parquet file and re-append it through the
    partitioned sink; optionally delete the original.

    The write is atomic-per-task (Parquet committer); the original is
    deleted only AFTER the write succeeds, mirroring the reference's
    write-register-then-delete ordering (repartitioner.go:77-196). A
    crash between write and delete leaves a duplicate original — which
    the next recovery run re-detects as an orphan, same as the
    reference's cleanup path.
    """
    signal = _signal_for_table(table)
    df = spark.read.parquet(uri)
    # strip partition-value columns if the source was inside a Hive layout
    drop = [c for c in ("year", "month", "day", "hour") if c in df.columns]
    if drop:
        df = df.drop(*drop)
    rows = df.count()
    write_raw_parquet(df, signal, config)
    deleted = False
    if delete_original:
        os.remove(uri)
        deleted = True
    log.info("repartitioned %s (%d rows) into %s", uri, rows, table)
    return RepartitionResult(uri=uri, table=table, rows=rows, deleted=deleted)


def _signal_for_table(table: str) -> str:
    """Inverse of schemas.table_name for default naming; falls back to the
    partition-column heuristic (repartitioner.go:135-147)."""
    for signal in S.ALL_SIGNALS:
        if table.endswith(S._DEFAULT_SUFFIXES[signal]):
            return signal
    return S.SIGNAL_TRACES if "traces" in table else S.SIGNAL_LOGS
