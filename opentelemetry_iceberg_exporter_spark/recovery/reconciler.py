"""Recovery reconciler: storage vs catalog set reconciliation.

Reference parity (internal/recovery/reconciler.go):
* T1 anti-join: orphans = scanned \\ registered (reconciler.go:109-126)
  -> `left_anti` join (a real distributed anti-join, not a driver set)
* T2/T3 registered-set union across tables + dedup across snapshots
  (reconciler.go:189-219, catalog_rest.go:417-457)
  -> union of per-table `all_files` reads + distinct()
* T4 group-by table (reconciler.go:263-269), T5 distinct tables
  (reconciler.go:173-186)
* T6 catalog-only count (reconciler.go:119-121) -> reversed anti-join
* X1 adaptive batch registration: <=1000 files/commit, divide batch size
  by 10 on failure (1000 -> 100 -> 10 -> 1), individual handling at 1
  (reconciler.go:14-21, 223-347) — driver-side control flow around
  atomic add_files commits, exactly as the reference drives its catalog
* X5 dry-run: report-only (reconciler.go:230-235)
* X4/R6 cross-partition repartition: on the Iceberg 'more than one value
  for partition field' error, re-reading the misplaced file as a
  DataFrame and appending through the partitioned writer re-partitions
  it correctly by definition (repartitioner.go:77-196 dissolves into
  read -> append -> delete original).

Only file PATHS ever reach the driver (metadata scale); the set algebra
runs distributed.
"""

from __future__ import annotations

import logging
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.errors import is_cross_partition_error

log = logging.getLogger(__name__)

MAX_BATCH_SIZE = 1000  # reconciler.go:14-21
BATCH_DIVISOR = 10

# register_fn(table, [uri, ...]) -> None; raises on failure
RegisterFn = Callable[[str, list[str]], None]
# repartition_fn(table, uri) -> None; fixes a cross-partition file (R6)
RepartitionFn = Callable[[str, str], None]


def registered_files(
    spark: SparkSession, per_table: dict[str, DataFrame | list[str]]
) -> DataFrame:
    """T2+T3: union the registered-file sets of all tables, distinct by
    path. Accepts per-table DataFrames (e.g. `SELECT file_path FROM
    cat.ns.tbl.all_files`) or plain path lists (tests / mock catalog)."""
    parts: list[DataFrame] = []
    for table, files in per_table.items():
        if isinstance(files, DataFrame):
            df = files.select(F.col(files.columns[0]).alias("uri"))
        else:
            df = spark.createDataFrame([(u,) for u in files], "uri string")
        parts.append(df.withColumn("table", F.lit(table)))
    if not parts:
        return spark.createDataFrame([], "uri string, table string")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()  # T3: dedup across snapshots/manifests


def find_orphans(scanned: DataFrame, registered: DataFrame) -> DataFrame:
    """T1: files in storage but not in the catalog."""
    return scanned.join(registered.select("uri"), "uri", "left_anti")


def catalog_only_count(scanned: DataFrame, registered: DataFrame) -> int:
    """T6: files the catalog references that are gone from storage."""
    return registered.select("uri").join(scanned.select("uri"), "uri", "left_anti").count()


def distinct_tables(scanned: DataFrame) -> list[str]:
    """T5."""
    return [r["table"] for r in scanned.select("table").distinct().collect()]


@dataclass
class RecoveryResult:
    scanned: int = 0
    registered: int = 0
    orphaned: int = 0
    recovered: int = 0
    failed: int = 0
    repartitioned: int = 0
    catalog_only: int = 0
    dry_run: bool = False
    failures: list[tuple[str, str]] = field(default_factory=list)  # (uri, error)


def recover(
    scanned: DataFrame,
    registered: DataFrame,
    register_fn: RegisterFn,
    *,
    repartition_fn: RepartitionFn | None = None,
    max_batch_size: int = MAX_BATCH_SIZE,
    dry_run: bool = False,
) -> RecoveryResult:
    """The full reconciliation loop (reconciler.go:81-347)."""
    res = RecoveryResult(dry_run=dry_run)
    res.scanned = scanned.count()
    res.registered = registered.count()
    res.catalog_only = catalog_only_count(scanned, registered)

    orphans = find_orphans(scanned, registered)
    if dry_run:  # X5: report-only, no paths needed on the driver
        res.orphaned = orphans.count()
        return res

    # T4 group-by table. Paths stream to the driver in (table, uri) order
    # via toLocalIterator — the driver holds at most one max_batch_size
    # buffer, never the whole orphan set (after a mass outage at scale,
    # millions of orphans must not be materialized driver-side at once).
    buffer: list[str] = []
    current_table: str | None = None

    def flush() -> None:
        if buffer:
            _register_adaptive(
                current_table, list(buffer), register_fn, repartition_fn, res, max_batch_size
            )
            buffer.clear()

    for row in orphans.select("table", "uri").sort("table", "uri").toLocalIterator():
        if row["table"] != current_table:
            flush()
            current_table = row["table"]
        buffer.append(row["uri"])
        res.orphaned += 1
        if len(buffer) >= max_batch_size:
            flush()
    flush()
    return res


def _register_adaptive(
    table: str,
    uris: list[str],
    register_fn: RegisterFn,
    repartition_fn: RepartitionFn | None,
    res: RecoveryResult,
    batch_size: int,
) -> None:
    """X1: try the batch whole; on failure divide by 10 and recurse; at
    size 1 classify the error (cross-partition -> repartition, else
    record failure)."""
    if not uris:
        return
    try:
        register_fn(table, uris)
        res.recovered += len(uris)
        return
    except Exception as exc:  # noqa: BLE001 — adaptive fallback below
        if len(uris) == 1:
            if repartition_fn is not None and is_cross_partition_error(exc):  # X4
                try:
                    repartition_fn(table, uris[0])
                    res.repartitioned += 1
                    return
                except Exception as rexc:  # noqa: BLE001
                    res.failed += 1
                    res.failures.append((uris[0], str(rexc)))
                    return
            res.failed += 1
            res.failures.append((uris[0], str(exc)))
            return
        smaller = max(1, batch_size // BATCH_DIVISOR)
        log.warning(
            "batch of %d failed for %s (%s); retrying at size %d",
            len(uris),
            table,
            exc,
            smaller,
        )
        for i in range(0, len(uris), smaller):
            _register_adaptive(
                table, uris[i : i + smaller], register_fn, repartition_fn, res, smaller
            )
