"""Recovery against the executed filesystem Iceberg catalog.

The reference's recovery tool diffs storage against the REAL catalog and
re-registers orphans via add_files (reconciler.go:81-347,
catalog_rest.go:306-367). With no Iceberg jars in this container, r1
could only exercise that loop against injected path lists (the
mock-catalog seam). The pure-Python catalog (sinks/iceberg_fs.py) makes
the full flow executable:

  crashed append  -> data files exist, no snapshot references them
  scan_files      -> storage listing (S5)
  all_files       -> registered set from EVERY snapshot's manifests (S6)
  recover         -> anti-join orphans, batched add_data_files (T1, X1)

Everything driver-side here is O(metadata); the listing and anti-join
are Spark jobs, so the reconciliation itself scales with file COUNT,
not data volume — same shape as the reference.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..sinks.iceberg_fs import FsCatalog
from .reconciler import RecoveryResult, recover, registered_files
from .scanner import parse_partitions, scan_files


def fs_registered_files(catalog: FsCatalog, namespace: str, tables: list[str]) -> dict[str, list[str]]:
    """Per-table registered-file sets from the catalog's own manifests
    (all snapshots — time-travel aware, catalog_rest.go:370-467)."""
    return {t: catalog.load_table(namespace, t).all_files() for t in tables}


def fs_register_fn(catalog: FsCatalog, namespace: str):
    """RegisterFn that commits one add_files snapshot per batch."""

    def register(table: str, uris: list[str]) -> None:
        catalog.load_table(namespace, table).add_data_files(
            uris, {"otel.recovery": "true"}
        )

    return register


def recover_fs_warehouse(
    spark: SparkSession,
    catalog: FsCatalog,
    namespace: str,
    tables: list[str],
    *,
    dry_run: bool = False,
    max_batch_size: int | None = None,
) -> RecoveryResult:
    """One-call reconciliation of a namespace: scan the warehouse
    directory tree, diff against every table's manifests, register
    orphans. Layout {warehouse}/{ns}/{table}/data/... matches the
    scanner's {root}/{table}/data expectation with root={warehouse}/{ns}."""
    root = f"{catalog.warehouse}/{namespace}"
    scanned = parse_partitions(scan_files(spark, root), root)
    # only reconcile the requested tables (scanner sees every directory)
    scanned = scanned.filter(scanned.table.isin(tables))
    registered = registered_files(spark, fs_registered_files(catalog, namespace, tables))
    kwargs = {"dry_run": dry_run}
    if max_batch_size is not None:
        kwargs["max_batch_size"] = max_batch_size
    return recover(scanned, registered, fs_register_fn(catalog, namespace), **kwargs)
