"""Recovery against a REST Iceberg catalog — the reference's production
reconciliation path (reconciler.go:81-347 over catalog_rest.go:306-367
AddFiles + :370-467 ListDataFiles), executed here through the pure-Python
REST client.

Same shape as fs_adapter.py: the registered set comes from the catalog's
own manifests across ALL snapshots (time-travel-aware), orphans are
re-registered via add_files commits — one snapshot per adaptive batch
(X1). Driver-side work is O(file count); listing and the anti-join are
Spark jobs.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..sinks.iceberg_rest import RestCatalogClient, RestTable
from .reconciler import RecoveryResult, recover, registered_files
from .scanner import parse_partitions, scan_files


def rest_registered_files(
    client: RestCatalogClient, namespace: str, tables: list[str]
) -> dict[str, list[str]]:
    """Per-table registered-file sets via ListDataFiles (all snapshots,
    deduped; missing tables list empty — catalog_rest.go:383-390)."""
    return {t: RestTable(client, namespace, t).all_files() for t in tables}


def rest_register_fn(
    client: RestCatalogClient, namespace: str, spark: SparkSession | None = None
):
    """RegisterFn committing one add_files snapshot per batch over REST.
    With `spark`, each registration first threads the table's vended
    storage credentials into the session (apply_storage_credentials —
    refresh-on-expiry included): against a policy-enforcing catalog the
    orphan files live under vended-only prefixes, so the scan that
    validates the registered files must run under the vend, not ambient
    identity — the same rule the read/append paths already follow."""

    def register(table: str, uris: list[str]) -> None:
        t = RestTable(client, namespace, table)
        t.metadata()  # captures the latest vend from LoadTableResult
        if spark is not None:
            t.apply_storage_credentials(spark)
        t.add_data_files(uris, {"otel.recovery": "true"})

    return register


def recover_rest_warehouse(
    spark: SparkSession,
    client: RestCatalogClient,
    namespace: str,
    tables: list[str],
    warehouse: str,
    *,
    dry_run: bool = False,
    max_batch_size: int | None = None,
) -> RecoveryResult:
    """One-call reconciliation of a namespace through the REST catalog:
    scan the warehouse tree, diff against every table's ListDataFiles,
    re-register orphans via batched add_files commits."""
    root = f"{warehouse.rstrip('/')}/{namespace}"
    scanned = parse_partitions(scan_files(spark, root), root)
    scanned = scanned.filter(scanned.table.isin(tables))
    registered = registered_files(spark, rest_registered_files(client, namespace, tables))
    kwargs = {"dry_run": dry_run}
    if max_batch_size is not None:
        kwargs["max_batch_size"] = max_batch_size
    return recover(
        scanned, registered, rest_register_fn(client, namespace, spark), **kwargs
    )
