"""Recovery CLI — the reference's `cmd/recovery` main as a Spark job.

Flags mirror cmd/recovery/main.go:122-143: --root (storage prefix),
--table (restrict to one table), --after/--before accepting RFC3339 or
date-only strings (main.go:356-372), --dry-run (X5), --max-batch-size.

Catalog modes: `--warehouse` reconciles against the filesystem Iceberg
catalog, `--rest-uri` against a REST catalog server (the reference's
production path) — in both, the registered set comes from each table's
all-snapshots file listing (time-travel-aware dedup,
catalog_rest.go:370-467) and registration is the `add_files` procedure.
With neither, --registered-manifest points at a text file of registered
URIs — the mock-catalog seam the reference's own tests use
(mock_catalog.go) — and registration degrades to dry-run/report.
"""

from __future__ import annotations

import argparse
import json
from datetime import datetime, timezone

from pyspark.sql import SparkSession

from .reconciler import recover, registered_files
from .scanner import apply_time_filter, scan_files


def parse_time_flag(value: str) -> datetime:
    """RFC3339 or date-only (main.go:356-372)."""
    for fmt in ("%Y-%m-%dT%H:%M:%S%z", "%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%d"):
        try:
            dt = datetime.strptime(value, fmt)
            return dt if dt.tzinfo is None else dt.astimezone(timezone.utc).replace(tzinfo=None)
        except ValueError:
            continue
    raise ValueError(f"unparseable time {value!r}; want RFC3339 or YYYY-MM-DD")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="otel-spark-recover")
    p.add_argument("--root", required=True, help="storage root to scan")
    p.add_argument("--table", default=None, help="restrict to one table")
    p.add_argument("--after", type=parse_time_flag, default=None)
    p.add_argument("--before", type=parse_time_flag, default=None)
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--max-batch-size", type=int, default=1000)
    p.add_argument(
        "--registered-manifest",
        default=None,
        help="text file of registered URIs (no-catalog mode)",
    )
    p.add_argument(
        "--warehouse",
        default=None,
        help="fs-catalog mode: warehouse root; --root should be "
        "{warehouse}/{namespace} and orphans are re-registered via "
        "metadata-only add_files commits",
    )
    p.add_argument("--namespace", default="otel", help="catalog namespace")
    p.add_argument(
        "--rest-uri",
        default=None,
        help="REST-catalog mode: catalog endpoint; registered sets come "
        "from ListDataFiles and orphans re-register via REST add_files "
        "commits (requires --rest-warehouse for the storage root)",
    )
    p.add_argument("--rest-warehouse", default=None, help="REST-catalog storage root")
    p.add_argument("--token", default=None, help="REST-catalog bearer token")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    spark = SparkSession.builder.getOrCreate()

    scanned = scan_files(spark, args.root)
    if args.table:
        scanned = scanned.filter(scanned["table"] == args.table)
    scanned = apply_time_filter(scanned, args.after, args.before)

    if args.warehouse:
        # fs-catalog mode: registered set and registration both run
        # against the real table manifests
        from ..sinks.iceberg_fs import FsCatalog
        from .fs_adapter import fs_register_fn, fs_registered_files
        from .reconciler import distinct_tables

        catalog = FsCatalog(args.warehouse)
        tables = [args.table] if args.table else distinct_tables(scanned)
        tables = [t for t in tables if catalog.table_exists(args.namespace, t)]
        registered = registered_files(
            spark, fs_registered_files(catalog, args.namespace, tables)
        )
        scanned = scanned.filter(scanned.table.isin(tables))
        register_fn = fs_register_fn(catalog, args.namespace)
        res = recover(
            scanned,
            registered,
            register_fn,
            max_batch_size=args.max_batch_size,
            dry_run=args.dry_run,
        )
        print(json.dumps(res.__dict__, default=str))
        return 0 if res.failed == 0 else 1

    if args.rest_uri:
        # REST-catalog mode (the reference's production path): listing
        # and registration through the catalog server
        from ..sinks.iceberg_rest import RestCatalogClient
        from .reconciler import distinct_tables
        from .rest_adapter import rest_register_fn, rest_registered_files

        client = RestCatalogClient(
            args.rest_uri,
            warehouse=args.rest_warehouse or "",
            token=args.token or "",
        )
        tables = [args.table] if args.table else distinct_tables(scanned)
        tables = [t for t in tables if client.table_exists(args.namespace, t)]
        registered = registered_files(
            spark, rest_registered_files(client, args.namespace, tables)
        )
        scanned = scanned.filter(scanned.table.isin(tables))
        res = recover(
            scanned,
            registered,
            rest_register_fn(client, args.namespace),
            max_batch_size=args.max_batch_size,
            dry_run=args.dry_run,
        )
        print(json.dumps(res.__dict__, default=str))
        return 0 if res.failed == 0 else 1

    manifest: list[str] = []
    if args.registered_manifest:
        with open(args.registered_manifest) as f:
            manifest = [line.strip() for line in f if line.strip()]
    registered = registered_files(spark, {"_manifest": manifest})

    def register_fn(table: str, uris: list[str]) -> None:
        raise NotImplementedError(
            "no catalog attached, so orphans cannot be registered from a "
            "manifest file alone — pass `--warehouse <root>` (filesystem "
            "Iceberg catalog) or `--rest-uri <url>` (REST catalog) to "
            "reconcile end to end via add_files commits, or --dry-run to "
            "report only"
        )

    res = recover(
        scanned,
        registered,
        register_fn,
        max_batch_size=args.max_batch_size,
        dry_run=args.dry_run or not args.registered_manifest,
    )
    print(json.dumps(res.__dict__, default=str))
    return 0 if res.failed == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
