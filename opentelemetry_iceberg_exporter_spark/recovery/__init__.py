from .scanner import (
    FileInfo,
    apply_time_filter,
    list_local_files,
    listing_to_df,
    parse_partitions,
    scan_files,
)
from .repartitioner import RepartitionResult, repartition_file
from .reconciler import (
    MAX_BATCH_SIZE,
    RecoveryResult,
    catalog_only_count,
    distinct_tables,
    find_orphans,
    recover,
    registered_files,
)

__all__ = [
    "FileInfo",
    "apply_time_filter",
    "list_local_files",
    "listing_to_df",
    "parse_partitions",
    "scan_files",
    "MAX_BATCH_SIZE",
    "RecoveryResult",
    "catalog_only_count",
    "distinct_tables",
    "find_orphans",
    "recover",
    "registered_files",
    "RepartitionResult",
    "repartition_file",
]
