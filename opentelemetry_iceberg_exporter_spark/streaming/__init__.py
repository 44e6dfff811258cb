from .stateful import dedup_stream, windowed_counts
from .iceberg_tail import ChangelogTailer, IcebergTailer, TailBatch
from .pipeline import (
    export_batch,
    flatten_signal,
    flatten_signal_cached,
    kafka_available,
    make_batch_processor,
    open_source_stream,
    start_export_stream,
)

__all__ = [
    "export_batch",
    "flatten_signal",
    "flatten_signal_cached",
    "kafka_available",
    "make_batch_processor",
    "open_source_stream",
    "start_export_stream",
    "dedup_stream",
    "windowed_counts",
    "ChangelogTailer",
    "IcebergTailer",
    "TailBatch",
]
