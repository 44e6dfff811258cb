from .stateful import dedup_stream, windowed_counts
from .pipeline import (
    export_batch,
    flatten_signal,
    flatten_signal_cached,
    make_batch_processor,
    start_export_stream,
)

__all__ = [
    "export_batch",
    "flatten_signal",
    "flatten_signal_cached",
    "make_batch_processor",
    "start_export_stream",
    "dedup_stream",
    "windowed_counts",
]
