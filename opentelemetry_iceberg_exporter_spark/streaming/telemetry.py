"""Engine self-telemetry: stream-progress metrics as JSON lines.

The reference runs inside the OpenTelemetry Collector, whose
exporterhelper publishes send rate / queue depth / failure counters for
the exporter itself (factory.go wires it into the collector's
self-telemetry). The Spark-native analog is the StreamingQueryListener:
every micro-batch emits a progress event carrying input rows,
processing rate, batch duration, and stateful-operator sizes — exactly
the signals an operator dashboards to spot backpressure (rising
trigger duration), watermark stalls, and state-store growth.

Driver-side only and O(1) per micro-batch — nothing here touches the
data path.
"""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ProgressLogger(StreamingQueryListener):
    """Append one JSON line per micro-batch to `path`.

    Fields: query id/name, batch id, input rows, rows/sec, the trigger
    breakdown (durationMs), per-stateful-operator row counts, and the
    sink description — the minimal set for rate/backpressure/state
    dashboards.
    """

    def __init__(self, path: str):
        self.path = path
        self._lock = threading.Lock()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    # -- listener callbacks (driver thread) -------------------------------
    def onQueryStarted(self, event) -> None:
        self._write({"event": "started", "id": str(event.id), "name": event.name})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._write(
            {
                "event": "progress",
                "id": str(p.id),
                "name": p.name,
                "batch_id": p.batchId,
                "timestamp": p.timestamp,
                "num_input_rows": p.numInputRows,
                "input_rows_per_second": p.inputRowsPerSecond,
                "processed_rows_per_second": p.processedRowsPerSecond,
                "duration_ms": dict(p.durationMs or {}),
                "state_operators": [
                    {
                        "operator": s.operatorName,
                        "rows_total": s.numRowsTotal,
                        "rows_updated": s.numRowsUpdated,
                        "memory_bytes": s.memoryUsedBytes,
                    }
                    for s in (p.stateOperators or [])
                ],
                "sink": p.sink.description if p.sink else None,
            }
        )

    def onQueryTerminated(self, event) -> None:
        self._write(
            {
                "event": "terminated",
                "id": str(event.id),
                "exception": event.exception,
            }
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing-dependent
        pass

    def _write(self, record: dict) -> None:
        line = json.dumps(record, default=str)
        with self._lock:
            with open(self.path, "a") as f:
                f.write(line + "\n")


def attach_progress_logger(spark: SparkSession, path: str) -> ProgressLogger:
    """Register a ProgressLogger on the session; returns it for later
    `spark.streams.removeListener(logger)`."""
    logger = ProgressLogger(path)
    spark.streams.addListener(logger)
    return logger


def read_progress_log(path: str) -> list[dict]:
    """Parse a progress log back into dicts (ops tooling/test helper)."""
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
