"""Stream self-telemetry (streaming/telemetry.py): a real availableNow
run must emit started + per-batch progress lines with row counts and
trigger durations, and detach cleanly."""

from __future__ import annotations

import time

from opentelemetry_iceberg_exporter_spark.queries.streaming import (
    run_to_memory,
    stream_events,
)
from opentelemetry_iceberg_exporter_spark.streaming.telemetry import (
    attach_progress_logger,
    read_progress_log,
)


def test_progress_log_captures_batches(spark, sf_dir, tmp_path):
    path = str(tmp_path / "progress.jsonl")
    logger = attach_progress_logger(spark, path)
    try:
        ev = stream_events(spark, sf_dir)
        run_to_memory(ev.groupBy("event_type").count(), "telemetry", "complete")
        # listener callbacks are async on the driver; give them a moment
        deadline = time.time() + 30
        while time.time() < deadline:
            events = read_progress_log(path)
            if any(
                e["event"] == "progress" and e["num_input_rows"] > 0 for e in events
            ):
                break
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(logger)

    events = read_progress_log(path)
    kinds = {e["event"] for e in events}
    assert "started" in kinds
    progress = [e for e in events if e["event"] == "progress"]
    assert progress, f"no progress events, got {kinds}"
    from opentelemetry_iceberg_exporter_spark.sources.tables import load_table

    n_events = load_table(spark, sf_dir, "events").count()
    total_rows = sum(e["num_input_rows"] for e in progress)
    assert total_rows == n_events  # the whole events table arrived
    assert all("triggerExecution" in e["duration_ms"] for e in progress)
