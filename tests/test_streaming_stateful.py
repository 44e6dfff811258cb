"""Stateful streaming tests: watermarked tumbling windows and
dropDuplicatesWithinWatermark over a file-source stream."""

from __future__ import annotations

import json
import os
from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from opentelemetry_iceberg_exporter_spark.streaming.stateful import (
    dedup_stream,
    windowed_counts,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("kind", StringType(), True),
    ]
)

T0 = "2024-01-15T10:00:00"


def _write_events(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for eid, ts, kind in rows:
            f.write(json.dumps({"event_id": eid, "ts": ts, "kind": kind}) + "\n")


def _stream(spark, src_dir):
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .json(src_dir)
    )


def _run_foreach(df, ckpt, output_mode, sink_rows):
    q = (
        df.writeStream.foreachBatch(
            lambda batch, _id: sink_rows.extend(batch.collect())
        )
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def _run_to_memory(df, name, ckpt, output_mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


class TestWindowedCounts:
    def test_append_emits_on_watermark_advance(self, spark, tmp_path):
        """Append mode emits a window only after the watermark passes its
        end — the late row (10:20, within the 10-min delay) is still
        counted before the 10:00 window closes."""
        src = str(tmp_path / "in")
        ckpt = str(tmp_path / "ck1")
        _write_events(
            os.path.join(src, "b1.jsonl"),
            [
                (1, "2024-01-15T10:05:00", "click"),
                (2, "2024-01-15T10:55:00", "click"),
                (3, "2024-01-15T11:10:00", "click"),
                # late (behind 11:10) but within the 10-min watermark
                (4, "2024-01-15T10:20:00", "click"),
            ],
        )
        emitted: list = []
        wc = windowed_counts(_stream(spark, src), "ts", "1 hour", "10 minutes")
        _run_foreach(wc, ckpt, "append", emitted)
        # availableNow's finalization batch advances the watermark to
        # 11:00 and emits the closed 10:00 window — late row included
        rows1 = {r["window_start"]: r["n_rows"] for r in emitted}
        assert rows1 == {datetime(2024, 1, 15, 10, 0): 3}

        # restart from checkpoint: 12:30 pushes the watermark past 12:00,
        # closing the 11:00 window; state survived the restart
        _write_events(
            os.path.join(src, "b2.jsonl"), [(5, "2024-01-15T12:30:00", "click")]
        )
        emitted2: list = []
        wc2 = windowed_counts(_stream(spark, src), "ts", "1 hour", "10 minutes")
        _run_foreach(wc2, ckpt, "append", emitted2)
        rows2 = {r["window_start"]: r["n_rows"] for r in emitted2}
        assert rows2 == {datetime(2024, 1, 15, 11, 0): 1}

    def test_grouped_windows_complete(self, spark, tmp_path):
        src = str(tmp_path / "in")
        _write_events(
            os.path.join(src, "b1.jsonl"),
            [
                (1, "2024-01-15T10:05:00", "click"),
                (2, "2024-01-15T10:06:00", "error"),
                (3, "2024-01-15T10:07:00", "click"),
            ],
        )
        wc = windowed_counts(
            _stream(spark, src), "ts", "1 hour", "1 hour", group_cols=["kind"]
        )
        _run_to_memory(wc, "wc_t2", str(tmp_path / "ck2"), "complete")
        rows = {
            r["kind"]: r["n_rows"] for r in spark.sql("select * from wc_t2").collect()
        }
        assert rows == {"click": 2, "error": 1}


class TestDedupStream:
    def test_drop_duplicates_within_watermark(self, spark, tmp_path):
        src = str(tmp_path / "in")
        _write_events(
            os.path.join(src, "b1.jsonl"),
            [
                (1, "2024-01-15T10:00:00", "click"),
                (1, "2024-01-15T10:10:00", "click"),  # dup within horizon
                (2, "2024-01-15T10:20:00", "click"),
            ],
        )
        dd = dedup_stream(_stream(spark, src), ["event_id"], "ts", "1 hour")
        _run_to_memory(dd, "dd_t1", str(tmp_path / "ck3"), "append")
        got = sorted(
            (r["event_id"], r["ts"]) for r in spark.sql("select * from dd_t1").collect()
        )
        # first occurrence survives; the 10:10 duplicate is suppressed
        assert got == [
            (1, datetime(2024, 1, 15, 10, 0)),
            (2, datetime(2024, 1, 15, 10, 20)),
        ]


class TestSessionWindows:
    def test_session_window_counts(self, spark, tmp_path):
        from opentelemetry_iceberg_exporter_spark.streaming.stateful import (
            session_window_counts,
        )

        src = str(tmp_path / "in")
        _write_events(
            os.path.join(src, "b1.jsonl"),
            [
                # session 1: two events 10 min apart
                (1, "2024-01-15T10:00:00", "u1"),
                (2, "2024-01-15T10:10:00", "u1"),
                # > 30 min gap -> session 2
                (3, "2024-01-15T11:00:00", "u1"),
                # other key
                (4, "2024-01-15T10:05:00", "u2"),
            ],
        )
        sw = session_window_counts(
            _stream(spark, src), "ts", "kind", gap="30 minutes", watermark="10 minutes"
        )
        _run_to_memory(sw, "sw_t1", str(tmp_path / "cks"), "complete")
        rows = sorted(
            (r["kind"], r["session_start"], r["n_events"])
            for r in spark.sql("select * from sw_t1").collect()
        )
        assert rows == [
            ("u1", datetime(2024, 1, 15, 10, 0), 2),
            ("u1", datetime(2024, 1, 15, 11, 0), 1),
            ("u2", datetime(2024, 1, 15, 10, 5), 1),
        ]


class TestRunningCounts:
    def test_state_survives_restart(self, spark, tmp_path):
        """applyInPandasWithState: per-key totals accumulate across
        micro-batches AND across checkpointed restarts."""
        from opentelemetry_iceberg_exporter_spark.streaming.stateful import (
            running_event_counts,
        )

        src = str(tmp_path / "in")
        ckpt = str(tmp_path / "ckr")
        _write_events(
            os.path.join(src, "b1.jsonl"),
            [(1, "2024-01-15T10:00:00", "x"), (1, "2024-01-15T10:01:00", "x"),
             (2, "2024-01-15T10:02:00", "x")],
        )
        emitted: list = []
        rc = running_event_counts(_stream(spark, src), "event_id")
        _run_foreach(rc, ckpt, "update", emitted)
        counts1 = {r["event_id"]: r["n_events"] for r in emitted}
        assert counts1 == {1: 2, 2: 1}

        _write_events(
            os.path.join(src, "b2.jsonl"), [(1, "2024-01-15T10:30:00", "x")]
        )
        emitted2: list = []
        rc2 = running_event_counts(_stream(spark, src), "event_id")
        _run_foreach(rc2, ckpt, "update", emitted2)
        counts2 = {r["event_id"]: r["n_events"] for r in emitted2}
        assert counts2 == {1: 3}  # continued from restored state
