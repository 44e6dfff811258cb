"""transformWithStateInPandas operators (streaming/tws.py): running
composite state and bounded ListState rings over the RocksDB state
store, surviving micro-batch and checkpointed-restart boundaries."""

from __future__ import annotations

import json
import os

import pytest

from opentelemetry_iceberg_exporter_spark.streaming.tws import (
    ROCKSDB_PROVIDER,
    recent_values,
    running_value_stats,
    tws_available,
)

SCHEMA = "service string, value double"

# query RUN requires the google.protobuf python package (see tws.py's
# environment gate); plan construction is tested unconditionally below
needs_protobuf = pytest.mark.skipif(
    not tws_available(),
    reason="google.protobuf not installed (transformWithState runtime dep)",
)


def test_gate_reflects_protobuf_presence():
    try:
        from google.protobuf import descriptor  # noqa: F401

        have = True
    except ImportError:
        have = False
    assert tws_available() is have


def test_plan_construction_without_protobuf(spark, tmp_path):
    """Building the transformWithState plan needs no protobuf — only
    running it does; the analyzed schema is the declared output."""
    src = str(tmp_path / "in")
    os.makedirs(src)
    df = running_value_stats(_stream(spark, src), "service", "value")
    assert [f.name for f in df.schema.fields] == [
        "service", "n", "total", "min_value", "max_value",
    ]
    assert df.isStreaming


@pytest.fixture()
def rocksdb(spark):
    """transformWithState requires the RocksDB state store provider;
    scope the provider override to each test."""
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    yield spark
    if old is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, old)


def _write(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for svc, v in rows:
            f.write(json.dumps({"service": svc, "value": v}) + "\n")


def _stream(spark, src):
    return spark.readStream.schema(SCHEMA).json(src)


def _run(df, ckpt, sink):
    q = (
        df.writeStream.foreachBatch(lambda b, _id: sink.extend(b.collect()))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


@needs_protobuf
class TestRunningValueStats:
    def test_composite_state_accumulates_across_restart(self, rocksdb, tmp_path):
        spark = rocksdb
        src, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
        _write(os.path.join(src, "b1.jsonl"),
               [("api", 10.0), ("api", 4.0), ("db", 7.0)])
        out: list = []
        _run(running_value_stats(_stream(spark, src), "service", "value"), ckpt, out)
        got = {r["service"]: r for r in out}
        assert got["api"]["n"] == 2 and got["api"]["total"] == 14.0
        assert got["api"]["min_value"] == 4.0 and got["api"]["max_value"] == 10.0
        assert got["db"]["n"] == 1

        # restart from checkpoint: state restores, only touched keys emit
        _write(os.path.join(src, "b2.jsonl"), [("api", 100.0)])
        out2: list = []
        _run(running_value_stats(_stream(spark, src), "service", "value"), ckpt, out2)
        assert len(out2) == 1
        r = out2[0]
        assert (r["service"], r["n"], r["total"], r["max_value"]) == (
            "api", 3, 114.0, 100.0,
        )

    def test_null_values_skipped(self, rocksdb, tmp_path):
        spark = rocksdb
        src, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
        os.makedirs(src)
        with open(os.path.join(src, "b1.jsonl"), "w") as f:
            f.write(json.dumps({"service": "api", "value": None}) + "\n")
            f.write(json.dumps({"service": "api", "value": 5.0}) + "\n")
        out: list = []
        _run(running_value_stats(_stream(spark, src), "service", "value"), ckpt, out)
        assert out[0]["n"] == 1 and out[0]["total"] == 5.0


@needs_protobuf
class TestRecentValues:
    def test_ring_keeps_last_n_across_batches(self, rocksdb, tmp_path):
        spark = rocksdb
        src, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
        _write(os.path.join(src, "b1.jsonl"),
               [("api", 1.0), ("api", 2.0), ("api", 3.0), ("api", 4.0)])
        out: list = []
        _run(recent_values(_stream(spark, src), "service", "value", keep=3),
             ckpt, out)
        assert out[0]["recent"] == [2.0, 3.0, 4.0]

        _write(os.path.join(src, "b2.jsonl"), [("api", 9.0)])
        out2: list = []
        _run(recent_values(_stream(spark, src), "service", "value", keep=3),
             ckpt, out2)
        assert out2[0]["recent"] == [3.0, 4.0, 9.0]  # ListState restored
